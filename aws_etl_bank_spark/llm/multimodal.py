"""Multimodal column support: image/audio/video payloads as opaque
``binary`` columns with typed metadata structs.

The Spark-side plumbing — schema convention, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested; the actual
media decoding is STUBBED because the image/audio libraries are not in
this container: ``decode_image_features(..., fake=False)`` raises
``NotImplementedError``, and ``fake=True`` produces deterministic features
derived from the payload bytes so the pipeline shape can be exercised
end-to-end.

Schema convention::

    payload  binary                      -- the raw media bytes
    media    struct<format string, n_bytes long>   -- typed metadata
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_binary_payload(df: DataFrame, source_col: str = "text",
                          format: str = "utf8") -> DataFrame:
    """Carry a column as an opaque binary payload + metadata struct (the
    ingest shape for media files; here the testdata's text plays the
    payload role)."""
    payload = F.encode(F.col(source_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media",
        F.struct(F.lit(format).alias("format"), F.octet_length(payload).cast("long").alias("n_bytes")),
    )


_FEATURE_SCHEMA = "doc_id long, n_bytes long, width int, height int, mean_byte double"


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id", fake: bool = False) -> DataFrame:
    """Decode image payloads to (width, height, mean_byte) features via
    Arrow-batched ``mapInPandas``.

    STUB: real decoding needs an image library not present in this
    container.  ``fake=True`` derives deterministic pseudo-features from
    the bytes (so schema/batching/partitioning are tested for real);
    ``fake=False`` raises NotImplementedError, marking the integration
    point."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this "
            "container; call with fake=True for the deterministic stub"
        )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "width": (n_bytes % 256).astype("int32"),
                    "height": ((n_bytes * 7) % 256).astype("int32"),
                    "mean_byte": payloads.map(
                        lambda b: round(sum(b[:64]) / max(min(len(b), 64), 1), 4)
                    ),
                }
            )
            yield out

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: split the payload
    into ``n_frames`` even byte ranges and explode to one row per frame
    (frame_index, frame_bytes).  Pure built-in expressions; a real decoder
    would replace the byte-slice with a keyframe extractor."""
    total = F.octet_length(F.col(payload_col))
    step = F.greatest((total / n_frames).cast("int"), F.lit(1))
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.struct(
            i.cast("int").alias("frame_index"),
            F.substring(F.col(payload_col), i * step + 1, step).alias("frame_bytes"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(frames).alias("frame")
    ).select(id_col, F.col("frame.frame_index"), F.octet_length("frame.frame_bytes").cast("long").alias("frame_n_bytes"))
