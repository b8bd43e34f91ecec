"""Batched model-inference plumbing: text → embedding vectors.

The 100 TB shape for running a model over a corpus: ``mapInPandas``
(Arrow-batched — the only sane way to cross the JVM/Python boundary at
scale), with the partition count matched to the accelerator count and
the Arrow batch size to the model's optimal batch.  The model libraries
are not in this container, so the default encoder is a DETERMINISTIC
hash-based stand-in (unit-norm, reproducible across runs/partitions);
the plumbing — schema, batching, normalization, partition placement —
is real and oracle-/test-checked, and a real encoder drops in as
``encoder=lambda texts: model.encode(texts)``.

Mirrors the posture of llm/multimodal.py for binary columns (its decode
step is env-gated the same way)."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _hash_encoder(texts, dim: int):
    """Deterministic stand-in encoder: component j of a text's vector is
    a zlib.crc32-derived float; the vector is L2-normalized.  Pure
    function of the text — stable across partitions, retries, runs."""
    import zlib

    import numpy as np

    out = np.empty((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")
        out[i] = [((zlib.crc32(b, j) % 10_000) / 10_000.0) - 0.5
                  for j in range(dim)]
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def embed_texts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                dim: int = 64, n_workers: int | None = None,
                encoder: Callable | None = None,
                vec_col: str = "embedding") -> DataFrame:
    """(id, embedding array<double>) via Arrow-batched ``mapInPandas``.

    ``n_workers`` repartitions the corpus to the accelerator count
    (None = keep the scan's partitioning); each Python worker sees
    whole Arrow batches (sized by spark.sql.execution.arrow.
    maxRecordsPerBatch), so a real ``encoder`` amortizes model dispatch
    over the batch instead of paying per row."""
    enc = encoder or (lambda texts: _hash_encoder(texts, dim))
    src = df.select(id_col, text_col)
    if n_workers is not None:
        src = src.repartition(n_workers)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            vecs = enc(pdf[text_col].tolist())
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                vec_col: [list(map(float, v)) for v in vecs],
            })

    return src.mapInPandas(run, schema=f"{id_col} long, {vec_col} array<double>")
