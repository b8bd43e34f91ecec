"""Arrow-native batch operators (``DataFrame.mapInArrow``).

``mapInPandas`` converts every Arrow batch to pandas and back — for
list/vector columns that round-trip costs a per-row Python object (or
an ndarray box) per value AND applies pandas NaN semantics (a float NaN
becomes SQL NULL at the return boundary, see sources/avro.py's
read-side note).  ``mapInArrow`` hands the raw ``pyarrow.RecordBatch``
to Python: list columns stay contiguous child buffers, so per-vector
math is one zero-copy numpy view + one vectorized kernel per batch —
the right plumbing for embedding-scale columnar work.

Scale shape: map-only (no shuffle), batch-vectorized, output schema
fixed; the only Python cost is one kernel launch per RecordBatch.
"""

from __future__ import annotations

from typing import Iterator


def quantized_norms(df, vec_col: str, id_col: str, scale: int = 1000):
    """(id, vector) -> (id, q_norm2 bigint): squared L2 norm of the
    vector after quantizing each component to int64 with the
    floor(x·scale + 0.5) canon — exact integer arithmetic, so a SQL
    oracle reproduces it bit-for-bit regardless of summation order.

    Handles both FixedSizeList and (possibly ragged) List layouts:
    fixed-size vectors reshape to a matrix and reduce with one einsum;
    ragged lists reduce with prefix-sum differences over the offsets.

    NULL vector rows and NaN components raise ``ValueError``: a null
    list length would flow NaN into the int64 offset cast and corrupt
    every subsequent row's norm in the batch, so the kernel refuses
    them instead of silently producing garbage.
    """
    import numpy as np
    import pyarrow as pa

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0)
            arr = batch.column(1)
            if batch.num_rows == 0:
                yield pa.RecordBatch.from_arrays(
                    [ids, pa.array([], pa.int64())], [id_col, "q_norm2"])
                continue
            if arr.null_count:
                raise ValueError(
                    "quantized_norms: NULL vector row in batch — "
                    "filter or impute before the kernel")
            flat = arr.flatten().to_numpy(zero_copy_only=False) \
                      .astype(np.float64)
            if np.isnan(flat).any():
                raise ValueError(
                    "quantized_norms: NaN vector component in batch — "
                    "filter or impute before the kernel")
            q = np.floor(flat * scale + 0.5).astype(np.int64)
            if pa.types.is_fixed_size_list(arr.type):
                mat = q.reshape(batch.num_rows, arr.type.list_size)
                norms = np.einsum("ij,ij->i", mat, mat)
            else:
                lens = pa.compute.list_value_length(arr) \
                         .to_numpy(zero_copy_only=False).astype(np.int64)
                # prefix-sum difference instead of np.add.reduceat:
                # reduceat cannot express empty spans (IndexError on a
                # start at/after the end); csum[end]-csum[start] gives
                # an exact 0 for them.  int64 throughout — the batch
                # cumsum stays far below 2^63 for quantized components.
                sq = q * q
                csum = np.concatenate(([0], np.cumsum(sq)))
                ends = np.cumsum(lens)
                norms = csum[ends] - csum[ends - lens]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(norms, pa.int64())], [id_col, "q_norm2"])

    return df.select(id_col, vec_col).mapInArrow(
        run, f"{id_col} long, q_norm2 long")
