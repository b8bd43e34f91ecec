"""Streaming ingest dedup: each micro-batch of documents is deduped
against the ALREADY-ACCEPTED corpus via the persisted MinHash band index
(llm/dedup.py minhash_band_index) — the composition a production ingest
runs: new data is hashed O(batch), history is only ever JOINED, never
re-hashed.

Semantics are EXACT dedup accelerated by LSH: MinHash banding only
generates candidates (an exact twin collides in every band, so recall on
exact duplicates is total), and acceptance is decided by a text-equality
verify — so the final kept set provably equals batch-global exact dedup
with first-arrival-wins, which is what the DuckDB oracle checks when the
feed is ordered by id.

Scale shape per batch: one window over the batch (within-batch keep), a
banded equi-join batch⋈index (both sides keyed on (band, band_hash)),
one id-join text verify against the kept table, and append-shaped state
growth — each batch persists ONLY its survivors and their band rows to
a batch-id-keyed dir (O(delta) writes; see stream_dedup_against_index),
where a transactional table format would be a plain append.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from aws_etl_bank_spark.llm.dedup import (minhash_band_index,
                                          minhash_incremental_matches)


def dedup_batch_against_kept(batch: DataFrame, kept: DataFrame | None,
                             index: DataFrame | None, text_col: str,
                             id_col: str, num_perm: int, bands: int,
                             shingle_n: int) -> DataFrame:
    """One ingest step: within-batch exact dedup (lowest id wins), then
    drop rows whose text already exists in the kept corpus — candidates
    from the band index, decided by exact text equality."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    local = (batch.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1).drop("__rn"))
    if kept is None or index is None:
        return local
    cand = minhash_incremental_matches(local, index, text_col, id_col,
                                       num_perm, bands, shingle_n)
    dup_ids = (
        cand.join(local.select(F.col(id_col).alias("batch_id"),
                               F.col(text_col).alias("__bt")), "batch_id")
        .join(kept.select(F.col(id_col).alias("corpus_id"),
                          F.col(text_col).alias("__kt")), "corpus_id")
        .where(F.col("__bt") == F.col("__kt"))
        .select(F.col("batch_id").alias(id_col)).distinct()
    )
    return local.join(dup_ids, id_col, "left_anti")


#: our OWN per-batch commit marker (r16 review): keying commit
#: detection on Spark's ``_SUCCESS`` would break under
#: ``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` (fully
#: written state invisible → every batch sees empty history), and a
#: replay's ``mode("overwrite")`` would rewrite ``index`` while the
#: prior attempt's ``_SUCCESS`` still marked the dir committed.  The
#: marker is written LAST and removed FIRST on replay, so a dir is
#: visible iff both halves of its most recent write attempt finished.
_COMMIT_MARKER = "_COMMITTED"


def _require_local_dir(state_dir: str) -> None:
    """This state layout is driver-local-filesystem only (r16 review):
    the parquet reads/writes go through Spark and would accept any
    Hadoop URI, but discovery/markers use ``os`` — an ``s3a://`` or
    ``hdfs://`` state_dir would SILENTLY disable all cross-batch dedup
    (every batch would see empty history).  Fail loudly instead; a
    cluster deployment should back this state with a transactional
    table format rather than a marker scheme."""
    if "://" in state_dir:
        raise NotImplementedError(
            f"stream_dedup_against_index state_dir {state_dir!r} is not a "
            "local path: state discovery and commit markers are "
            "driver-local os operations; use a local directory, or back "
            "the kept/index state with a transactional table")


def _committed_state_dirs(state_dir: str,
                          below_batch: int | None = None) -> list[str]:
    """Batch-id-keyed state dirs (``b<id>/``) whose write COMPLETED
    (our ``_COMMITTED`` marker — see ``_COMMIT_MARKER``), optionally
    restricted to ids strictly below ``below_batch`` — on a replay of
    batch b after a mid-write crash, b's own partial dir must not be
    part of the state b dedups against."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for d in os.listdir(state_dir):
        if not (d.startswith("b") and d[1:].isdigit()):
            continue
        if below_batch is not None and int(d[1:]) >= below_batch:
            continue
        if os.path.exists(os.path.join(state_dir, d, _COMMIT_MARKER)):
            out.append(os.path.join(state_dir, d))
    return sorted(out, key=lambda p: int(os.path.basename(p)[1:]))


def stream_dedup_against_index(stream: DataFrame, state_dir: str,
                               text_col: str = "text", id_col: str = "doc_id",
                               num_perm: int = 64, bands: int = 16,
                               shingle_n: int = 3,
                               checkpoint: str | None = None,
                               observer=None) -> DataFrame:
    """Run a document stream to completion (availableNow); every
    micro-batch is deduped against the kept corpus, survivors join it,
    and their band-index rows extend the index.  Returns the final kept
    (id, text) corpus.

    State is APPEND-SHAPED (r16 decade audit): each batch writes ONLY
    its survivors and their band rows to a batch-id-keyed dir
    (``b<id>/kept``, ``b<id>/index``); the state a batch dedups
    against is the union of all completed earlier dirs.  The previous
    design rewrote the ENTIRE corpus+index as a new version every
    batch — the decade run measured the resulting O(corpus)-per-batch
    latency growing ~1 s/batch at 500 k docs, while the dedup join
    itself is bounded by the batch's band rows.

    Replay contract (r16 review — sharper than the first draft's
    claim): crash recovery holds only WITH a ``checkpoint`` — that is
    what makes a restart replay the same batch ids, so the id-keyed
    dirs line up; each replayed dir drops its ``_COMMITTED`` marker
    before rewriting and re-adds it after, and an uncommitted dir is
    invisible to ``_committed_state_dirs``.  Without a checkpoint a
    restart re-reads the source with ids from 0, which is why a
    PRE-POPULATED ``state_dir`` with no checkpoint is REJECTED below —
    the function cannot tell a resume from a collision with a previous
    run's state (whose stale tail dirs would union into the result).
    ``state_dir`` must be a fresh local directory, or the same
    (state_dir, checkpoint) pair as the run being resumed.

    ``observer(batch_id, n_rows, wall_s)``, when given, is called after
    each non-empty micro-batch commits its state dir — the hook
    scripts/incdedup_throughput.py uses so the decade-scale latency
    audit measures THIS function rather than a drift-prone replica of
    it (r16 review).  The per-batch ``count()`` is only paid when an
    observer is attached."""
    import time as _time

    _require_local_dir(state_dir)
    if checkpoint is None and _committed_state_dirs(state_dir):
        raise ValueError(
            f"state_dir {state_dir!r} already holds committed batch state "
            "but no checkpoint was given: without one, batch ids restart "
            "at 0 and this run would overwrite some of the existing dirs "
            "while unioning the stale rest into its result; pass the "
            "original checkpoint to resume, or use a fresh state_dir")

    spark = stream.sparkSession

    def handle(batch_df: DataFrame, batch_id: int):
        t0 = _time.time()
        if batch_df.isEmpty():
            return
        batch = batch_df.select(id_col, text_col)
        prior = _committed_state_dirs(state_dir, below_batch=batch_id)
        if prior:
            kept = spark.read.parquet(
                *[os.path.join(p, "kept") for p in prior])
            index = spark.read.parquet(
                *[os.path.join(p, "index") for p in prior])
        else:
            kept = index = None
        survivors = dedup_batch_against_kept(
            batch, kept, index, text_col, id_col, num_perm, bands, shingle_n)
        new_index_rows = minhash_band_index(survivors, text_col, id_col,
                                            num_perm, bands, shingle_n)
        out = os.path.join(state_dir, f"b{batch_id}")
        # marker protocol: remove FIRST (a replay rewriting the dir must
        # not look committed mid-rewrite), write both halves, add LAST —
        # a crash anywhere in between leaves the dir invisible
        marker = os.path.join(out, _COMMIT_MARKER)
        if os.path.exists(marker):
            os.remove(marker)
        new_index_rows.write.mode("overwrite").parquet(
            os.path.join(out, "index"))
        survivors.write.mode("overwrite").parquet(os.path.join(out, "kept"))
        open(marker, "w").close()
        if observer is not None:
            observer(batch_id, batch.count(), _time.time() - t0)

    writer = stream.writeStream.foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.trigger(availableNow=True).start()
    query.awaitTermination()
    final = _committed_state_dirs(state_dir)
    if not final:
        raise ValueError("document stream produced no batches")
    return spark.read.parquet(*[os.path.join(p, "kept") for p in final])
