"""transformWithStateInPandas (Spark 4's arbitrary-stateful-processing
API, the successor of applyInPandasWithState used by
streaming/sessionize.py): a ``StatefulProcessor`` with named typed state
slots managed by the state store — here a per-user running (count,
cents) pair carried across micro-batches.

The API requires the RocksDB state-store provider (bundled with Spark —
no extra jar); callers set
``spark.sql.streaming.stateStore.providerClass`` before starting the
query.  State lives in the store, NOT the Python worker: per key only
the two int64s round-trip per batch, so state size scales with keys,
not events — the property that makes the operator viable on an
unbounded 100 TB stream.

ENV-BLOCKED in this sandbox (r10 probe): transformWithState's Python
driver worker speaks protobuf to the JVM
(pyspark/sql/streaming/proto/StateMessage_pb2.py) and the
``google.protobuf`` package is not installed — the query dies with
``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE: ImportError: cannot
import name 'descriptor' from 'google.protobuf'``.  The operator is
implemented and plan-builds (test_tws_requires_protobuf pins the
exact failure mode); it lights up the day a protobuf wheel appears —
same posture as the Kinesis connector jar and JPEG codecs.
applyInPandasWithState (streaming/sessionize.py, driver-green since
r4) remains the working stateful surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming."
                    "state.RocksDBStateStoreProvider")


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user cumulative (n_events, cents) via transformWithState —
    update-mode rows emit the running state after each batch, so the
    FINAL row per user (the one with the max count) equals the batch
    aggregate and is oracle-checkable regardless of micro-batch
    splits.  Cents use the floor(x*100+0.5) money canon."""
    import pandas as pd
    import pyspark.sql.functions as F
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("totals", "n BIGINT, cents BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (tuple(self._st.get()) if self._st.exists()
                        else (0, 0))
            for pdf in rows:
                n += len(pdf)
                cents += int(pdf["cents"].sum())
            self._st.update((n, cents))
            yield pd.DataFrame({"user_id": [key[0]],
                                "n_events": [n], "cents": [cents]})

        def close(self) -> None:
            pass

    src = events.select(
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        .alias("cents"))
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, n_events bigint, cents bigint",
        outputMode="Update",
        timeMode="None")
