"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all (SURVEY.md §2.12); this is the
Structured-Streaming-native form of its per-series running statistics
(ts_analyzer EWMA/anomaly logic) as an arbitrary-stateful operator:
per-key state lives in the state store (RocksDB/HDFS-backed on a real
cluster), scales by key hash, and recovers exactly-once from the
checkpoint."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("running_mean", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)
_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)


def running_stats_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    alpha: float = 0.3,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key running count/mean/EWMA over a stream — the stateful
    generalization of temporal.ewma. `events` must be a streaming
    DataFrame; output mode "update" emits one row per key per batch.

    A key's micro-batch rows may span several Arrow chunks (~10k rows
    each), so the fold buffers ALL chunks for the key and sorts ONCE by
    ``ts_col`` — the EWMA is then deterministic across shuffles/retries
    within a micro-batch regardless of chunk-arrival order (matching
    temporal.ewma's sort-by-ts). Cross-batch ordering still relies on
    the source delivering batches in event-time order, as micro-batch
    streaming inherently does. The buffered state is one key's rows for
    one micro-batch — bounded by the trigger interval, not the stream."""

    def update(key, batches, state: GroupState):
        import pandas as pd

        if state.exists:
            n, total, ewma = state.get
        else:
            n, total, ewma = 0, 0.0, None
        frames = [pdf for pdf in batches if len(pdf)]
        if frames:
            pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
            if ts_col in pdf.columns:
                pdf = pdf.sort_values(ts_col, kind="mergesort")
            vals = pdf[value_col].dropna()
            for v in vals:
                n += 1
                total += float(v)
                ewma = (
                    float(v)
                    if ewma is None
                    else alpha * float(v) + (1 - alpha) * ewma
                )
        state.update((n, total, float(ewma) if ewma is not None else None))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_events": [n],
                "running_mean": [total / n if n else None],
                "ewma": [ewma],
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
