"""Scale-adaptive partition sizing for operator-internal shuffles.

The engine's operators run unchanged from local[8] smoke tests to a
cluster with hundreds of cores, but `spark.sql.shuffle.partitions` is
one session-wide constant: sized for the cluster it buries a small
intermediate under thousands of empty reduce tasks, sized for local
mode it under-parallelizes the cluster. AQE's partition coalescing
normally fixes this at runtime, but sessions that pin a fixed task
count (the bench harness pins 256 with coalescing disabled for
cross-core-count comparability) — or clusters where AQE is off — pay
the constant on every tiny stage.

:func:`adaptive_coalesce` is the operator-side fix the optimization
guide prescribes ("derive partitioning from input size, not a
constant"): merge a stage's reduce partitions down to
``clamp(input_bytes / target_bytes, default_parallelism,
session_shuffle_partitions)`` using Catalyst's plan-time size estimate
of the operator's INPUT (no job is run). Properties:

- at production scale the estimate exceeds ``target_bytes x
  session_shuffle_partitions`` and the call is the identity — cluster
  plans are untouched;
- on small inputs the reduce side collapses to the machine's
  parallelism, cutting per-stage scheduling overhead (measured
  ~0.25 s per 256-task stage on local[32], round-7);
- ``coalesce`` is a partition MERGE (no shuffle, deterministic
  index-based grouping), so results and lineage semantics are
  unchanged, and a later repartition/groupBy re-establishes any
  distribution it needs.

Use on aggregation/distinct outputs and persisted intermediates;
do NOT use where the merged partitioning must feed a same-key
downstream exchange at full width (the exchange re-shuffles anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "plan_size_bytes",
    "scaled_partitions",
    "adaptive_coalesce",
    "parallel_input",
]

# one reduce partition per this many estimated input bytes
_TARGET_BYTES = 64 << 20


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimized-plan size estimate in bytes (plan-time
    metadata — runs no job). For parquet scans this is the file-size
    sum scaled by the format's compression estimate; for derived
    plans it is propagated. None when the JVM call fails (never
    observed; defensive so tuning can never break an operator)."""
    try:
        v = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return int(min(int(v), 1 << 62))
    except Exception:  # pragma: no cover - defensive
        return None


def scaled_partitions(
    df: DataFrame, target_bytes: int = _TARGET_BYTES
) -> int:
    """Partition count derived from ``df``'s estimated size: between
    the machine/cluster default parallelism (floor — keep every core
    busy) and the session's shuffle-partition setting (cap — never
    exceed what the operator would have used)."""
    spark = df.sparkSession
    floor = spark.sparkContext.defaultParallelism
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    size = plan_size_bytes(df)
    if size is None:
        return cap
    return max(floor, min(cap, -(-size // target_bytes)))


def adaptive_coalesce(
    df: DataFrame,
    source: DataFrame | None = None,
    target_bytes: int = _TARGET_BYTES,
) -> DataFrame:
    """``df.coalesce(n)`` with n derived from ``source``'s (default:
    ``df``'s own) plan-time size estimate. Identity at cluster scale;
    collapses tiny reduce stages to the core count locally."""
    n = scaled_partitions(
        source if source is not None else df, target_bytes
    )
    return df.coalesce(n)


def parallel_input(df: DataFrame) -> DataFrame:
    """Floor the SCAN-side parallelism of an operator input.

    A small table written as one parquet file holds a single row
    group, and Spark's split machinery cannot parallelize inside a row
    group — so the whole map side of the operator (tokenize, hash,
    regex, the partial aggregate) runs in ONE task no matter how many
    cores the session has. The guide's remedy for unsplittable inputs
    is an explicit repartition straight after the read; this applies
    it ONLY when needed: if the input already has at least the
    scale-derived partition count, it is returned untouched (the
    production case — large scans have plenty of splits, cached
    intermediates are already parallel), otherwise it is round-robin
    repartitioned to that count. The repartition shuffle moves only
    this small input once and unlocks every core for the expensive
    map work above it (sort-before-repartition keeps the row-to-
    partition assignment retry-deterministic; all consumers here are
    row-order-independent aggregations/joins).

    The ``.rdd`` partition probe forces FULL physical planning of the
    input subtree (analysis + optimizer + physical plan), which costs
    ~2 s on a deep chain (measured on the embed subtree, round-7). A
    cheap pre-check on the ANALYZED logical plan skips the probe when
    the input contains an exchange-bearing operator (aggregate, join,
    window, repartition, a pandas map stage): such inputs are already
    at shuffle width, so the probe could only ever return 'untouched'
    — the single-row-group parquet problem this function exists for
    can only occur on (near-)bare scans."""
    try:
        lp = df._jdf.queryExecution().analyzed().toString()
        if any(
            m in lp
            for m in (
                "Aggregate",
                "Join",
                "Repartition",
                "Window",
                "MapInPandas",
                "FlatMapGroupsInPandas",
                "MapInArrow",
            )
        ):
            return df
        nparts = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive
        return df
    n = scaled_partitions(df)
    if nparts >= min(n, df.sparkSession.sparkContext.defaultParallelism):
        return df
    return df.repartition(n)
