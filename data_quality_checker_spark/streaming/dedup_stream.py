"""Streaming deduplication — the incremental form of the batch dedup
operators (operators/dedup.py; reference ancestor dq_checker.py:559-577
detect_duplicates, which is batch-only).

Two built-in stateful strategies, both watermark-bounded so the dedup
state store cannot grow without bound at 10^12-document scale:

 - dedup_replays_stream: dropDuplicates on (key, event time) — the
   at-least-once-delivery guard: a REDELIVERED event (same key and
   timestamp) is suppressed; a genuine re-capture at a new timestamp
   passes through.
 - dedup_within_watermark uses dropDuplicatesWithinWatermark (Spark
   3.5+), which evicts keys once the watermark passes them — the right
   semantics when re-crawls of the same url arrive days apart and only
   near-in-time duplicates should collapse.

State sizing: state rows ~ distinct keys inside the watermark horizon;
key = 16-byte digest + timestamp, so a 1-day horizon over a 10^9
docs/day feed is ~50 GB of state across the cluster — RocksDB state
store territory, configured by the caller, not assumed here."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_content_digest",
    "dedup_replays_stream",
    "dedup_within_watermark",
]


def with_content_digest(
    df: DataFrame, text_col: str = "text", out_col: str = "content_md5"
) -> DataFrame:
    """Stable 128-bit content key (md5 of the raw text; engine-portable,
    same key the batch exact-dedup groups on). NULL text gets its own
    sentinel key — coalescing to '' would collapse null docs with
    genuinely EMPTY docs (md5('') = d41d8cd9...), wrongly suppressing
    an empty document that follows a null one within the watermark,
    where the batch path keeps both (review finding)."""
    return df.withColumn(
        out_col,
        F.when(
            F.col(text_col).isNull(), F.lit("<NULL-TEXT>")
        ).otherwise(F.md5(F.col(text_col))),
    )


def dedup_replays_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Suppress REDELIVERED events (same key AND event time — the
    at-least-once source guard). The watermark bounds how late a
    replay may arrive; state for (key, ts) pairs older than the
    horizon is evicted by Spark."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        key_cols + [ts_col]
    )


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Suppress duplicates of a key arriving within the watermark
    horizon of its first occurrence, then evict the key (Spark 3.5+
    dropDuplicatesWithinWatermark) — duplicate keys OUTSIDE the horizon
    pass through, matching re-crawl semantics."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )
