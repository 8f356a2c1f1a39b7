"""Benchmark decontamination: exact n-gram collision against an
evaluation corpus.

No reference ancestor — /root/reference has no decontamination surface
at all; this is a training-data-pipeline extension (task brief): the
exact 13-gram collision filter used to keep evaluation benchmarks out
of training corpora (GPT-3 appendix C / Dolma-style). A document is
contaminated when at least ``min_hits`` of its distinct word n-grams
also occur anywhere in the evaluation corpus.

Plan shape (designed for a 100 TB corpus vs a small benchmark suite):

1. ``eval_ngrams`` distills the evaluation corpus to its DISTINCT
   n-gram keys — one explode + one distinct shuffle over the (small)
   eval side only. With ``key_mode='xxhash64'`` the key is an 8-byte
   long, so a multi-million-n-gram suite broadcasts in tens of MB.
2. ``contamination_report`` never shuffles exploded corpus rows by
   n-gram when the eval side fits an executor: a row-count guard
   (``broadcast=None``) broadcasts small eval key tables — the explode
   then feeds a map-side broadcast-hash left join, and the per-doc
   count is a hash aggregate whose partial (map-side) combine
   collapses each document back to a single row BEFORE the only
   shuffle (on the doc id). Net cost over the corpus: one scan, one
   narrow shuffle of one row per document. Oversized eval unions
   (many suites × 13-grams) fall back to a shuffle join keyed on the
   8-byte hash instead of OOMing the broadcast build side.
3. No join-back: ``n_ngrams`` is computed pre-explode and carried
   through the aggregate, so clean documents appear in the report with
   ``hit_ngrams = 0`` without a second pass over the corpus.

Tokenization matches ``functions.text.tokens`` (lowercased whitespace
split), so the DuckDB oracle twin reproduces keys byte-for-byte in
``key_mode='text'``; the xxhash64 fast path is parity-pinned against
the text path in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

__all__ = [
    "eval_ngrams",
    "contamination_report",
    "drop_contaminated",
    "guarded_bad_set",
]

_KEY_MODES = ("text", "xxhash64")


def guarded_bad_set(
    bad: DataFrame, max_rows: int = 5_000_000
) -> tuple[DataFrame, DataFrame]:
    """Row-count guard for broadcasting a contaminated-id set BACK at
    the corpus. Contamination is rare by construction — eval suites are
    tiny next to a crawl — but an adversarial or misconfigured eval set
    (``eval_is_ngrams`` with common grams + ``min_hits=1``) makes
    ``bad`` corpus-sized, and an unconditional ``F.broadcast(bad)``
    then OOMs the driver-side broadcast build. Mirror of the eval-side
    guard in :func:`contamination_report`: persist ``bad`` (so the
    guard's count() and the subsequent join share one computation of
    the contamination job), count it, and only hint broadcast when it
    fits ``max_rows``; otherwise return it unhinted so the join
    shuffles on the id (AQE may still downgrade to broadcast from the
    measured size — that check is the point).

    Returns ``(join_side, handle)`` — join ``join_side``; unpersist
    ``handle`` when done (callers attach it via ``_cached_deps``).
    """
    bad = bad.persist()
    hinted = F.broadcast(bad) if bad.count() <= max_rows else bad
    return hinted, bad


def _ngram_key(ng: Column, key_mode: str) -> Column:
    if key_mode == "xxhash64":
        # xxhash64(NULL) is the non-null seed hash — preserve NULL so
        # an explode_outer placeholder row can never join an eval key
        return F.when(ng.isNull(), F.lit(None).cast("bigint")).otherwise(
            F.xxhash64(ng)
        )
    return ng


def _distinct_ngrams(text_col: str, n: int, lowercase: bool) -> Column:
    tok = T.tokens(F.col(text_col), lowercase=lowercase)
    return F.array_distinct(T.word_ngrams(tok, n))


def eval_ngrams(
    eval_df: DataFrame,
    text_col: str = "text",
    n: int = 13,
    key_mode: str = "text",
    lowercase: bool = True,
    storage_path: str | None = None,
) -> DataFrame:
    """Distinct n-gram keys of the evaluation corpus: one column
    ``ng_key`` (string in ``key_mode='text'``, bigint xxhash64 in
    ``key_mode='xxhash64'``). This is the broadcast side — distinct
    runs on the eval corpus only, never on the training corpus.

    ``storage_path``: write the key table as parquet and read it back
    — build it once, reuse it across pipeline runs / resumed
    partitions without recomputing (the same materialization contract
    as the MinHash sketch tables)."""
    if key_mode not in _KEY_MODES:
        raise ValueError(f"key_mode must be one of {_KEY_MODES}")
    ngs = _distinct_ngrams(text_col, n, lowercase)
    out = (
        eval_df.filter(F.col(text_col).isNotNull())
        .select(F.explode(ngs).alias("_ng"))
        .select(_ngram_key(F.col("_ng"), key_mode).alias("ng_key"))
        .distinct()
    )
    if storage_path is not None:
        out.write.mode("overwrite").parquet(storage_path)
        return eval_df.sparkSession.read.parquet(storage_path)
    return out


def contamination_report(
    docs: DataFrame,
    eval_source: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    key_mode: str = "text",
    lowercase: bool = True,
    eval_is_ngrams: bool = False,
    broadcast: bool | None = None,
    broadcast_max_keys: int = 5_000_000,
) -> DataFrame:
    """Per-document contamination stats vs the evaluation corpus.

    Returns one row per corpus document with non-null text:
    ``(id_col, n_ngrams, hit_ngrams, contamination_frac,
    contaminated)`` where ``hit_ngrams`` counts the document's
    DISTINCT n-grams that collide with the eval set and
    ``contaminated = hit_ngrams >= min_hits``. Documents shorter than
    ``n`` tokens have ``n_ngrams = 0`` and are clean by definition.

    ``eval_source`` is either a raw eval DataFrame (n-grams derived
    here with the same ``n``/``key_mode``) or, when
    ``eval_is_ngrams=True``, a prebuilt ``eval_ngrams`` table — build
    it once and reuse it across corpus partitions/runs.

    Precondition: ``id_col`` is unique per document — the hit count
    aggregates by it, so duplicate ids would pool their n-grams into
    one report row (dedup on id upstream if unsure).

    Join strategy (100 TB insurance): ``broadcast=True`` forces the
    broadcast hint (the GPT-3 single-suite case — a few MB of 8-byte
    keys); ``broadcast=False`` omits the hint, so the join shuffles on
    the key (AQE may still downgrade to broadcast if the measured size
    fits — that check is the point); ``broadcast=None`` (default)
    takes a row-count guard: hint only when the eval key table holds
    at most ``broadcast_max_keys`` keys (~5M 8-byte keys ≈ 40 MB
    payload). A many-suite eval union at 13-grams can reach
    executor-memory scale, where a hard hint would OOM the build side.
    On the shuffle path Spark 4's runtime Bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.enabled, ON by default)
    semi-join-reduces the exploded corpus side before the exchange
    when the eval side fits the 10 MB creation threshold — so even the
    fallback rarely shuffles clean documents' n-grams.
    The guard's count() runs over the EVAL side only; when the keys
    are derived inline (``eval_is_ngrams=False``) that side is
    recomputed for the join — cheap by construction (eval suites are
    tiny next to the corpus), pass a prebuilt/materialized
    ``eval_ngrams`` table to pay it once.
    """
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1")
    if key_mode not in _KEY_MODES:
        # validate HERE too, not only in eval_ngrams: with
        # eval_is_ngrams=True a typo ('xxhash') would otherwise
        # silently fall back to text-mode doc keys, match nothing
        # against a bigint-keyed eval table, and report every
        # document clean — a silent decontamination no-op
        raise ValueError(f"key_mode must be one of {_KEY_MODES}")
    if eval_is_ngrams:
        ev_type = dict(eval_source.dtypes).get("ng_key")
        want = "bigint" if key_mode == "xxhash64" else "string"
        if ev_type != want:
            raise ValueError(
                f"prebuilt eval table ng_key is {ev_type!r} but "
                f"key_mode={key_mode!r} expects {want!r} — the join "
                "would match nothing"
            )
        ev = eval_source
    else:
        ev = eval_ngrams(eval_source, text_col, n, key_mode, lowercase)
    if broadcast is None:
        broadcast = ev.count() <= broadcast_max_keys
    ev = ev.withColumn("_hit", F.lit(1))
    ngs = _distinct_ngrams(text_col, n, lowercase)
    from data_quality_checker_spark.tuning import parallel_input

    exploded = (
        parallel_input(docs.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(id_col),
            F.size(ngs).cast("bigint").alias("_n_ngrams"),
            F.explode_outer(ngs).alias("_ng"),
        )
        .select(
            id_col,
            "_n_ngrams",
            _ngram_key(F.col("_ng"), key_mode).alias("ng_key"),
        )
    )
    from data_quality_checker_spark.tuning import adaptive_coalesce

    # reduce width derived from corpus size (tuning module): the
    # one-row-per-doc aggregate needs nothing like a full-width
    # reduce stage on small inputs; identity at scale
    counted = adaptive_coalesce(
        exploded.join(F.broadcast(ev) if broadcast else ev, "ng_key", "left")
        .groupBy(id_col)
        .agg(
            F.max("_n_ngrams").alias("n_ngrams"),
            F.count("_hit").alias("hit_ngrams"),
        ),
        docs,
    )
    return counted.select(
        id_col,
        "n_ngrams",
        "hit_ngrams",
        F.round(
            F.when(
                F.col("n_ngrams") > 0,
                F.col("hit_ngrams") / F.col("n_ngrams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contamination_frac"),
        (F.col("hit_ngrams") >= F.lit(min_hits)).alias("contaminated"),
    )


def drop_contaminated(
    docs: DataFrame,
    eval_source: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    key_mode: str = "xxhash64",
    lowercase: bool = True,
    eval_is_ngrams: bool = False,
    broadcast: bool | None = None,
    broadcast_max_keys: int = 5_000_000,
) -> DataFrame:
    """Corpus minus contaminated documents (docs with null text are
    kept — they carry no n-grams). The filter is a broadcast-hash
    anti-join of the (small) contaminated-id set against the corpus,
    so the corpus itself is scanned twice but never shuffled wide;
    persist/checkpoint ``docs`` upstream to make the second scan
    cheap. ``broadcast``/``broadcast_max_keys`` forward to
    :func:`contamination_report` (eval-side join-strategy guard); the
    broadcast BACK of the contaminated-id set takes its own
    :func:`guarded_bad_set` row-count guard (a pathological eval set
    can make it corpus-sized)."""
    bad = (
        contamination_report(
            docs,
            eval_source,
            id_col,
            text_col,
            n,
            min_hits,
            key_mode,
            lowercase,
            eval_is_ngrams,
            broadcast,
            broadcast_max_keys,
        )
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    bad_side, handle = guarded_bad_set(bad, broadcast_max_keys)
    out = docs.join(bad_side, id_col, "left_anti")
    out._cached_deps = (handle, *getattr(docs, "_cached_deps", ()))
    return out
