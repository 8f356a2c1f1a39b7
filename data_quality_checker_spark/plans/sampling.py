"""Deterministic sampling / data-mixing for training corpora.

No reference ancestor — /root/reference has no sampling surface; this
is a training-data-pipeline extension (task brief): the reweighting
step that turns a filtered crawl into a training mix (per-source
proportions, quality-weighted upsampling a la DSIR).

Every selector here is a PURE PREDICATE on a hash of the row's key —
no rand(), no zipWithIndex, no window:

- re-runs, resumed partitions, and different partition counts all
  select the SAME rows (rand() re-draws per task attempt; a retried
  task would emit a different sample);
- the 13-hex-char md5 prefix compares lexicographically exactly as
  the 52-bit integer it encodes (the stats.bootstrap_means trick), so
  ``substr(md5(key),1,13) < format('%013x', floor(p * 2^52))`` is a
  byte-identical decision in Spark, Python, and DuckDB;
- the filter is codegen'd into the scan — sampling never costs a
  shuffle. ``weighted_sample`` adds one scalar aggregate to learn the
  normalization constant.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_frac_predicate",
    "sample_fractions",
    "weighted_sample",
    "stride_sample_column",
    "plan_mixture",
]

_SCALE = float(2**52)


def stride_sample_column(
    df: DataFrame,
    col: str,
    target: int,
    cap: int | None = None,
    seed: int = 42,
    oversample: float = 1.2,
    key_col: str | None = None,
) -> list:
    """Bounded UNBIASED driver-side sample of one column — the shared
    primitive behind every sample-trained artifact (BPE merges, the
    POS perceptron, Shapiro-Wilk): a seeded Bernoulli draw targeting
    ``target * oversample`` rows, then a deterministic STRIDE cut to
    ``cap`` (default ``target``).

    NEVER limit() after sample: limit takes rows in partition order,
    so on value-sorted / range-partitioned data it would truncate the
    upper tail (verified on a sorted N(50,5) column: Shapiro falsely
    rejects with W=0.964, p=0). The Bernoulli draw alone is unbiased;
    the stride keeps every partition proportionally represented when
    the draw over-shoots. Nulls are excluded.

    Determinism caveat: the default ``df.sample(seed=)`` draw is
    retry-stable but PARTITION-LAYOUT-dependent (Spark seeds the RNG
    per partitionIndex), so re-splitting the same input (different
    file sizes, repartition, compaction) changes which rows are drawn
    — and therefore the trained artifacts (BPE merges, POS perceptron,
    Shapiro sample) built from them. When a stable unique key exists,
    pass ``key_col`` to switch the draw to the repo's md5-threshold
    predicate (hash_frac_predicate) AND a key-hash collect order:
    both the drawn set and the stride cut then depend only on row
    VALUES — same final sample under any layout (the draw alone
    would not suffice: collect() returns partition order, and the
    cut is positional).

    ``key_col`` must be non-null on every sampled row (validated,
    fail-fast): concat_ws SKIPS a null argument, so every null-key row
    would hash the identical constant and the whole subpopulation
    would be drawn all-or-nothing — either flooding the cut or
    silently vanishing from the trained artifact."""
    cap = target if cap is None else cap
    src = df.select(
        col, *([key_col] if key_col and key_col != col else [])
    ).filter(F.col(col).isNotNull())
    if key_col is not None:
        counts = src.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col(key_col).isNull().cast("long")
            ).alias("null_keys"),
        ).head()
        total = counts["n"]
        if (counts["null_keys"] or 0) > 0:
            raise ValueError(
                f"key_col {key_col!r} has {counts['null_keys']} NULL "
                f"values among sampled rows — the hash draw needs a "
                f"never-null key (url/doc_id) or the null-key rows "
                f"collapse into one all-or-nothing decision"
            )
    else:
        total = src.count()
    frac = min(1.0, (target * oversample) / max(total, 1))
    if key_col is not None:
        hk = F.md5(
            F.concat_ws("|", F.col(key_col), F.lit(str(seed)))
        )
        drawn = src.filter(hash_frac_predicate(hk, frac))
        # ORDER by the key hash too: collect() returns partition
        # order, so without this the stride cut (positional) — and
        # the artifact trained on the sample — would still change
        # under a re-layout even though the drawn SET is stable. The
        # hash order is a deterministic shuffle, preserving the cut's
        # every-region-represented property without value-sorting
        # bias.
        vals = [
            r[0]
            for r in drawn.select(F.col(col), hk.alias("_hk"))
            .orderBy("_hk", col)
            .collect()
        ]
    else:
        drawn = src.sample(fraction=frac, seed=seed)
        vals = [r[0] for r in drawn.select(col).collect()]
    if len(vals) > cap:
        step = len(vals) / cap
        vals = [vals[int(i * step)] for i in range(cap)]
    return vals


def hash_frac_predicate(key: Column, p: Column | float) -> Column:
    """True for a deterministic ~``p`` fraction of keys: uniform
    52-bit hash of the key compared against a per-row threshold.
    ``p`` may be a literal or a column (per-row probabilities)."""
    pc = F.lit(float(p)) if isinstance(p, (int, float)) else p
    pc = F.greatest(F.lit(0.0), pc)
    thresh = F.format_string(
        "%013x", F.floor(pc * F.lit(_SCALE)).cast("bigint")
    )
    # p >= 1 short-circuits: format('%013x', 2^52) is a 14-char string
    # that sorts BELOW 13-char hex prefixes starting past '1'
    return (pc >= 1.0) | (
        F.substring(F.md5(key.cast("string")), 1, 13) < thresh
    )


def sample_fractions(
    df: DataFrame,
    fractions: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_frac: float = 0.0,
) -> DataFrame:
    """Per-source deterministic Bernoulli mix: keep ~``fractions[s]``
    of each source's rows (sources absent from the dict keep
    ``default_frac``). The mixing step of a training-data pipeline —
    e.g. {'web': 0.3, 'books': 1.0, 'code': 0.8}. Pure filter, no
    shuffle; kept sets are nested as fractions grow (a 0.5 sample
    contains the 0.3 sample), which makes ablation subsets free."""
    p = None
    for s, frac in sorted(fractions.items()):
        cond = F.col(source_col) == F.lit(s)
        p = (
            F.when(cond, F.lit(float(frac)))
            if p is None
            else p.when(cond, F.lit(float(frac)))
        )
    p = (
        F.lit(float(default_frac))
        if p is None
        else p.otherwise(F.lit(float(default_frac)))
    )
    return df.filter(hash_frac_predicate(F.col(key_col), p))


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    target_frac: float,
    key_col: str = "doc_id",
) -> DataFrame:
    """Importance sampling: keep row i with probability proportional
    to ``weight_i`` so the expected kept fraction is ``target_frac``
    (p_i = min(1, target_frac * N * w_i / sum(w)); rows with null or
    non-positive weight are never kept). When the weight distribution
    is heavy enough that some p_i saturate at 1, the realized kept
    fraction falls below ``target_frac`` — standard importance-
    sampling truncation; rescale weights upstream if the exact budget
    matters. One scalar aggregate learns
    (N, sum w) — broadcast back as literals — then the same
    deterministic hash predicate. DSIR-style quality reweighting:
    weight by a quality score and high-quality documents are
    upsampled relative to the rest."""
    w = F.col(weight_col)
    totals = df.filter(w.isNotNull() & (w > 0)).agg(
        F.count(F.lit(1)).alias("n"), F.sum(w.cast("double")).alias("sw")
    ).collect()[0]
    n, sw = totals["n"], totals["sw"]
    if not n or not sw:
        return df.filter(F.lit(False))
    p = F.lit(float(target_frac) * float(n) / float(sw)) * w.cast("double")
    return df.filter(
        w.isNotNull() & (w > 0)
        & hash_frac_predicate(F.col(key_col), p)
    )


def plan_mixture(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Token-budget mixture planning: given target mixture ``weights``
    (relative proportions per source — they are normalized here) and a
    total ``budget_tokens``, compute the per-source Bernoulli keep
    fraction that realizes the mix from what each source actually has:

    ``fraction_s = min(1, budget * weight_s / available_s)``

    One aggregate over the corpus -> one tiny row per source
    (``source, available_tokens, weight, target_tokens, fraction,
    expected_tokens``); feed the fractions to :func:`sample_fractions`
    to apply. Sources with a capped fraction (1.0) deliver fewer
    tokens than their target — the ``expected_tokens`` column makes
    the shortfall explicit so the caller can re-weight or
    up-epoch that source (the Chinchilla/DoReMi-style planning step a
    mixing pipeline runs before sampling; no reference ancestor —
    training-data extension).

    Sources present in the corpus but absent from ``weights`` get
    weight 0 (fraction 0, planned out); weights naming absent sources
    raise — a silent typo there would starve the mix. Rows with a NULL
    ``source_col`` are excluded from planning and reported as the
    ``<NULL>`` source with weight/fraction 0 (missing source metadata
    is routine in crawl data; a plan row makes the excluded volume
    loud instead of crashing or silently dropping it)."""
    if budget_tokens < 0:
        raise ValueError("need budget_tokens >= 0")
    bad = {
        s: w
        for s, w in weights.items()
        if not math.isfinite(float(w)) or float(w) < 0
    }
    if bad:
        # a negative weight would pass the sum check, flow through as
        # a negative fraction and silently starve that source at the
        # hash-predicate clamp; NaN passes BOTH checks (nan<0 and
        # nan<=0 are False) and inf poisons the normalization — both
        # would die later as an opaque int(nan). Surface malformed
        # weights loudly, by name.
        raise ValueError(f"weights must be finite and >= 0, got {bad}")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")
    avail = df.groupBy(source_col).agg(
        F.sum(F.col(token_col)).cast("long").alias("available_tokens")
    )
    rows = {r[source_col]: r["available_tokens"] for r in avail.collect()}
    null_avail = rows.pop(None, None)
    missing = set(weights) - set(rows)
    if missing:
        raise ValueError(
            f"weights name sources absent from the corpus: "
            f"{sorted(missing)}"
        )
    spark = df.sparkSession
    out = []
    for s in sorted(rows):
        w = float(weights.get(s, 0.0)) / total_w
        available = int(rows[s] or 0)
        target = budget_tokens * w
        frac = 0.0 if available == 0 else min(1.0, target / available)
        out.append(
            (s, available, w, int(target), frac, int(available * frac))
        )
    if null_avail is not None:
        out.append(("<NULL>", int(null_avail or 0), 0.0, 0, 0.0, 0))
    return spark.createDataFrame(
        out,
        "source string, available_tokens long, weight double, "
        "target_tokens long, fraction double, expected_tokens long",
    )
