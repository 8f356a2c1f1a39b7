"""Count-based trigram language model: distributed training + two
scoring paths.

The reference's complexity scoring (nlp_analyzer.py:321-349, textstat)
and the north rule's "KenLM-style n-gram perplexity" slot get a real,
dependency-free LM here: add-one-smoothed trigram probabilities

    p(w3 | w1 w2) = (c(w1 w2 w3) + 1) / (c(w1 w2) + V)

with V = training vocabulary size; perplexity(doc) = exp(-mean ln p)
over the document's trigrams (docs with < 3 tokens score NULL).

 - TRAINING is a distributed aggregation (explode n-grams -> groupBy
   counts) — one shuffle each for trigrams/bigrams, map-side combined.
 - SCORING path 1 (perplexity_df): pure DataFrame — explode doc
   trigrams, broadcast-join the count tables, one avg — exactly
   reproducible in the DuckDB oracle.
 - SCORING path 2 (artifact): write_trigram_lm serializes the counts
   (gzip json) for SparkContext.addFile distribution; TrigramLM scores
   inside the iterator pandas UDF (plans/udfs.perplexity_udf) — the
   KenLM deployment shape, loaded once per worker, non-picklable.
"""

from __future__ import annotations

import gzip
import json
import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import tokens, word_ngrams

__all__ = [
    "train_trigram_counts",
    "perplexity_df",
    "write_trigram_lm",
    "load_trigram_lm",
    "TrigramLM",
]

FORMAT = "dqs-trigram-lm-v1"
_WS = re.compile(r"[ \t\n\x0b\f\r]+")  # the engine tokenization contract


def train_trigram_counts(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(trigram_counts, bigram_counts, vocab_size) over the training
    slice. Count tables are (gram, n); vocab_size is the distinct
    token count (the add-one denominator)."""
    base = df.filter(F.col(text_col).isNotNull()).select(
        tokens(text_col).alias("_tk")
    ).persist()
    # persisted: three consumers (tri explode, bi explode, vocab
    # countDistinct) would otherwise each re-tokenize the full
    # training slice; the count tables carry the handle as
    # _cached_deps for release_cache once collected/written
    tri = (
        base.select(F.explode(word_ngrams(F.col("_tk"), 3)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bi = (
        base.select(F.explode(word_ngrams(F.col("_tk"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = base.select(F.explode("_tk").alias("t")).agg(
        F.countDistinct("t")
    ).collect()[0][0]
    tri._cached_deps = (base,)
    bi._cached_deps = (base,)
    return tri, bi, int(vocab or 0)


def perplexity_df(
    docs: DataFrame,
    tri: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, perplexity) via the DataFrame path: explode each document's
    trigrams, join the (broadcast) count tables on the trigram and its
    bigram prefix, average the log probabilities. Unseen grams coalesce
    to count 0 — add-one smoothing handles them."""
    d = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("_tk")
    )
    grams = d.select(
        "id", F.explode(word_ngrams(F.col("_tk"), 3)).alias("gram")
    ).withColumn(
        # bigram prefix = trigram minus its last token
        "prefix",
        F.regexp_replace(F.col("gram"), r" [^ ]+$", ""),
    )
    tri_n = tri.withColumnsRenamed({"gram": "gram", "n": "_tn"})
    bi_n = bi.withColumnsRenamed({"gram": "prefix", "n": "_bn"})
    logp = F.log(
        (F.coalesce(F.col("_tn"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("_bn"), F.lit(0)) + F.lit(vocab_size))
    )
    scored = (
        grams.join(F.broadcast(tri_n), "gram", "left")
        .join(F.broadcast(bi_n), "prefix", "left")
        .groupBy("id")
        .agg(F.exp(-F.avg(logp)).alias("perplexity"))
    )
    # docs with < 3 tokens have no trigrams -> re-join for NULL rows
    return (
        d.select("id")
        .join(scored, "id", "left")
        .select("id", "perplexity")
    )


class TrigramLM:
    """Loaded artifact scorer — the worker-side twin of perplexity_df
    (parity pinned by tests). Deliberately not picklable: ship the
    artifact with addFile, load via SparkFiles (KenLM semantics)."""

    def __init__(self, tri: dict, bi: dict, vocab_size: int):
        self.tri = tri
        self.bi = bi
        self.v = vocab_size

    def __reduce__(self):
        raise TypeError(
            "TrigramLM is not picklable; distribute the artifact with "
            "SparkContext.addFile and load worker-side"
        )

    def perplexity(self, text: str | None) -> float | None:
        if text is None:
            return None
        toks = [t for t in _WS.split(text.lower()) if t]
        if len(toks) < 3:
            return None
        total = 0.0
        n = 0
        for i in range(len(toks) - 2):
            tri = " ".join(toks[i : i + 3])
            prefix = " ".join(toks[i : i + 2])
            p = (self.tri.get(tri, 0) + 1) / (
                self.bi.get(prefix, 0) + self.v
            )
            total += math.log(p)
            n += 1
        return math.exp(-total / n)


def write_trigram_lm(
    path: str,
    tri: DataFrame,
    bi: DataFrame,
    vocab_size: int,
    min_count: int = 1,
    max_rows: int = 5_000_000,
) -> str:
    """Serialize trained counts as a gzip json artifact.

    This is the one deliberate driver collect in the LM path (the
    artifact must exist as a single file for addFile distribution), so
    it is bounded two ways, KenLM-style:

    - ``min_count`` prunes grams with count < min_count BEFORE the
      collect (KenLM's --prune semantics). Pruned grams score as
      unseen at inference — they fall back to the add-one smoothing
      mass — so a pruned artifact is an approximation of the exact
      DataFrame scorer (perplexity_df), which never collects and
      needs no pruning. At crawl scale the trigram table is billions
      of rows; min_count=2 typically drops the hapax-legomena tail
      (~80% of distinct grams) with negligible score movement.
    - ``max_rows`` fails fast if the post-prune tables would still
      blow the driver, instead of OOMing mid-collect.
    """
    if min_count > 1:
        tri = tri.filter(F.col("n") >= min_count)
        bi = bi.filter(F.col("n") >= min_count)
    # persist around guard + collect: count() and collect() would
    # otherwise each re-run the full upstream n-gram aggregation —
    # the most expensive jobs in this path — twice
    tri, bi = tri.persist(), bi.persist()
    try:
        n_rows = tri.count() + bi.count()
        if n_rows > max_rows:
            raise ValueError(
                f"write_trigram_lm: {n_rows} count rows after "
                f"min_count={min_count} pruning exceed "
                f"max_rows={max_rows} — raise min_count (KenLM-style "
                f"pruning) or max_rows if the driver can hold them"
            )
        payload = {
            "format": FORMAT,
            "vocab_size": vocab_size,
            "tri": {r["gram"]: r["n"] for r in tri.collect()},
            "bi": {r["gram"]: r["n"] for r in bi.collect()},
        }
    finally:
        tri.unpersist()
        bi.unpersist()
    with gzip.open(path, "wt", encoding="utf-8") as fh:
        json.dump(payload, fh)
    return path


def load_trigram_lm(path: str) -> TrigramLM:
    with gzip.open(path, "rt", encoding="utf-8") as fh:
        payload = json.load(fh)
    if payload.get("format") != FORMAT:
        raise ValueError(f"not a {FORMAT} artifact: {path}")
    return TrigramLM(payload["tri"], payload["bi"], payload["vocab_size"])
