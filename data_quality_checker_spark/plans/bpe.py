"""Sample-trained BPE tokenizer with distributed encoding.

No reference ancestor — training-data extension (task brief's token
counting): upgrades the regex token-count proxy
(functions/text.token_count_regex) to a REAL learned subword
tokenizer, so token budgets are computed the way a training run will
actually see them.

Split of labor (the repo's established pattern — iForest fit,
Shapiro sample, trigram-LM artifact):

- ``train_bpe``: classic Sennrich-style merge learning on a BOUNDED
  seeded sample collected to the driver. BPE training is inherently
  sequential (merge k depends on merge k-1), and production trainers
  train on samples anyway — the sample cap is the algorithm's own
  design, not a scale compromise. Deterministic: seeded Spark sample
  + lexicographic tie-breaks.
- ``bpe_token_count_udf`` / ``bpe_tokens_udf``: distributed encoding
  via iterator pandas UDFs (Arrow-batched, zero per-row Python UDFs).
  The merge table is a small picklable list shipped in the closure;
  swap in an addFile/SparkFiles artifact (plans/models.py shape) for
  multi-GB vocabularies.
- ``encode_word`` / ``token_count_python``: pure-Python mirror, the
  parity oracle for the UDF path (tests/test_bpe.py).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "train_bpe",
    "encode_word",
    "token_count_python",
    "bpe_token_count_udf",
    "bpe_tokens_udf",
]

_EOW = "</w>"


def _word_freqs_from_sample(texts: list[str]) -> Counter:
    freqs: Counter = Counter()
    for t in texts:
        if t:
            freqs.update(t.lower().split())
    return freqs


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    sample_docs: int = 2000,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a seeded bounded sample.
    Ties break to the lexicographically smallest pair, so the merge
    list is deterministic for a given sample."""
    from data_quality_checker_spark.plans.sampling import (
        stride_sample_column,
    )

    # shared unbiased bounded draw (no head-of-corpus limit() bias —
    # see stride_sample_column)
    texts = stride_sample_column(df, text_col, sample_docs, seed=seed)
    freqs = _word_freqs_from_sample(texts)
    words: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): c for w, c in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break  # nothing left worth merging
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            new = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    new.append(merged)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + c
        words = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (standard BPE
    inference). ``ranks`` maps pair -> merge index."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def token_count_python(
    text: str | None, merges: list[tuple[str, str]]
) -> int:
    """Pure-Python mirror of bpe_token_count_udf."""
    if not text:
        return 0
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    return sum(
        len(encode_word(w, ranks)) for w in text.lower().split()
    )


def bpe_token_count_udf(merges: list[tuple[str, str]]) -> Column:
    """Factory: iterator pandas UDF counting BPE tokens per document.
    The ranks dict is built once per executor task (outside the batch
    loop), not per row."""
    merge_list = [tuple(p) for p in merges]

    @pandas_udf("long")
    def _count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = {p: i for i, p in enumerate(merge_list)}

        def one(t):
            if not isinstance(t, str) or not t:
                return 0
            return sum(
                len(encode_word(w, ranks)) for w in t.lower().split()
            )

        for s in batches:
            yield s.map(one)

    return _count


def bpe_tokens_udf(merges: list[tuple[str, str]]) -> Column:
    """Factory: iterator pandas UDF returning the full subword array
    (debug/inspection path; prefer the count form in pipelines —
    it never materializes the token arrays)."""
    merge_list = [tuple(p) for p in merges]

    @pandas_udf("array<string>")
    def _tokens(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ranks = {p: i for i, p in enumerate(merge_list)}

        def one(t):
            if not isinstance(t, str) or not t:
                return []
            out: list[str] = []
            for w in t.lower().split():
                out.extend(encode_word(w, ranks))
            return out

        for s in batches:
            yield s.map(one)

    return _tokens
