"""C4-style line-level page cleaning (Raffel et al. 2020, §2.2 — the
public heuristics behind the C4 corpus), as ONE pure-Catalyst
projection. No reference ancestor — /root/reference validates tabular
columns only; this is training-data-pipeline engine surface for the
webtext tier, complementing the document-level 12-rule battery
(plans/rules.py) with the LINE-level stage that battery cannot
express: C4 edits pages (drops boilerplate lines) before judging them.

Heuristics implemented (each a parameter, defaults = the paper's):

- keep only lines ending in a terminal punctuation mark
  (``. ! ? "`` — the paper's set, plus the typographic ``”``)
- keep only lines with at least ``min_line_words`` words (paper: 3)
- drop any line containing the word "javascript" (case-insensitive)
- drop the whole page when it contains "lorem ipsum" (case-insensitive)
- drop the whole page when it contains a curly brace ``{``
- drop the whole page when the CLEANED text has fewer than
  ``min_sentences`` sentences (paper: 5); sentences are counted as
  terminal-punctuation boundaries — the dependency-free stand-in for
  the paper's sentence tokenizer, same contract in all three engines

Engine contract (Spark / DuckDB twin / Python mirror): lines split on
``\\n`` with trailing ``[ \\t\\r]`` stripped (functions/text.lines);
words split on whitespace runs; patterns in the RE2-portable subset.
The one known class divergence is repo-wide (functions/text.py):
Java/Python ``\\s`` includes ``\\x0B``, RE2's (DuckDB) does not — the
engine corpus contract excludes vertical tabs, so the twins agree on
every oracle-checked corpus.
The Python mirror :func:`c4_clean_py` is property-pinned against the
Catalyst form (tests/test_property_extensions.py pattern).

Scale shape: zero shuffle, zero UDF — array lambda algebra inside one
projection; the corpus never leaves whole-stage codegen except the
CodegenFallback HOF leaves. Line edits are per-document, so the stage
composes with corpus-wide line dedup (operators/dedup.
dedup_lines_corpus) in either order.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import lines as _lines

__all__ = [
    "C4_TERMINAL_RE",
    "SENTENCE_BOUNDARY_RE",
    "c4_clean_exprs",
    "with_c4_clean",
    "c4_clean_py",
]

# line ends in a terminal punctuation mark; lines() already strips
# trailing [ \t\r], so $ anchors at the last visible character
C4_TERMINAL_RE = r'[.!?"”]$'

# sentence boundary: terminal punct, optional closing quote, then
# whitespace or end — the cross-engine sentence-count proxy
SENTENCE_BOUNDARY_RE = r'[.!?]["”]?(\s|$)'


def c4_clean_exprs(
    text: Column | str,
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> dict[str, Column]:
    """Named columns for the C4 cleaning stage (caller selects them;
    :func:`with_c4_clean` is the DataFrame wrapper):

    - ``c4_n_lines`` / ``c4_n_lines_kept``: line counts before/after
    - ``text_c4``: kept lines joined by ``\\n`` (NULL when the input
      text is NULL)
    - ``c4_lorem_ipsum`` / ``c4_curly_brace`` /
      ``c4_too_few_sentences``: page-level violation flags
    - ``c4_keep``: no page-level flag fired (line edits alone never
      drop a page — matching the paper, where a page survives line
      filtering unless a page-level rule fires)
    """
    t = F.col(text) if isinstance(text, str) else text
    ln = _lines(t)

    def _keep(s: Column) -> Column:
        # drop empty split tokens (leading whitespace yields one) —
        # the same tokenization contract as functions/text.tokens;
        # F.trim strips spaces ONLY, so a tab-leading line would
        # otherwise count a phantom word (review finding)
        words = F.size(
            F.filter(F.split(s, r"\s+"), lambda w: w != F.lit(""))
        )
        return (
            s.rlike(C4_TERMINAL_RE)
            & (words >= F.lit(min_line_words))
            & ~F.lower(s).contains("javascript")
        )

    kept = F.filter(ln, _keep)
    text_c4 = F.when(t.isNotNull(), F.array_join(kept, "\n"))
    low = F.lower(t)
    lorem = F.coalesce(low.contains("lorem ipsum"), F.lit(False))
    curly = F.coalesce(t.contains("{"), F.lit(False))
    n_sentences = F.coalesce(
        F.regexp_count(text_c4, F.lit(SENTENCE_BOUNDARY_RE)), F.lit(0)
    )
    too_few = t.isNull() | (n_sentences < F.lit(min_sentences))
    return {
        "c4_n_lines": F.coalesce(F.size(ln), F.lit(0)).cast("int"),
        "c4_n_lines_kept": F.coalesce(F.size(kept), F.lit(0)).cast("int"),
        "text_c4": text_c4,
        "c4_lorem_ipsum": lorem,
        "c4_curly_brace": curly,
        "c4_too_few_sentences": too_few,
        "c4_keep": ~(lorem | curly | too_few),
    }


def with_c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """``df`` plus the :func:`c4_clean_exprs` columns — one projection,
    no shuffle."""
    exprs = c4_clean_exprs(text_col, min_line_words, min_sentences)
    return df.withColumns(exprs)


# the Python mirror pins Java's \s class EXACTLY ([ \t\n\x0B\f\r] —
# ASCII only; Python \s would also match NBSP etc. and diverge on
# real webtext), same contract as plans/oracle.py / plans/lm.py
_WS_PY = r"[ \t\n\x0b\f\r]"
_SENT_RE_PY = _re.compile(r'[.!?]["”]?(?:' + _WS_PY + r"|$)")
_TERM_RE_PY = _re.compile(C4_TERMINAL_RE)


def c4_clean_py(
    text: str | None,
    min_line_words: int = 3,
    min_sentences: int = 5,
) -> dict:
    """Pure-Python mirror of :func:`c4_clean_exprs` (property-test
    oracle; same line/word/sentence contracts)."""
    if text is None:
        return {
            "c4_n_lines": 0,
            "c4_n_lines_kept": 0,
            "text_c4": None,
            "c4_lorem_ipsum": False,
            "c4_curly_brace": False,
            "c4_too_few_sentences": True,
            "c4_keep": False,
        }
    ln = [
        s.rstrip(" \t\r") for s in text.split("\n")
    ]
    ln = [s for s in ln if s != ""]
    kept = [
        s
        for s in ln
        if _TERM_RE_PY.search(s)
        and len([w for w in _re.split(_WS_PY + "+", s) if w])
        >= min_line_words
        and "javascript" not in s.lower()
    ]
    text_c4 = "\n".join(kept)
    low = text.lower()
    lorem = "lorem ipsum" in low
    curly = "{" in text
    n_sentences = len(_SENT_RE_PY.findall(text_c4))
    too_few = n_sentences < min_sentences
    return {
        "c4_n_lines": len(ln),
        "c4_n_lines_kept": len(kept),
        "text_c4": text_c4,
        "c4_lorem_ipsum": lorem,
        "c4_curly_brace": curly,
        "c4_too_few_sentences": too_few,
        "c4_keep": not (lorem or curly or too_few),
    }
