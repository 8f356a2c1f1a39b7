"""Gopher quality signals (Rae et al. 2021, appendix A1.1 — the
published MassiveWeb document filters), as ONE pure-Catalyst
projection. No reference ancestor — training-data-pipeline engine
surface for the webtext tier.

The 12-rule battery (plans/rules.py) already carries the Gopher rules
that overlap the reference's checks (word count bounds, mean word
length, stopword ratio, repetition, dup-line fraction); its rule set
is frozen by the F1==1.0 parity gate. This module adds the REMAINING
published Gopher signals as an optional, composable stage:

- ``gopher_symbol_word_ratio``: (# of ``#`` + ``…`` + ``...``
  occurrences) / word count; bar: > 0.1 fails
- ``gopher_bullet_line_frac``: fraction of lines starting with a
  bullet marker; bar: > 0.9 fails
- ``gopher_ellipsis_line_frac``: fraction of lines ending with an
  ellipsis (``...`` or ``…``); bar: > 0.3 fails
- ``gopher_alpha_word_frac``: fraction of words containing at least
  one alphabetic character; bar: < 0.8 fails
- ``gopher_required_stop_hits``: how many DISTINCT words of the
  paper's required set {the, be, to, of, and, that, have, with}
  appear; bar: < 2 fails

plus ``gopher_keep`` = no bar fired. Thresholds are parameters with
the paper's defaults.

Engine contract (Spark / DuckDB twin / Python mirror): lines per
functions/text.lines (split on ``\\n``, trailing ``[ \\t\\r]``
stripped, empties dropped); words = lowercase whitespace tokens;
patterns RE2-portable (the repo-wide ``\\x0B`` exclusion applies —
see functions/text.py and plans/lineclean.py). Zero shuffle, zero UDF; docs with no words
yield NULL ratio signals and fail the keep bar (word-free pages are
not prose), mirroring the battery's convention for empty docs.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import (
    lines as _lines,
    tokens as _tokens,
)

__all__ = [
    "BULLET_PREFIXES",
    "ELLIPSIS_SUFFIX_RE",
    "REQUIRED_STOPWORDS",
    "gopher_signal_exprs",
    "with_gopher_signals",
    "gopher_signals_py",
]

# bullet markers the paper's filter targets (list-shaped boilerplate)
BULLET_PREFIXES = ("•", "‣", "▶", "●", "- ", "* ")

ELLIPSIS_SUFFIX_RE = r"(\.\.\.|…)$"

# Gopher's "must contain 2 of" stop word set (appendix A1.1)
REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_signal_exprs(
    text: Column | str,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stop_hits: int = 2,
) -> dict[str, Column]:
    """Named signal + flag columns (caller selects;
    :func:`with_gopher_signals` is the DataFrame wrapper)."""
    t = F.col(text) if isinstance(text, str) else text
    tk = _tokens(t)  # lowercase whitespace tokens
    wc = F.size(tk)
    ln = _lines(t)
    n_lines = F.size(ln)

    # '#'  and ellipsis occurrences: '…' counts once, '...' once per
    # non-overlapping run of three dots (regexp_count is left-to-right
    # non-overlapping in all three engines)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = F.regexp_count(t, F.lit(r"(\.\.\.|…)"))
    symbol_ratio = F.when(
        wc > 0, (n_hash + n_ellipsis).cast("double") / wc
    )

    def _starts_bullet(s: Column) -> Column:
        out = F.lit(False)
        for p in BULLET_PREFIXES:
            out = out | s.startswith(p)
        return out

    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(ln, _starts_bullet)).cast("double") / n_lines,
    )
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(ln, lambda s: s.rlike(ELLIPSIS_SUFFIX_RE))
        ).cast("double")
        / n_lines,
    )
    alpha_frac = F.when(
        wc > 0,
        F.size(
            F.filter(tk, lambda w: w.rlike(r"[a-z]"))
        ).cast("double")
        / wc,
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(tk),
            F.array(*[F.lit(w) for w in REQUIRED_STOPWORDS]),
        )
    )
    keep = (
        t.isNotNull()
        & (wc > 0)
        & (symbol_ratio <= F.lit(float(max_symbol_word_ratio)))
        & (F.coalesce(bullet_frac, F.lit(0.0)) <= F.lit(float(max_bullet_line_frac)))
        & (F.coalesce(ellipsis_frac, F.lit(0.0)) <= F.lit(float(max_ellipsis_line_frac)))
        & (alpha_frac >= F.lit(float(min_alpha_word_frac)))
        & (stop_hits >= F.lit(min_required_stop_hits))
    )
    return {
        "gopher_symbol_word_ratio": symbol_ratio,
        "gopher_bullet_line_frac": bullet_frac,
        "gopher_ellipsis_line_frac": ellipsis_frac,
        "gopher_alpha_word_frac": alpha_frac,
        "gopher_required_stop_hits": F.coalesce(stop_hits, F.lit(0)).cast(
            "int"
        ),
        "gopher_keep": F.coalesce(keep, F.lit(False)),
    }


def with_gopher_signals(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """``df`` plus the :func:`gopher_signal_exprs` columns — one
    projection, no shuffle."""
    return df.withColumns(gopher_signal_exprs(text_col, **kw))


_ELLIPSIS_RE_PY = _re.compile(r"(\.\.\.|…)")
_ELLIPSIS_END_PY = _re.compile(ELLIPSIS_SUFFIX_RE)
_ALPHA_PY = _re.compile(r"[a-z]")
# Java \s pinned exactly (ASCII; Python \s would split NBSP and
# diverge from the Catalyst tokens()) — same contract as
# plans/lineclean.py / plans/oracle.py
_WS_RE_PY = _re.compile(r"[ \t\n\x0b\f\r]+")


def gopher_signals_py(
    text: str | None,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stop_hits: int = 2,
) -> dict:
    """Pure-Python mirror of :func:`gopher_signal_exprs`
    (property-test oracle; same line/token contracts)."""
    if text is None:
        return {
            "gopher_symbol_word_ratio": None,
            "gopher_bullet_line_frac": None,
            "gopher_ellipsis_line_frac": None,
            "gopher_alpha_word_frac": None,
            "gopher_required_stop_hits": 0,
            "gopher_keep": False,
        }
    tk = [w for w in _WS_RE_PY.split(text.lower()) if w]
    wc = len(tk)
    ln = [s.rstrip(" \t\r") for s in text.split("\n")]
    ln = [s for s in ln if s != ""]
    n_lines = len(ln)
    n_hash = text.count("#")
    n_ellipsis = len(_ELLIPSIS_RE_PY.findall(text))
    symbol_ratio = (n_hash + n_ellipsis) / wc if wc > 0 else None
    bullet_frac = (
        sum(1 for s in ln if any(s.startswith(p) for p in BULLET_PREFIXES))
        / n_lines
        if n_lines > 0
        else None
    )
    ellipsis_frac = (
        sum(1 for s in ln if _ELLIPSIS_END_PY.search(s)) / n_lines
        if n_lines > 0
        else None
    )
    alpha_frac = (
        sum(1 for w in tk if _ALPHA_PY.search(w)) / wc if wc > 0 else None
    )
    stop_hits = len(set(tk) & set(REQUIRED_STOPWORDS))
    keep = (
        wc > 0
        and symbol_ratio <= max_symbol_word_ratio
        and (bullet_frac or 0.0) <= max_bullet_line_frac
        and (ellipsis_frac or 0.0) <= max_ellipsis_line_frac
        and alpha_frac >= min_alpha_word_frac
        and stop_hits >= min_required_stop_hits
    )
    return {
        "gopher_symbol_word_ratio": symbol_ratio,
        "gopher_bullet_line_frac": bullet_frac,
        "gopher_ellipsis_line_frac": ellipsis_frac,
        "gopher_alpha_word_frac": alpha_frac,
        "gopher_required_stop_hits": stop_hits,
        "gopher_keep": keep,
    }
