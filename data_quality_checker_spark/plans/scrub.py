"""PII scrub: ordered regexp_replace chain (emails -> phones -> IPs).

Patterns restrict to the character-class subset whose semantics are
identical in Java regex (Spark), Python `re` (the oracle) and RE2
(DuckDB) — SURVEY.md §7 hard part (a): byte-identical scrubbed text
across engines, pinned by tests/test_pipeline.py sha256 goldens.

Email pattern derives from the reference's validator regex
(dq_checker.py:132), unanchored for in-text scrubbing.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: emails contain dots/digits that the IP pattern could
# otherwise clip; scrub most-specific first.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}",
        "<PHONE>",
    ),
    (
        "ip",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
)


def scrub_expr(text_col: str = "text") -> Column:
    """Scrubbed text as a single chained Catalyst expression."""
    c: Column = F.col(text_col)
    for _, pat, repl in SCRUB_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_count_exprs(text_col: str = "text") -> dict[str, Column]:
    """Per-PII-kind match counts (for the metrics table). Counted on
    the progressively-scrubbed text so the counts compose with the
    replacement order."""
    out: dict[str, Column] = {}
    c: Column = F.col(text_col)
    for name, pat, repl in SCRUB_PATTERNS:
        # regexp_count: same value as size(regexp_extract_all) without
        # materializing the match array (allocation-free codegen scan)
        out[name] = F.when(c.isNull(), F.lit(0)).otherwise(
            F.regexp_count(c, F.lit(pat))
        )
        c = F.regexp_replace(c, pat, repl)
    return out


def scrub_python(text: str | None) -> str | None:
    """The oracle-side scrub — byte-identical contract with scrub_expr."""
    if text is None:
        return None
    for _, pat, repl in SCRUB_PATTERNS:
        text = re.sub(pat, repl, text)
    return text


def with_scrub(df, text_col: str = "text"):
    """Staged scrub: each intermediate replacement is a materialized,
    multi-referenced column (CollapseProject keeps it), so the chain
    runs each regexp_replace exactly once and the per-kind counts read
    the staged text instead of rebuilding the chain (3 fewer full-doc
    regex passes than independent scrub_expr + scrub_count_exprs).
    Adds scrub_<kind> counts + scrubbed_text."""
    from pyspark.sql import functions as F

    cur = F.col(text_col)
    out = df
    stage_names = []
    for i, (name, pat, repl) in enumerate(SCRUB_PATTERNS):
        out = out.withColumn(
            f"scrub_{name}",
            F.when(cur.isNull(), F.lit(0)).otherwise(
                F.regexp_count(cur, F.lit(pat))
            ),
        )
        stage = (
            "scrubbed_text"
            if i == len(SCRUB_PATTERNS) - 1
            else f"_scrub{i}"
        )
        out = out.withColumn(stage, F.regexp_replace(cur, pat, repl))
        if stage != "scrubbed_text":
            stage_names.append(stage)
        cur = F.col(stage)
    return out.drop(*stage_names)
