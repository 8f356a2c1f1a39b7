"""HTML -> text extraction as a pure Catalyst regexp chain.

The input table (input_hint: url, warc_ts, html BINARY, text, lang)
carries the raw page bytes; this stage derives the text column FROM
the html so the pipeline can run on corpora that ship only the markup.
The reference library has no extraction (it consumes ready text
columns) — this is engine surface for the Common-Crawl-style input,
kept dependency-free (no bs4/lxml in this environment) and fully
JVM-side: decode -> drop non-content blocks -> strip tags -> decode
the core entities. Byte-identity with a ready-made text column is
pinned by tests over the synthetic corpus (plans/synth.py wraps text
in markup); real-world html needs `sep=" "` + whitespace
normalization, at the cost of that identity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_text_expr", "with_extracted_text"]

# non-content blocks removed wholesale (case-insensitive, dot-all)
_BLOCK_PATTERNS = (
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<head\b[^>]*>.*?</head\s*>",
    r"(?s)<!--.*?-->",
)

# minimal entity set, decoded in this order (&amp; LAST so already-
# decoded ampersands are not re-expanded)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text_expr(
    html: Column | str,
    sep: str = "",
    normalize_whitespace: bool = False,
) -> Column:
    """Text extracted from an html BINARY/STRING column.

    ``sep`` replaces each tag ("" keeps byte-identity when the markup
    merely wraps the text; " " is the right choice for real pages so
    `</p><p>` does not merge words). ``normalize_whitespace`` collapses
    whitespace runs and trims — pair it with sep=" "."""
    c = F.col(html) if isinstance(html, str) else html
    # cast-then-cast accepts both BINARY and STRING inputs (a string
    # casts to its UTF-8 bytes, so the round-trip is the identity).
    # binary->string CAST decodes leniently (malformed bytes become
    # replacement chars), where F.decode under ANSI throws
    # MALFORMED_CHARACTER_CODING — one bad crawl page must not abort
    # the extraction job (review finding, reproduced live)
    s = c.cast("binary").cast("string")
    for pat in _BLOCK_PATTERNS:
        s = F.regexp_replace(s, pat, "")
    s = F.regexp_replace(s, r"<[^>]*>", sep)
    for ent, rep in _ENTITIES:
        s = F.regexp_replace(s, ent, rep)
    if normalize_whitespace:
        s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return s


def with_extracted_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    sep: str = "",
    normalize_whitespace: bool = False,
) -> DataFrame:
    """Adds/overwrites ``out_col`` with the text extracted from
    ``html_col`` — the upstream stage for corpora shipping markup only;
    everything downstream (rules, scrub, verdict) is unchanged.

    A page whose markup carries NO text content yields NULL (nullif on
    the empty string), matching the ready-text pipeline's semantics:
    such a page fires only the `empty` rule, not `empty` + `too_short`
    (an '' placeholder shifted per-rule drop counts between the two
    ingestion paths — review finding)."""
    return df.withColumn(
        out_col,
        F.nullif(
            extract_text_expr(html_col, sep, normalize_whitespace),
            F.lit(""),
        ),
    )
