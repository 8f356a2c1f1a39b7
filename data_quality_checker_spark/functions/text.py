"""Text-statistics column expressions (pure Catalyst, codegen-friendly).

Re-expresses the reference's per-row pandas NLP loops as declarative
``Column`` builders so Tungsten executes them JVM-side in one projection:

 - lexical diversity / repetition: nlp_analyzer.py:852-885
 - stopword counting:              nlp_analyzer.py:927-929
 - word/char/line length stats:    nlp_analyzer.py:99-173, 124-149
 - text length rule:               nlp_analyzer.py:87-88
 - language detection (heuristic): nlp_analyzer.py:887-900
   (the model-backed variant lives in plans/udfs.py as an iterator
   pandas_udf — same output contract)

Tokenization contract (shared with the Python oracle and DuckDB oracle
SQL): lowercase, split on runs of whitespace, drop empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.litfast import lit_str_array
from data_quality_checker_spark.functions.wordlists import LANGS, STOPWORDS

__all__ = [
    "bind_once",
    "tokens",
    "word_count",
    "char_count",
    "lexical_diversity",
    "repetition_ratio",
    "stopword_count",
    "stopword_ratio",
    "symbol_ratio",
    "mean_word_length",
    "lines",
    "line_count",
    "mean_line_length",
    "dup_line_fraction",
    "token_count_regex",
    "langid_scores",
    "langid_best",
    "doc_fingerprint",
    "word_ngrams",
    "normalize_punctuation",
    "normalize_punctuation_python",
]

# ASCII whitespace run. Java \s == [ \t\n\x0B\f\r]; the Python oracle
# pins that exact class; RE2 (DuckDB) \s == [ \t\n\f\r] — the single
# divergence is \x0B (vertical tab), which the engine contract excludes
# from input (no oracle-checked corpus contains it).
_WS = r"\s+"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bind_once(value: Column, build) -> Column:
    """Evaluate ``value`` exactly once per row and hand it to
    ``build`` as a higher-order-function lambda VARIABLE
    (``element_at(transform(array(value), v -> build(v)), 1)``).

    Catalyst has no let-binding: when a lambda body references a
    computed expression (directly, or through a projected alias that
    CollapseProject folds back in), the expression re-evaluates on
    EVERY lambda invocation — per-element work times the element
    count, O(n^2) for tokenize-then-slide shapes. The HOF variable is
    a true binding the optimizer cannot inline through. Same pattern
    as plans/urlfilter.registrable_domain (9x) and the MinHash
    shingler (un-wedged a 1M-doc run)."""
    return F.element_at(F.transform(F.array(value), build), 1)


def tokens(text: Column | str, lowercase: bool = True) -> Column:
    """array<string> of non-empty whitespace-delimited tokens."""
    c = _col(text)
    if lowercase:
        c = F.lower(c)
    return F.filter(F.split(c, _WS), lambda t: t != F.lit(""))


def word_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    return F.length(_col(text))


def lexical_diversity(text: Column | str) -> Column:
    """unique tokens / total tokens (nlp_analyzer.py:852-885); NULL if empty."""
    t = tokens(text)
    return F.when(
        F.size(t) > 0,
        F.size(F.array_distinct(t)).cast("double") / F.size(t),
    )


def repetition_ratio(text: Column | str) -> Column:
    """1 - lexical_diversity — the Gopher-style repetition signal."""
    return F.lit(1.0) - lexical_diversity(text)


def stopword_count(
    text: Column | str, words: tuple[str, ...] | None = None
) -> Column:
    """Number of tokens that are stopwords (counts duplicates, unlike
    array_intersect which would dedup — matches nlp_analyzer.py:927-929)."""
    wl = lit_str_array(words or STOPWORDS["en"])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(wl, t)))


def stopword_ratio(
    text: Column | str, words: tuple[str, ...] | None = None
) -> Column:
    wc = word_count(text)
    return F.when(wc > 0, stopword_count(text, words).cast("double") / wc)


def symbol_ratio(text: Column | str) -> Column:
    """Fraction of characters that are neither letter/digit/whitespace —
    the C4/Gopher symbol-to-word signal (generalizes the encoding check
    dq_checker.py:543-557). NULL on empty text."""
    c = _col(text)
    n = F.length(c)
    syms = F.length(F.regexp_replace(c, r"[\p{L}\p{N}\s]", ""))
    return F.when(n > 0, syms.cast("double") / n)


def mean_word_length(text: Column | str) -> Column:
    """Mean token length (nlp_analyzer.py:99-122); NULL if no tokens."""
    t = tokens(text)
    total = F.aggregate(
        F.transform(t, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return F.when(F.size(t) > 0, total.cast("double") / F.size(t))


def lines(text: Column | str) -> Column:
    """Non-empty lines: split on \\n, strip trailing [space, tab, \\r].
    regexp_replace (not rtrim, which strips only ' ') so CRLF and
    tab-trailing corpora agree with the Python oracle (rstrip(' \\t\\r'))
    and the DuckDB twin (rtrim(s, ' '||\\t||\\r))."""
    # char-set rtrim (TRIM(TRAILING ' \t\r')) instead of a per-line
    # regexp_replace: same value (rstrip of the 3-char set; parity
    # verified over the 800k corpus + property tests), no regex
    # engine per line (round-7: 0.89 s -> 0.69 s per 800k docs)
    return F.filter(
        F.transform(
            F.split(_col(text), r"\n"),
            lambda s: F.call_function("rtrim", F.lit(" \t\r"), s),
        ),
        lambda s: s != F.lit(""),
    )


def line_count(text: Column | str) -> Column:
    return F.size(lines(text))


def mean_line_length(text: Column | str) -> Column:
    ln = lines(text)
    total = F.aggregate(
        F.transform(ln, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return F.when(F.size(ln) > 0, total.cast("double") / F.size(ln))


def dup_line_fraction(text: Column | str) -> Column:
    """Fraction of lines that are duplicates of an earlier line —
    Gopher dup-line signal (generalizes detect_duplicates_in_subset,
    dq_checker.py:985-998, applied within a document)."""
    ln = lines(text)
    return F.when(
        F.size(ln) > 0,
        (F.size(ln) - F.size(F.array_distinct(ln))).cast("double") / F.size(ln),
    )


def token_count_regex(text: Column | str) -> Column:
    """BPE-ish token count: split on whitespace *and* punctuation
    boundaries, so "don't stop." counts 4 sub-word units. Pure regex —
    a cheap, deterministic proxy for tokenizer-based counting."""
    c = F.lower(_col(text))
    return F.size(
        F.filter(F.split(c, r"[\s\p{Punct}]+"), lambda t: t != F.lit(""))
    )


def langid_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword hit counts — the heuristic language-ID."""
    t = tokens(text)
    out: dict[str, Column] = {}
    for lang in LANGS:
        wl = lit_str_array(STOPWORDS[lang])
        out[lang] = F.size(F.filter(t, lambda tok: F.array_contains(wl, tok)))
    return out


def langid_best(text: Column | str) -> Column:
    """Argmax language with deterministic tie-break (LANGS order);
    'und' when no stopword of any language is present."""
    scores = langid_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(LANGS):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic rolling polynomial hash over characters
    (acc*31 + codepoint, mod 2^31-1) — a portable document fingerprint
    reproducible in any engine without xxhash/md5 parity concerns."""
    c = _col(text)
    codes = F.transform(F.split(c, ""), F.ascii)
    return F.when(
        F.length(c) > 0,
        F.aggregate(
            codes,
            F.lit(0).cast("long"),
            lambda a, x: F.pmod(a * 31 + x, F.lit(2147483647).cast("long")),
        ),
    ).otherwise(F.lit(0).cast("long"))


def word_ngrams(tok: Column, n: int, sep: str = " ") -> Column:
    """array<string> of word n-grams from a token array (empty when
    fewer than n tokens) — ancestor: nlp_analyzer.py:175-196.

    The token argument is BOUND ONCE as a higher-order-function
    lambda variable before the per-index slice lambda references it.
    Without the binding, a caller passing a computed expression
    (``word_ngrams(tokens(text), 3)`` — or a projected alias of it,
    which the optimizer collapses right back) gets that expression
    re-evaluated on EVERY lambda invocation: O(n_tokens^2)
    tokenizations per document, which wedged a 1M-doc dedup run once
    the corpus carried 5,200-word docs. The binding pins one
    evaluation per row under any plan rewrite."""

    def _bound(tk: Column) -> Column:
        return F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - n),
                lambda i: F.concat_ws(sep, F.slice(tk, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind_once(tok, _bound)


# 1:1 unicode punctuation folding (curly quotes, dashes, NBSP) — the
# ftfy-lite cleanup web text needs before tokenization; kept to a
# translate map + one ellipsis replace so Spark / DuckDB / Python all
# reproduce it byte-for-byte (translate is 1:1 in all three).
PUNCT_FROM = "‘’‚“”„–—− ´"
PUNCT_TO = "''," + '"""' + "---" + " '"
ELLIPSIS = "…"


def normalize_punctuation(text: Column | str) -> Column:
    """Fold typographic punctuation to ASCII: curly single/double
    quotes -> '/" , en/em dash and minus -> -, NBSP -> space,
    acute accent -> ', ellipsis -> three dots. NULL passes through.
    Pure Catalyst (translate + one literal replace), zero regex."""
    c = _col(text)
    return F.replace(
        F.translate(c, PUNCT_FROM, PUNCT_TO),
        F.lit(ELLIPSIS),
        F.lit("..."),
    )


def normalize_punctuation_python(text: str | None) -> str | None:
    """Oracle mirror of normalize_punctuation."""
    if text is None:
        return None
    return text.translate(
        str.maketrans(PUNCT_FROM, PUNCT_TO)
    ).replace(ELLIPSIS, "...")
