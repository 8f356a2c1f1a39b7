"""Pure-Python per-document oracle for the rule battery + scrub.

This is the "reference labels" generator (BASELINE.md: keep/drop F1 >=
0.99 vs reference labels; golden scrubbed text byte-identical per url).
Every rule here is a ~5-line plain-Python twin of the Catalyst
expression in plans/rules.py; tests assert row-for-row agreement
(SURVEY.md §5.2 item 3) so the Spark plan's semantics are pinned
independently of Spark itself.
"""

from __future__ import annotations

import re
import unicodedata

from data_quality_checker_spark.functions.wordlists import LANGS, STOPWORDS
from data_quality_checker_spark.plans.rules import RuleConfig
from data_quality_checker_spark.plans.scrub import scrub_python

# Pin the ENGINE contract, not Python's Unicode defaults: Java regex \s
# is exactly [ \t\n\x0B\f\r] (what the Catalyst side splits on), so the
# oracle uses that literal class — Python \s would also match NBSP etc.
# and silently diverge on non-ASCII whitespace.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_JAVA_WS = " \t\n\x0b\f\r"


def _tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text.lower()) if t]


def _lines(text: str) -> list[str]:
    # matches Spark regexp_replace(s, '[ \t\r]+$', '') and the DuckDB
    # rtrim(s, ' '||\t||\r) — NOT bare rstrip(), which strips \f/\v too
    return [
        ln.rstrip(" \t\r")
        for ln in text.split("\n")
        if ln.rstrip(" \t\r") != ""
    ]


def _symbol_ratio(text: str) -> float | None:
    """Fraction of chars outside [\\p{L}\\p{N}\\s] — Java semantics:
    L*/N* are Unicode general categories, \\s is the ASCII class.
    (ch.isdigit()/isspace() would disagree on ², NBSP, …)."""
    if not text:
        return None
    syms = sum(
        1
        for ch in text
        if unicodedata.category(ch)[0] not in ("L", "N")
        and ch not in _JAVA_WS
    )
    return syms / len(text)


def detect_lang(text: str) -> str:
    # shared scorer (plans/udfs.py) — two copies of a tie-break-
    # sensitive loop would drift, and the shared form hoists the
    # per-language stopword sets out of the token loop. Tokenization
    # stays THIS module's Java-\s class (Python's \s is unicode-wider).
    from data_quality_checker_spark.plans.udfs import detect_lang_python

    return detect_lang_python(text, toks=_tokens(text))


def fired_rules(text: str | None, cfg: RuleConfig) -> list[str]:
    """Rule names violated by this document, in plans/rules.py order."""
    fired: list[str] = []
    if text is None or text.strip(_JAVA_WS) == "":
        fired.append("empty")
    if text is None:
        return fired
    toks = _tokens(text)
    wc = len(toks)
    if len(text) < cfg.min_chars:
        fired.append("too_short")
    if len(text) > cfg.max_chars:
        fired.append("too_long")
    if 0 < wc < cfg.min_words:
        fired.append("too_few_words")
    if wc > cfg.max_words:
        fired.append("too_many_words")
    if wc:
        mwl = sum(len(t) for t in toks) / wc
        if mwl < cfg.min_mean_word_len or mwl > cfg.max_mean_word_len:
            fired.append("mean_word_len")
        sw = set(cfg.stopwords)
        if sum(1 for t in toks if t in sw) / wc < cfg.min_stopword_ratio:
            fired.append("low_stopword")
    sr = _symbol_ratio(text)
    if sr is not None and sr > cfg.max_symbol_ratio:
        fired.append("high_symbol")
    if wc and 1 - len(set(toks)) / wc > cfg.max_repetition:
        fired.append("high_repetition")
    lines = _lines(text)
    if lines and 1 - len(set(lines)) / len(lines) > cfg.max_dup_line_fraction:
        fired.append("dup_lines")
    if detect_lang(text) not in cfg.allowed_langs:
        fired.append("lang")
    if set(toks) & set(cfg.toxic_words):
        fired.append("toxicity")
    return fired


def label_page(text: str | None, cfg: RuleConfig | None = None) -> dict:
    """Golden label for one page: keep verdict + fired rules + scrub."""
    cfg = cfg or RuleConfig()
    fired = fired_rules(text, cfg)
    return {
        "keep": not fired,
        "fired_rules": fired,
        "scrubbed": scrub_python(text),
    }
