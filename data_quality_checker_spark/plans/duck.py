"""DuckDB oracle-SQL generators.

The driver cross-checks every `__spark_entry__.queries()` entry against
ANSI SQL run by DuckDB on the same parquet. These helpers generate the
DuckDB side of the text expressions from the SAME wordlists/thresholds
the Catalyst side uses, so the two can only drift if semantics truly
differ (which is the point of the check).

Portability contract (kept in sync with functions/text.py):
 - tokens: lower, split on \\s+ runs, drop empties
 - symbol class: [\\p{L}\\p{N}\\s] identical in Java regex and RE2
 - langid tie-break: LANGS order
"""

from __future__ import annotations

from data_quality_checker_spark.functions.wordlists import (
    LANGS,
    STOPWORDS,
    TOXIC_WORDS,
)
from data_quality_checker_spark.plans.rules import RuleConfig


def sql_list(words: tuple[str, ...]) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"[{inner}]"


def toks(col: str = "text") -> str:
    return (
        f"list_filter(string_split_regex(lower({col}), '\\s+'), "
        "t -> t <> '')"
    )


def wc(col: str = "text") -> str:
    return f"len({toks(col)})"


def stop_count(col: str, words: tuple[str, ...]) -> str:
    return (
        f"len(list_filter({toks(col)}, t -> "
        f"list_contains({sql_list(words)}, t)))"
    )


def stop_ratio(col: str, words: tuple[str, ...]) -> str:
    return (
        f"case when {wc(col)} > 0 then "
        f"{stop_count(col, words)}::double / {wc(col)} end"
    )


def symbol_ratio(col: str = "text") -> str:
    return (
        f"case when length({col}) > 0 then "
        f"length(regexp_replace({col}, '[\\p{{L}}\\p{{N}}\\s]', '', 'g'))"
        f"::double / length({col}) end"
    )


def mean_word_length(col: str = "text") -> str:
    t = toks(col)
    return (
        f"case when len({t}) > 0 then "
        f"list_sum(list_transform({t}, t -> length(t)))::double "
        f"/ len({t}) end"
    )


def diversity(col: str = "text") -> str:
    t = toks(col)
    return (
        f"case when len({t}) > 0 then "
        f"len(list_distinct({t}))::double / len({t}) end"
    )


def lines(col: str = "text") -> str:
    return (
        f"list_filter(list_transform(string_split({col}, chr(10)), "
        "s -> rtrim(s, ' ' || chr(9) || chr(13))), s -> s <> '')"
    )


def dup_line_fraction(col: str = "text") -> str:
    ln = lines(col)
    return (
        f"case when len({ln}) > 0 then "
        f"(len({ln}) - len(list_distinct({ln})))::double / len({ln}) end"
    )


def lang_scores(col: str = "text") -> dict[str, str]:
    return {
        lang: stop_count(col, STOPWORDS[lang]) for lang in LANGS
    }


def langid_best(col: str = "text") -> str:
    """Argmax with LANGS-order tie-break, vs precomputed score columns
    named s_<lang> (emit via lang_scores in a CTE first)."""
    all_scores = ", ".join(f"s_{lang}" for lang in LANGS)
    branches = []
    for lang in LANGS:
        branches.append(
            f"when s_{lang} > 0 and s_{lang} >= greatest({all_scores}) "
            f"then '{lang}'"
        )
    return "case " + " ".join(branches) + " else 'und' end"


def rule_flags_sql(cfg: RuleConfig | None = None, col: str = "text") -> dict[str, str]:
    """DuckDB boolean expressions for every rule in plans/rules.py, same
    names and thresholds. `lang` expects a lang_detected column (emit
    langid via lang_scores + langid_best first)."""
    cfg = cfg or RuleConfig()
    t = toks(col)
    w = wc(col)
    allowed = ", ".join(f"'{lang}'" for lang in cfg.allowed_langs)
    return {
        # explicit Java-\s charset: bare trim strips spaces only, and a
        # '\n'/'\r'/'\t'-only doc must count as empty in all 3 engines
        "empty": (
            f"({col} is null or trim({col}, ' ' || chr(9) || chr(10) || "
            f"chr(11) || chr(12) || chr(13)) = '')"
        ),
        "too_short": f"({col} is not null and length({col}) < {cfg.min_chars})",
        "too_long": f"({col} is not null and length({col}) > {cfg.max_chars})",
        "too_few_words": (
            f"({col} is not null and {w} > 0 and {w} < {cfg.min_words})"
        ),
        "too_many_words": f"({col} is not null and {w} > {cfg.max_words})",
        "mean_word_len": (
            f"({col} is not null and coalesce("
            f"{mean_word_length(col)} < {cfg.min_mean_word_len} or "
            f"{mean_word_length(col)} > {cfg.max_mean_word_len}, false))"
        ),
        "low_stopword": (
            f"({col} is not null and coalesce("
            f"{stop_ratio(col, cfg.stopwords)} < {cfg.min_stopword_ratio},"
            " false))"
        ),
        "high_symbol": (
            f"({col} is not null and coalesce("
            f"{symbol_ratio(col)} > {cfg.max_symbol_ratio}, false))"
        ),
        "high_repetition": (
            f"({col} is not null and coalesce("
            f"1 - {diversity(col)} > {cfg.max_repetition}, false))"
        ),
        "dup_lines": (
            f"({col} is not null and coalesce("
            f"{dup_line_fraction(col)} > {cfg.max_dup_line_fraction},"
            " false))"
        ),
        "lang": f"({col} is not null and lang_detected not in ({allowed}))",
        "toxicity": (
            f"({col} is not null and len(list_intersect({t}, "
            f"{sql_list(cfg.toxic_words)})) > 0)"
        ),
    }


def scrub_sql(col: str = "text", patterns=None) -> str:
    """DuckDB twin of plans/scrub.scrub_expr (RE2 'g' flag = replace
    all, matching Spark regexp_replace semantics). ``patterns``
    defaults to the base SCRUB_PATTERNS; pass
    SCRUB_PATTERNS_EXTENDED for the opt-in extended chain."""
    from data_quality_checker_spark.plans.scrub import SCRUB_PATTERNS

    expr = col
    for _, pat, repl in patterns or SCRUB_PATTERNS:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    return expr


def luhn_count_sql(col: str = "text") -> str:
    """DuckDB twin of plans/scrub.luhn_valid_count: candidates via
    regexp_extract_all on CCN_PATTERN, separator-stripped digit string
    folded through the Luhn checksum with nested list lambdas."""
    from data_quality_checker_spark.plans.scrub import CCN_PATTERN

    d = f"regexp_replace(s, '[- ]', '', 'g')"
    dig = f"cast(substr({d}, len({d}) - i + 1, 1) as int)"
    term = (
        f"case when i % 2 = 0 then "
        f"case when {dig} * 2 > 9 then {dig} * 2 - 9 "
        f"else {dig} * 2 end else {dig} end"
    )
    return (
        f"len(list_filter(regexp_extract_all({col}, '{CCN_PATTERN}'), "
        f"s -> list_sum(list_transform("
        f"generate_series(1, len({d})), i -> {term})) % 10 = 0))"
    )


def pos_case(tok: str = "token") -> str:
    """CASE classifying a token into the heuristic POS classes —
    generated from the SAME constants operators/entities.py compiles
    into the Catalyst expression, in the same evaluation order."""
    from data_quality_checker_spark.operators.entities import (
        POS_SUFFIX_RULES,
        POS_WORD_CLASSES,
    )

    parts = ["case"]
    for tag, words in POS_WORD_CLASSES.items():
        parts.append(
            f"when list_contains({sql_list(words)}, lower({tok})) "
            f"then '{tag}'"
        )
    parts.append(
        f"when regexp_matches({tok}, '^[0-9]+([.,][0-9]+)?$') then 'NUM'"
    )
    parts.append(f"when regexp_matches({tok}, '^[A-Z]') then 'PROPN'")
    for tag, pat in POS_SUFFIX_RULES:
        parts.append(
            f"when regexp_matches(lower({tok}), '{pat}') then '{tag}'"
        )
    parts.append("else 'NOUN' end")
    return " ".join(parts)
