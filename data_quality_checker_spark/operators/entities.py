"""Heuristic named-entity and part-of-speech analysis — the Spark-first
reframing of the reference's spaCy-backed methods, which this engine
cannot (and by design does not) ship a model for:

 - named_entity_analysis (nlp_analyzer.py:217-284): spaCy/NLTK NER per
   row, optionally aggregated to entity frequencies.
 - _named_entity_consistency (nlp_analyzer.py:902-925): entities whose
   surface forms collide case-insensitively.
 - _pos_distribution (nlp_analyzer.py:819-850): corpus-wide POS tag
   counts.

The reframe is an honest HEURISTIC, documented as such: entity
candidates are orthographic (TitleCase runs of >= 2 words, or ALL-CAPS
acronym tokens) extracted with one codegen'd ``regexp_extract_all`` —
no Python in the hot path, no model artifact; POS classes come from a
closed function-word list plus suffix rules, evaluated as one CASE
expression over the exploded token stream. Both are exactly
SQL-expressible, so unlike a model they carry DuckDB oracle twins.
Precision is below a trained tagger's by construction; the value at
crawl scale is a cheap, fully-distributed first pass. The MODEL-GRADE
path exists too: plans/postagger.py trains an averaged-perceptron
tagger (addFile artifact, iterator-UDF scoring, dictionary-routed
closed classes so it agrees with this module exactly on them) and
ships model variants pos_distribution_model / entity_candidates_model
with the same output contracts as the functions below.

All patterns restrict to the RE2-compatible subset (no lookaround, no
backreferences) so the DuckDB twins run the same regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ENTITY_PATTERN",
    "POS_SUFFIX_RULES",
    "POS_WORD_CLASSES",
    "entity_candidates",
    "entity_frequencies",
    "entity_consistency",
    "pos_distribution",
]

# Run of >=2 capitalized words ("New York City", "ACME CORP" — each
# word starts uppercase, rest any case, so casing VARIANTS of the same
# entity are all captured and entity_consistency can collide them) OR
# a lone ALL-CAPS acronym of >=2 letters ("NASA"). Single TitleCase
# words are deliberately NOT candidates: sentence-initial
# capitalization would swamp the signal. Leftmost-first alternation
# (identical in Java regex and RE2 default mode): a capitalized run
# wins over its acronym sub-tokens.
ENTITY_PATTERN = r"[A-Z][A-Za-z]+(?: [A-Z][A-Za-z]+)+|\b[A-Z]{2,}\b"

# Closed word classes (function words) — checked before suffix rules.
POS_WORD_CLASSES: dict[str, tuple[str, ...]] = {
    "DET": ("the", "a", "an", "this", "that", "these", "those", "every",
            "each", "some", "any", "no"),
    "PRON": ("i", "you", "he", "she", "it", "we", "they", "me", "him",
             "her", "us", "them", "his", "their", "its", "my", "your",
             "our", "who", "which", "what"),
    "ADP": ("in", "on", "at", "by", "for", "with", "from", "to", "of",
            "over", "under", "between", "through", "into", "during",
            "before", "after", "above", "below", "across"),
    "CCONJ": ("and", "or", "but", "nor", "so", "yet"),
    "AUX": ("is", "are", "was", "were", "be", "been", "being", "am",
            "do", "does", "did", "have", "has", "had", "will", "would",
            "can", "could", "shall", "should", "may", "might", "must"),
}

# Suffix heuristics, applied in order after the closed classes.
POS_SUFFIX_RULES: tuple[tuple[str, str], ...] = (
    ("ADV", r"[a-z]{2,}ly$"),
    ("VERB", r"[a-z]{2,}(ing|ed|ize|ise|ify)$"),
    ("ADJ", r"[a-z]{2,}(ous|ful|ive|able|ible|ish|al|ic)$"),
)


def entity_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, entity) — one row per orthographic entity mention, the
    per-row branch of named_entity_analysis (nlp_analyzer.py:217-284,
    return_frequency=False). One projection + explode; no shuffle."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(ENTITY_PATTERN), F.lit(0)
                )
            ).alias("entity"),
        )
    )


def entity_frequencies(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(entity, n_mentions, n_docs) — the return_frequency=True branch
    (nlp_analyzer.py:242, Counter over every mention). One hash
    aggregate over the exploded mentions; map-side combined."""
    return (
        entity_candidates(df, id_col, text_col)
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("id").alias("n_docs"),
        )
        .filter(F.col("n_mentions") >= min_count)
    )


def entity_consistency(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Entities whose mentions collide case-insensitively — the intent
    of _named_entity_consistency (nlp_analyzer.py:902-925: dict keyed
    by ent.text.lower(), kept when >1 surface form). Returns
    (entity_norm, n_variants, variants) with variants '|'-joined in
    sorted order so the row is deterministic and hash-comparable."""
    return (
        entity_candidates(df, id_col, text_col)
        .groupBy(F.lower("entity").alias("entity_norm"))
        .agg(F.array_sort(F.collect_set("entity")).alias("_v"))
        .filter(F.size("_v") > 1)
        .select(
            "entity_norm",
            F.size("_v").alias("n_variants"),
            F.array_join("_v", "|").alias("variants"),
        )
    )


def pos_tag_expr(token):
    """CASE expression assigning a heuristic POS class to a token
    column (raw case preserved — PROPN needs it)."""
    expr = None
    lowered = F.lower(token)
    for tag, words in POS_WORD_CLASSES.items():
        cond = lowered.isin(*words)
        expr = F.when(cond, F.lit(tag)) if expr is None else expr.when(
            cond, F.lit(tag)
        )
    expr = expr.when(token.rlike(r"^[0-9]+([.,][0-9]+)?$"), F.lit("NUM"))
    expr = expr.when(token.rlike(r"^[A-Z]"), F.lit("PROPN"))
    for tag, pat in POS_SUFFIX_RULES:
        expr = expr.when(lowered.rlike(pat), F.lit(tag))
    return expr.otherwise(F.lit("NOUN"))


def pos_distribution(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(pos, n, pct) corpus-wide — _pos_distribution
    (nlp_analyzer.py:819-850) minus the barplot (viz scoped out; the
    returned dict IS this table). Tokenizes on non-alphanumerics with
    case preserved, tags each token with pos_tag_expr, then one hash
    aggregate + a 1-row broadcast total for pct."""
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.split(F.col(text_col), r"[^A-Za-z0-9]+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
    )
    tagged = toks.select(pos_tag_expr(F.col("token")).alias("pos"))
    counts = tagged.groupBy("pos").agg(F.count(F.lit(1)).alias("n"))
    # global-window total over the AGGREGATED rows (bounded by the
    # number of POS classes, ~10) — one scan of the source, unlike a
    # separate total aggregate which would recompute the explode
    from pyspark.sql import Window

    total = Window.partitionBy()
    return counts.select(
        "pos", "n", (F.col("n") / F.sum("n").over(total)).alias("pct")
    )
