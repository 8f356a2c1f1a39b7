"""Deterministic wordlists shared by the Spark expressions, the
pure-Python oracle, and the generated DuckDB oracle SQL.

Generalizes the reference's NLTK-stopword dependency
(/root/reference/dataset_quality_checker/nlp_analyzer.py:927-929) into
fixed, committed lists so no runtime download/network is ever needed and
all three implementations (Catalyst expr / Python / DuckDB SQL) agree
token-for-token.
"""

from __future__ import annotations

# Per-language stopword heads. Small on purpose: the language-ID rule is a
# hit-count argmax over these sets (the deterministic stand-in for fastText
# langid — same UDF plumbing, swappable model, see plans/udfs.py).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
        "was", "were", "it", "that", "this", "with", "for", "on", "as",
        "at", "by", "be", "from", "but", "not", "they", "he", "she", "we",
        "you",
    ),
    "es": (
        "el", "la", "los", "las", "un", "una", "y", "o", "de", "en",
        "es", "son", "era", "que", "este", "esta", "con", "para", "por",
        "como", "su", "se", "no", "pero", "ellos", "nosotros", "usted",
        "del", "al", "lo",
    ),
    "fr": (
        "le", "la", "les", "un", "une", "et", "ou", "de", "dans", "est",
        "sont", "etait", "que", "ce", "cette", "avec", "pour", "par",
        "comme", "son", "se", "ne", "pas", "mais", "ils", "nous", "vous",
        "du", "au", "des",
    ),
    "de": (
        "der", "die", "das", "ein", "eine", "und", "oder", "von", "zu",
        "in", "ist", "sind", "war", "waren", "es", "dass", "dies", "mit",
        "fur", "auf", "als", "bei", "sein", "aus", "aber", "nicht", "sie",
        "er", "wir", "ihr",
    ),
    "zh": (
        "de", "shi", "zai", "he", "le", "wo", "ni", "ta", "men", "zhe",
        "na", "you", "bu", "ren", "yi", "ge", "shang", "xia", "da",
        "xiao", "zhong", "guo", "lai", "qu", "hao", "dui", "yao", "hui",
        "neng", "shuo",
    ),
}

LANGS: tuple[str, ...] = tuple(STOPWORDS)

# English stopwords double as the quality-rule stopword set (Gopher-style
# "must contain >= k stopwords" / stop-word ratio rule).
QUALITY_STOPWORDS: tuple[str, ...] = STOPWORDS["en"]

# Toxicity wordlist — placeholder tokens (the real deployment swaps in a
# curated list; tests only need determinism). Generalizes the reference's
# allowlist membership check (dq_checker.py:222-241) into a deny-list.
TOXIC_WORDS: tuple[str, ...] = (
    "toxic_slur_a", "toxic_slur_b", "toxic_slur_c", "badword1", "badword2",
)


# AFINN-style polarity heads (unit weights): the wordlist stand-in for
# the reference's TextBlob sentiment/subjectivity/emotional-tone family
# (nlp_analyzer.py:931-952, :954-, :686-718) — same reframing as the
# toxicity rule: deterministic, dependency-free, engine-portable.
POSITIVE_WORDS: tuple[str, ...] = (
    "good", "great", "excellent", "amazing", "wonderful", "best",
    "love", "happy", "fantastic", "perfect", "awesome", "brilliant",
    "delightful", "superb", "positive", "beautiful", "enjoy", "helpful",
    "impressive", "outstanding",
)
NEGATIVE_WORDS: tuple[str, ...] = (
    "bad", "terrible", "awful", "horrible", "worst", "hate", "sad",
    "poor", "disappointing", "negative", "ugly", "broken", "useless",
    "failure", "wrong", "angry", "annoying", "dreadful", "painful",
    "boring",
)

# Opinion/hedge markers (the subjectivity axis of TextBlob's
# (polarity, subjectivity) pair, nlp_analyzer.py:954-967): words that
# signal stance or uncertainty rather than fact. Polar words are
# inherently subjective too — sentiment_scores counts both families.
SUBJECTIVE_WORDS: tuple[str, ...] = (
    "think", "believe", "feel", "feels", "seems", "seem", "probably",
    "maybe", "perhaps", "really", "very", "definitely", "certainly",
    "opinion", "personally", "honestly", "arguably", "likely",
    "apparently", "surely", "clearly", "obviously", "suppose",
    "guess", "hope", "wish", "prefer", "favorite", "should", "must",
)
