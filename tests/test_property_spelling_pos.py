"""Property tests: the SymSpell spelling-suggestion join and the
heuristic POS tagger agree with exhaustive pure-Python mirrors on
random corpora (same batched shape as test_property_oracle: hypothesis
generates corpora, one Spark job per corpus)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_quality_checker_spark.operators import entities as E
from data_quality_checker_spark.operators import spelling as SP

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = st.text(alphabet="abcdef", min_size=1, max_size=6)

_corpora = st.lists(
    st.lists(_WORDS, min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=20,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _dels(w: str) -> set[str]:
    return {w} | {w[:i] + w[i + 1 :] for i in range(len(w))}


def _python_suggestions(texts, min_freq):
    """Exhaustive mirror of spelling_suggestions: same vocab split,
    candidate criterion (shared delete-1 key), lev <= 2 filter, and
    (lev, -freq, word) ranking."""
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    vocab = {w: f for w, f in freqs.items() if f >= min_freq}
    out = {}
    for w, f in freqs.items():
        if w in vocab or len(w) < 3:
            continue
        dk = _dels(w)
        cands = [
            (v, vf)
            for v, vf in vocab.items()
            if (_dels(v) & dk) and _lev(w, v) <= 2
        ]
        if cands:
            best = sorted(
                cands, key=lambda c: (_lev(w, c[0]), -c[1], c[0])
            )[0]
            out[w] = (f, best[0], best[1], _lev(w, best[0]))
    return out


@given(_corpora)
@_SETTINGS
def test_spelling_matches_python_mirror(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["token"]: (
            r["freq"],
            r["suggestion"],
            r["suggestion_freq"],
            r["distance"],
        )
        for r in SP.spelling_suggestions(df, min_freq=3).collect()
    }
    assert got == _python_suggestions(texts, 3)


_POS_TEXTS = st.lists(
    st.lists(
        st.one_of(
            _WORDS,
            st.sampled_from(
                ["the", "it", "over", "and", "is", "42", "3.5",
                 "Quick", "NASA", "slowly", "jumped", "useful"]
            ),
        ),
        min_size=1,
        max_size=15,
    ).map(" ".join),
    min_size=1,
    max_size=15,
)


def _python_pos(texts):
    """Mirror of pos_tag_expr's ordered CASE."""
    counts: dict[str, int] = {}
    for t in texts:
        for tok in re.split(r"[^A-Za-z0-9]+", t):
            if not tok:
                continue
            low = tok.lower()
            tag = None
            for name, words in E.POS_WORD_CLASSES.items():
                if low in words:
                    tag = name
                    break
            if tag is None and re.search(r"^[0-9]+([.,][0-9]+)?$", tok):
                tag = "NUM"
            if tag is None and re.search(r"^[A-Z]", tok):
                tag = "PROPN"
            if tag is None:
                for name, pat in E.POS_SUFFIX_RULES:
                    if re.search(pat, low):
                        tag = name
                        break
            counts[tag or "NOUN"] = counts.get(tag or "NOUN", 0) + 1
    return counts


@given(_POS_TEXTS)
@_SETTINGS
def test_pos_distribution_matches_python_mirror(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = E.pos_distribution(df).collect()
    got = {r["pos"]: r["n"] for r in rows}
    expect = _python_pos(texts)
    assert got == expect
    total = sum(expect.values())
    for r in rows:
        assert abs(r["pct"] - r["n"] / total) < 1e-12
