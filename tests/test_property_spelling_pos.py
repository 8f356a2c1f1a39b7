"""Property tests: the SymSpell spelling-suggestion join and the
heuristic POS tagger agree with exhaustive pure-Python mirrors on
random corpora (same batched shape as test_property_oracle: hypothesis
generates corpora, one Spark job per corpus)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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


def test_with_corrected_text_applies_and_is_idempotent(spark):
    """with_corrected_text replaces suggested tokens in the normalized
    reassembly, leaves the original text column untouched, NULLs
    no-token docs, and is a fixed point under re-application."""
    base = [(i, "the quick brown fox jumps over the lazy dog") for i in range(30)]
    rows = base + [
        (100, "teh quick brown fox"),  # 'teh' -> 'the'
        (101, "THE Quick BROWN fox"),  # case-normalized reassembly
        (102, None),
        (103, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sugg = SP.spelling_suggestions(df, min_freq=3)
    out = {
        r["doc_id"]: r
        for r in SP.with_corrected_text(df, sugg).collect()
    }
    assert out[100]["text_corrected"] == "the quick brown fox"
    assert out[100]["text"] == "teh quick brown fox"  # untouched
    assert out[101]["text_corrected"] == "the quick brown fox"
    assert out[102]["text_corrected"] is None
    assert out[103]["text_corrected"] is None  # blank -> no tokens
    assert (
        out[0]["text_corrected"]
        == "the quick brown fox jumps over the lazy dog"
    )
    # idempotence: correcting the corrected column changes nothing
    once = SP.with_corrected_text(df, sugg)
    twice = SP.with_corrected_text(
        once.select("doc_id", F.col("text_corrected").alias("text")),
        sugg,
    )
    mismatch = (
        twice.filter(
            F.col("text").isNotNull()
            & (F.col("text") != F.col("text_corrected"))
        ).count()
    )
    assert mismatch == 0
    from data_quality_checker_spark.operators.dedup import release_cache

    release_cache(sugg)


def test_with_corrected_text_map_join_parity_and_plan(spark):
    """The zero-shuffle map-literal strategy and the explode+join
    strategy produce identical corrected columns; the map plan
    contains no real shuffle (the 100 TB path moves no corpus data),
    and 'auto' picks map for small suggestion tables."""
    import re as _re

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(30)]
    rows += [(100, "teh quick brown fox"), (101, None), (102, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sugg = SP.spelling_suggestions(df, min_freq=3)
    a = {
        r["doc_id"]: r["text_corrected"]
        for r in SP.with_corrected_text(df, sugg, strategy="map").collect()
    }
    b = {
        r["doc_id"]: r["text_corrected"]
        for r in SP.with_corrected_text(df, sugg, strategy="join").collect()
    }
    c = {
        r["doc_id"]: r["text_corrected"]
        for r in SP.with_corrected_text(df, sugg, strategy="auto").collect()
    }
    assert a == b == c
    assert a[100] == "the quick brown fox"
    assert a[101] is None and a[102] is None

    plan = (
        SP.with_corrected_text(df, sugg, strategy="map")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not _re.search(
        r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)",
        plan,
    ), plan
    # empty suggestion table: map path is the identity reassembly
    empty = spark.createDataFrame(
        [], "token string, freq long, suggestion string, "
        "suggestion_freq long, distance int"
    )
    out = {
        r["doc_id"]: r["text_corrected"]
        for r in SP.with_corrected_text(df, empty, strategy="map").collect()
    }
    assert out[100] == "teh quick brown fox"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        SP.with_corrected_text(df, sugg, strategy="bogus")
    from data_quality_checker_spark.operators.dedup import release_cache

    release_cache(sugg)


def test_spelling_suggestions_single_corpus_scan(spark, tmp_path_factory):
    """The frequency table feeds three consumers (vocab filter,
    suspect anti-join, delete keys); the persist must collapse the
    corpus tokenization to ONE parquet scan — without it the plan
    reads the corpus three times."""
    d = str(tmp_path_factory.mktemp("spell"))
    spark.createDataFrame(
        [(i, "alpha beta gamma delta common words") for i in range(40)]
        + [(100, "alpah beta")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(d)
    docs = spark.read.parquet(d)
    sugg = SP.spelling_suggestions(docs, min_freq=3)
    plan = sugg._jdf.queryExecution().executedPlan().toString()
    # all three freqs consumers (vocab filter, suspect anti-join,
    # suspect delete-keys) must read the CACHE, not re-tokenize: every
    # FileScan in the printed tree is the InMemoryRelation build plan
    # being echoed per consumer, and each consumer's own read is an
    # InMemoryTableScan
    assert plan.count("InMemoryTableScan") == 3, plan
    assert {r["token"] for r in sugg.collect()} == {"alpah"}
    from data_quality_checker_spark.operators.dedup import release_cache

    release_cache(sugg)


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
