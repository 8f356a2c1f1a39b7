"""BPE tokenizer (plans/bpe.py): deterministic merge learning on the
classic 'low/lower/lowest' corpus, UDF-vs-Python parity, and the
count-vs-regex-proxy relationship."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans import bpe as B


def test_train_bpe_classic_corpus(spark):
    # Sennrich's running example: 'lo' + 'w' dominate
    rows = [(i, "low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3)
            for i in range(4)]
    df = spark.createDataFrame(rows, ["id", "text"])
    merges = B.train_bpe(df, num_merges=10, sample_docs=10, seed=1)
    assert len(merges) == 10
    # rerun-deterministic
    assert merges == B.train_bpe(df, num_merges=10, sample_docs=10, seed=1)
    # the most frequent pairs involve 'est</w>' / 'lo' family
    flat = ["".join(p) for p in merges]
    assert any("es" in m or "lo" in m for m in flat[:3])


def test_encode_word_and_count_mirror():
    merges = [("l", "o"), ("lo", "w"), ("e", "s"), ("es", "t"),
              ("est", "</w>"), ("low", "</w>")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.encode_word("low", ranks) == ["low</w>"]
    assert B.encode_word("lowest", ranks) == ["low", "est</w>"]
    assert B.encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]
    assert B.token_count_python("low lowest xyz", merges) == 1 + 2 + 4
    assert B.token_count_python(None, merges) == 0


def test_udf_matches_python_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = B.train_bpe(docs, num_merges=60, sample_docs=200, seed=7)
    assert merges
    out = docs.select(
        "doc_id",
        "text",
        B.bpe_token_count_udf(merges)("text").alias("n_bpe"),
    ).collect()
    for r in out[:50]:
        assert r["n_bpe"] == B.token_count_python(r["text"], merges), r[
            "doc_id"
        ]
    # learned merges compress: fewer tokens than raw characters,
    # more-or-equal than whitespace words
    import builtins

    words = [
        (len(r["text"].lower().split()) if r["text"] else 0, r["n_bpe"])
        for r in out
    ]
    assert builtins.all(n >= w for w, n in words)


def test_tokens_udf_roundtrip(spark):
    merges = [("a", "b"), ("ab", "</w>")]
    df = spark.createDataFrame([(1, "ab ab cd"), (2, None)], ["id", "text"])
    got = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", B.bpe_tokens_udf(merges)("text").alias("toks")
        ).collect()
    }
    assert got[1] == ["ab</w>", "ab</w>", "c", "d", "</w>"]
    assert got[2] == []
