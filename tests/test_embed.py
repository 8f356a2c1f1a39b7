"""Text -> embedding bridge (plans/embed.py): hashed TF-IDF vectors
are unit-norm, deterministic, and zero-safe; semantic_dedup_text
drops planted clones straight from documents(text); the text-built
IVF index retrieves a near-copy's source at rank 1 using the CORPUS
IDF on the query side; Word2Vec doc vectors are deterministic for a
pinned (seed, num_partitions). The embedder's full vector CONTENT is
separately value-pinned by the doc_embed_hashing DuckDB oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.plans import embed as E


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 120")
        .select("doc_id", "text")
    )


def test_hashed_vectors_unit_norm_deterministic_zero_safe(spark, docs):
    dim = 32
    corpus = docs.unionByName(
        spark.createDataFrame(
            [(900001, None), (900002, "   ")], "doc_id long, text string"
        )
    )
    vecs = E.hashed_doc_vectors(corpus, dim=dim)
    rows = {r["doc_id"]: r["embedding"] for r in vecs.collect()}
    assert len(rows) == 122  # one row per input row, none dropped
    for did, v in rows.items():
        assert len(v) == dim
        n = math.sqrt(sum(x * x for x in v))
        if did >= 900001:  # NULL / token-less text -> zero vector
            assert n == 0.0
        else:
            assert abs(n - 1.0) < 1e-9
    # bit-identical across runs: no rand(), no training
    again = {
        r["doc_id"]: r["embedding"]
        for r in E.hashed_doc_vectors(corpus, dim=dim).collect()
    }
    assert again == rows
    # IDF is live, not dead code: disabling it changes the weights
    raw = {
        r["doc_id"]: r["embedding"]
        for r in E.hashed_doc_vectors(
            corpus, dim=dim, use_idf=False
        ).collect()
    }
    assert raw != rows


def test_semantic_dedup_text_drops_planted_clones(docs):
    clones = docs.filter("doc_id < 5").select(
        (F.col("doc_id") + 700000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(clones)
    kept = E.semantic_dedup_text(
        corpus, dim=64, k=8, tau=0.999, keep="min_id"
    )
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # exact clones embed identically (cosine 1.0): one of each pair
    # dropped, keep='min_id' retains the original
    assert kept_ids.issuperset(set(range(5)))
    assert not any(i >= 700000 for i in kept_ids)
    assert len(kept_ids) == 120
    # deterministic end to end
    again = {
        r["doc_id"]
        for r in E.semantic_dedup_text(
            corpus, dim=64, k=8, tau=0.999, keep="min_id"
        )
        .select("doc_id")
        .collect()
    }
    assert again == kept_ids
    # original columns pass through untouched
    assert kept.columns == corpus.columns


def test_hashed_vectors_arrow_assembly_bit_identical(spark, docs):
    """The arrow dense assembly (numpy scatter + SEQUENTIAL-order
    normalize) must be bit-identical to the Catalyst form the DuckDB
    oracle pins — same placements, same IEEE754 summation order."""
    dim = 32
    corpus = docs.unionByName(
        spark.createDataFrame(
            [(900001, None), (900002, "   ")], "doc_id long, text string"
        )
    )
    sql_v = {
        r["doc_id"]: r["embedding"]
        for r in E.hashed_doc_vectors(corpus, dim=dim).collect()
    }
    arrow_v = {
        r["doc_id"]: r["embedding"]
        for r in E.hashed_doc_vectors(
            corpus, dim=dim, impl="arrow"
        ).collect()
    }
    assert arrow_v == sql_v  # exact equality, not approx
    # un-normalized path too (distinct arithmetic branch)
    raw_sql = {
        r["doc_id"]: r["embedding"]
        for r in E.hashed_doc_vectors(
            corpus, dim=dim, normalize=False
        ).collect()
    }
    raw_arrow = {
        r["doc_id"]: r["embedding"]
        for r in E.hashed_doc_vectors(
            corpus, dim=dim, normalize=False, impl="arrow"
        ).collect()
    }
    assert raw_arrow == raw_sql
    with pytest.raises(ValueError, match="impl"):
        E.hashed_doc_vectors(corpus, dim=dim, impl="numpy")


def test_semantic_dedup_text_exact_group_semantics(spark, docs):
    """exact_group (default): exact-text copies collapse to the min-id
    representative before the vector stages — clones still drop,
    token-LESS groups (zero vector, never paired by the norm guard)
    keep EVERY member, and on a corpus with no cross-text near-dups
    the kept set is identical to the exact_group=False run."""
    clones = docs.filter("doc_id < 5").select(
        (F.col("doc_id") + 700000).alias("doc_id"), "text"
    )
    blanks = spark.createDataFrame(
        [(800001, None), (800002, None), (800003, "   ")],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(clones).unionByName(blanks)
    kept = {
        r["doc_id"]
        for r in E.semantic_dedup_text(
            corpus, dim=64, k=8, tau=0.999, keep="min_id"
        )
        .select("doc_id")
        .collect()
    }
    assert not any(700000 <= i < 800000 for i in kept)  # clones drop
    # 800001/800002 share the NULL-text group, 800003 is its own
    # whitespace group — all three are zero-vector members, all kept
    assert {800001, 800002, 800003} <= kept
    assert len(kept) == 123
    ungrouped = {
        r["doc_id"]
        for r in E.semantic_dedup_text(
            corpus,
            dim=64,
            k=8,
            tau=0.999,
            keep="min_id",
            exact_group=False,
        )
        .select("doc_id")
        .collect()
    }
    assert kept == ungrouped
    # round-7: the default path derives zero-group members with a
    # tokens-empty filter (valid because the internal IDF keeps every
    # token weight >= 1); a CALLER-provided idf table must take the
    # general zero_reps join path — and agree on the zero groups
    kept_custom = {
        r["doc_id"]
        for r in E.semantic_dedup_text(
            corpus,
            dim=64,
            k=8,
            tau=0.999,
            keep="min_id",
            embed_kw={"idf": E.hashing_idf(corpus, dim=64)},
        )
        .select("doc_id")
        .collect()
    }
    assert {800001, 800002, 800003} <= kept_custom
    assert not any(700000 <= i < 800000 for i in kept_custom)


def test_ivf_text_search_finds_source_doc(spark, docs):
    index, idf = E.ivf_index_from_text(
        docs, dim=64, num_centroids=4, seed=7
    )
    assert idf is not None  # hashing embedder hands back the IDF dim
    # queries = the doc's own text under a fresh id namespace: the
    # source doc must come back at rank 1 with cosine ~ 1
    queries = docs.filter("doc_id in (3, 41, 87)").select(
        (F.col("doc_id") + 500000).alias("query_id"), "text"
    )
    hits = E.search_text(
        index, queries, idf=idf, dim=64, k=3, nprobe=4
    ).filter("rank = 1")
    top = {r["query_id"] - 500000: r for r in hits.collect()}
    for src in (3, 41, 87):
        assert top[src]["id"] == src, top[src]
        assert top[src]["cosine"] > 1 - 1e-9


def test_search_text_refuses_incompatible_index(spark, docs):
    """search_text embeds queries with the hashing embedder — a
    word2vec-built index, a dim mismatch, or a dropped corpus IDF
    must raise instead of returning confidently wrong neighbors
    (round-6 review finding)."""
    small = docs.filter("doc_id < 40")
    queries = small.filter("doc_id < 3").select(
        (F.col("doc_id") + 500000).alias("query_id"), "text"
    )
    w2v_index, w2v_idf = E.ivf_index_from_text(
        small, dim=8, num_centroids=2, seed=7, embedder="word2vec",
        embed_kw={"num_partitions": 1},
    )
    assert w2v_idf is None
    with pytest.raises(ValueError, match="word2vec"):
        E.search_text(w2v_index, queries, dim=8, k=2)
    index, idf = E.ivf_index_from_text(
        small, dim=16, num_centroids=2, seed=7
    )
    with pytest.raises(ValueError, match="dim"):
        E.search_text(index, queries, idf=idf, dim=32, k=2)
    with pytest.raises(ValueError, match="IDF"):
        E.search_text(index, queries, dim=16, k=2)  # idf omitted
    # and the compatible call still works
    assert (
        E.search_text(index, queries, idf=idf, dim=16, k=2).count() > 0
    )


def test_text_index_guards_survive_reload(spark, docs, tmp_path):
    """A storage_path text index reopened in a 'later session' via
    load_text_index keeps the embed_meta guards and the corpus IDF
    table — the build-once/search-many workflow is exactly where the
    caller has lost track of build parameters (round-6 review)."""
    small = docs.filter("doc_id < 60")
    path = str(tmp_path / "tix")
    index, idf = E.ivf_index_from_text(
        small, dim=16, num_centroids=2, seed=7, storage_path=path
    )
    re_idx, re_idf = E.load_text_index(spark, path)
    assert re_idx.embed_meta == index.embed_meta
    assert re_idf is not None
    queries = small.filter("doc_id in (3, 7)").select(
        (F.col("doc_id") + 500000).alias("query_id"), "text"
    )
    hits = E.search_text(
        re_idx, queries, idf=re_idf, dim=16, k=2, nprobe=2
    ).filter("rank = 1")
    assert {r["query_id"] - 500000 for r in hits.collect()} == {
        r["id"] for r in hits.collect()
    }
    with pytest.raises(ValueError, match="dim"):
        E.search_text(re_idx, queries, idf=re_idf, dim=32, k=2)
    with pytest.raises(ValueError, match="IDF"):
        E.search_text(re_idx, queries, dim=16, k=2)
    # raw-TF index: the query side inherits use_idf=False through the
    # reloaded meta; an extraneous idf or an explicit use_idf=True
    # (IDF-weighted queries vs raw corpus) is refused BOTH ways
    path2 = str(tmp_path / "tix2")
    raw_idx, raw_idf = E.ivf_index_from_text(
        small, dim=16, num_centroids=2, seed=7, storage_path=path2,
        embed_kw={"use_idf": False},
    )
    assert raw_idf is None
    r2, ri2 = E.load_text_index(spark, path2)
    assert ri2 is None and r2.embed_meta["uses_idf"] is False
    assert E.search_text(r2, queries, dim=16, k=2).count() > 0
    with pytest.raises(ValueError, match="WITHOUT IDF"):
        E.search_text(r2, queries, idf=idf, dim=16, k=2)
    with pytest.raises(ValueError, match="conflicts"):
        E.search_text(
            r2, queries, dim=16, k=2, embed_kw={"use_idf": True}
        )


def test_word2vec_doc_vectors_deterministic(docs):
    small = docs.filter("doc_id < 40")
    a = {
        r["doc_id"]: r["embedding"]
        for r in E.word2vec_doc_vectors(
            small, dim=8, seed=11, num_partitions=1
        ).collect()
    }
    b = {
        r["doc_id"]: r["embedding"]
        for r in E.word2vec_doc_vectors(
            small, dim=8, seed=11, num_partitions=1
        ).collect()
    }
    assert a == b
    assert all(len(v) == 8 for v in a.values())


def test_doc_vectors_dispatch_rejects_unknown():
    with pytest.raises(ValueError, match="embedder"):
        E.doc_vectors(None, embedder="bert")
    with pytest.raises(ValueError, match="dim"):
        E.hashed_doc_vectors(None, dim=0)
