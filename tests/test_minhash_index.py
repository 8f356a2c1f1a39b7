"""Incremental MinHash index (operators/minhash_index.py).

The load-bearing gate is CROSS-PARITY: querying a new batch against an
index built on the old corpus must find EXACTLY the pairs that a batch
near_duplicates_minhash over old ∪ new finds across the split (and,
with include_within_batch, inside the batch) — same ids, same exact
Jaccard values. Sketch code is shared by construction; this pins that
the join/verify plumbing around it doesn't drift either.

Reference ancestor: nlp_analyzer.py:720-743 (_find_text_pairs) — the
reference has no incremental surface; this is its scale extension.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import dedup as DD
from data_quality_checker_spark.operators import minhash_index as MI

THRESHOLD = 0.7


def _corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("doc_id < 200")
        .select("doc_id", "text")
    )
    old = docs.filter("doc_id < 150")
    # new batch: fresh docs + near-clones of indexed docs (tail append
    # keeps Jaccard high for non-trivial texts) + one exact clone
    new = (
        docs.filter("doc_id >= 150")
        .unionByName(
            old.filter("doc_id % 3 = 0").select(
                (F.col("doc_id") + 10_000).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" tail marker tokens appended")
                ).alias("text"),
            )
        )
        .unionByName(
            old.filter("doc_id = 7").select(
                (F.col("doc_id") + 20_000).alias("doc_id"), "text"
            )
        )
    )
    return old, new


def _pairs(df):
    return {
        (r.id_index, r.id_new, round(r.jaccard, 6), r.pair_type)
        for r in df.collect()
    }


def _expected(old, new, threshold=THRESHOLD, within=True):
    """Ground truth from the batch operator over old ∪ new."""
    full = DD.near_duplicates_minhash(
        old.unionByName(new), threshold=threshold
    )
    old_ids = {r.doc_id for r in old.select("doc_id").collect()}
    exp = set()
    for r in full.collect():
        a_old, b_old = r.id_a in old_ids, r.id_b in old_ids
        if a_old and b_old:
            continue  # both already indexed — not a query result
        j = round(r.jaccard, 6)
        if a_old != b_old:
            i, n = (r.id_a, r.id_b) if a_old else (r.id_b, r.id_a)
            exp.add((i, n, j, "index-new"))
        elif within:
            exp.add(
                (min(r.id_a, r.id_b), max(r.id_a, r.id_b), j, "new-new")
            )
    DD.release_cache(full)
    return exp


@pytest.fixture(scope="module")
def idx(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mi") / "index")
    old, new = _corpus(spark, sf_dir)
    info = MI.build_minhash_index(old, path)
    return path, old, new, info


def test_build_manifest_and_counts(spark, idx):
    path, old, _, info = idx
    assert info["n_docs"] == old.filter("text is not null").count()
    meta = MI.read_minhash_index_meta(spark, path)
    assert meta["num_hashes"] == 32 and meta["num_bands"] == 8
    assert meta["shingle_mode"] == "hash"
    assert meta["id_type"] == "bigint"
    # layout: the three sketch tables exist and agree on doc count
    sig = spark.read.parquet(f"{path}/signatures")
    assert sig.count() == info["n_docs"]
    assert len(sig.columns) == 1 + meta["num_hashes"]
    bands = spark.read.parquet(f"{path}/bands")
    assert bands.count() == info["n_docs"] * meta["num_bands"]


def test_cross_parity_with_batch_operator(spark, idx):
    """Index query == batch dedup restricted to cross/batch pairs —
    ids, pair types, AND exact jaccard values."""
    path, old, new, _ = idx
    res = MI.query_minhash_index(
        new, path, threshold=THRESHOLD, include_within_batch=True
    )
    got = _pairs(res)
    DD.release_cache(res)
    exp = _expected(old, new)
    assert got == exp
    # the planted clones must be present: exact clone at jaccard 1.0
    assert (7, 20_007, 1.0, "index-new") in got
    cross = {g for g in got if g[3] == "index-new"}
    assert len(cross) >= old.filter(
        "doc_id % 3 = 0 and doc_id < 150"
    ).count()  # every tail-appended clone pairs with its original


def test_cross_only_excludes_within(spark, idx):
    path, old, new, _ = idx
    res = MI.query_minhash_index(new, path, threshold=THRESHOLD)
    got = _pairs(res)
    DD.release_cache(res)
    assert got == _expected(old, new, within=False)
    assert all(p[3] == "index-new" for p in got)


def test_broadcast_and_shuffle_forms_agree(spark, idx):
    path, old, new, _ = idx
    rb = MI.query_minhash_index(new, path, broadcast=True)
    rs = MI.query_minhash_index(new, path, broadcast=False)
    try:
        plan = rb._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert _pairs(rb) == _pairs(rs)
    finally:
        DD.release_cache(rb)
        DD.release_cache(rs)


def test_append_then_query_sees_both_generations(spark, idx, tmp_path):
    path0, old, new, _ = idx
    path = str(tmp_path / "index2")
    # copy the built index so the module-scoped one stays pristine
    shutil.copytree(path0, path)
    info = MI.append_minhash_index(new, path)
    assert info["n_appended"] == new.filter("text is not null").count()
    # a probe cloned from an APPENDED doc must now match it
    probe = new.filter("doc_id = 10003").select(
        (F.col("doc_id") + 30_000).alias("doc_id"), "text"
    )
    res = MI.query_minhash_index(probe, path, threshold=THRESHOLD)
    got = _pairs(res)
    DD.release_cache(res)
    ids_hit = {p[0] for p in got}
    assert 10_003 in ids_hit  # the appended generation
    assert 3 in ids_hit  # the original generation (10003 is 3's clone)


def test_append_idempotent_retry(spark, idx, tmp_path):
    """Re-appending an already-committed batch_id is a NO-OP: the
    retry returns already_committed and the index tables are
    byte-count identical — a task-retry can never double-land a
    batch's sketch rows."""
    path0, _, new, _ = idx
    path = str(tmp_path / "idx_retry")
    shutil.copytree(path0, path)
    info1 = MI.append_minhash_index(new, path, batch_id="crawl-001")
    assert info1["n_appended"] > 0
    assert info1["batch_id"] == "crawl-001"
    counts1 = MI.verify_minhash_index(spark, path)
    assert counts1["consistent"]
    raw1 = {
        t: spark.read.parquet(f"{path}/{t}").count()
        for t in ("shingles", "signatures", "bands")
    }
    info2 = MI.append_minhash_index(new, path, batch_id="crawl-001")
    assert info2["n_appended"] == 0 and info2["already_committed"]
    assert MI.verify_minhash_index(spark, path) == counts1
    # raw (non-distinct) row counts unchanged too: no duplicate files
    raw2 = {
        t: spark.read.parquet(f"{path}/{t}").count()
        for t in ("shingles", "signatures", "bands")
    }
    assert raw2 == raw1
    with pytest.raises(ValueError, match="batch_id"):
        MI.append_minhash_index(new, path, batch_id="../evil")


def test_torn_append_detected_and_repaired(spark, idx, tmp_path):
    """A crash mid-publish (one table's files landed, begin marker
    without commit) is refused by every entrypoint, rolled back by
    repair_minhash_index to the last committed state, and the same
    batch_id then re-lands cleanly."""
    path0, _, new, _ = idx
    path = str(tmp_path / "idx_torn")
    shutil.copytree(path0, path)
    base_counts = MI.verify_minhash_index(spark, path)
    meta = MI.read_minhash_index_meta(spark, path)

    # simulate the crash: stage the batch's shingles, publish ONLY
    # that table, leave the begin marker — exactly the state after a
    # failure between the first and second rename loop
    from data_quality_checker_spark.operators.dedup import (
        _minhash_shingle_plan,
    )

    staging = f"{path}/_staging/torn1"
    _minhash_shingle_plan(
        new, "doc_id", "text", meta["k_shingle"], meta["shingle_mode"]
    ).write.mode("overwrite").parquet(f"{staging}/shingles")
    MI._touch(spark, f"{path}/_appends/torn1.begin")
    assert MI._publish_staged_table(spark, path, "torn1", "shingles") > 0

    with pytest.raises(ValueError, match="uncommitted"):
        MI.read_minhash_index_meta(spark, path)
    with pytest.raises(ValueError, match="uncommitted"):
        MI.query_minhash_index(new, path)
    with pytest.raises(ValueError, match="uncommitted"):
        MI.verify_minhash_index(spark, path)

    repaired = MI.repair_minhash_index(spark, path)
    assert set(repaired) == {"torn1"} and repaired["torn1"] > 0
    assert MI.verify_minhash_index(spark, path) == base_counts

    # the same batch_id re-lands after repair
    info = MI.append_minhash_index(new, path, batch_id="torn1")
    assert info["n_appended"] > 0
    assert MI.verify_minhash_index(spark, path)["consistent"]


def test_append_self_heals_own_torn_batch(spark, idx, tmp_path):
    """Retrying append_minhash_index with the batch_id that crashed
    rolls back its own partial publish and lands the batch — no manual
    repair step; query results equal a never-crashed append's."""
    path0, _, new, _ = idx
    clean, crashed = str(tmp_path / "clean"), str(tmp_path / "crashed")
    shutil.copytree(path0, clean)
    shutil.copytree(path0, crashed)
    MI.append_minhash_index(new, clean, batch_id="b1")

    meta = MI.read_minhash_index_meta(spark, crashed)
    from data_quality_checker_spark.operators.dedup import (
        _minhash_shingle_plan,
    )

    _minhash_shingle_plan(
        new, "doc_id", "text", meta["k_shingle"], meta["shingle_mode"]
    ).write.mode("overwrite").parquet(
        f"{crashed}/_staging/b1/shingles"
    )
    MI._touch(spark, f"{crashed}/_appends/b1.begin")
    MI._publish_staged_table(spark, crashed, "b1", "shingles")

    info = MI.append_minhash_index(new, crashed, batch_id="b1")
    assert info["n_appended"] > 0 and "already_committed" not in info
    assert (
        MI.verify_minhash_index(spark, crashed)
        == MI.verify_minhash_index(spark, clean)
    )
    probe = new.filter("doc_id = 10003").select(
        (F.col("doc_id") + 40_000).alias("doc_id"), "text"
    )
    ra = MI.query_minhash_index(probe, crashed, threshold=THRESHOLD)
    rb = MI.query_minhash_index(probe, clean, threshold=THRESHOLD)
    try:
        assert _pairs(ra) == _pairs(rb)
    finally:
        DD.release_cache(ra)
        DD.release_cache(rb)


def test_query_params_come_from_manifest(spark, sf_dir, tmp_path):
    """Build with non-default banding; query reads it back — a probe
    identical to an indexed doc is found even though the caller never
    restates the sketch params."""
    old, _ = _corpus(spark, sf_dir)
    path = str(tmp_path / "idx16")
    MI.build_minhash_index(
        old, path, num_hashes=16, num_bands=4, shingle_mode="text"
    )
    meta = MI.read_minhash_index_meta(spark, path)
    assert (meta["num_hashes"], meta["num_bands"]) == (16, 4)
    probe = old.filter("doc_id = 11").select(
        (F.col("doc_id") + 50_000).alias("doc_id"), "text"
    )
    res = MI.query_minhash_index(probe, path, threshold=0.99)
    got = _pairs(res)
    DD.release_cache(res)
    assert (11, 50_011, 1.0, "index-new") in got


def test_id_type_mismatch_raises(spark, idx):
    path, _, new, _ = idx
    bad = new.select(F.col("doc_id").cast("int").alias("doc_id"), "text")
    with pytest.raises(ValueError, match="id column"):
        MI.query_minhash_index(bad, path)


def test_missing_index_raises(spark, idx):
    _, _, new, _ = idx
    with pytest.raises(ValueError, match="manifest"):
        MI.query_minhash_index(new, "/tmp/definitely/not/an/index")


def test_bad_build_params_raise(spark, idx):
    _, old, _, _ = idx
    with pytest.raises(ValueError, match="divisible"):
        MI.build_minhash_index(old, "/tmp/unused", num_hashes=32, num_bands=5)
    with pytest.raises(ValueError, match="shingle_mode"):
        MI.build_minhash_index(old, "/tmp/unused", shingle_mode="bogus")
    with pytest.raises(ValueError, match="md5"):
        MI.build_minhash_index(
            old, "/tmp/unused", hash_family="md5", shingle_mode="hash"
        )


def test_empty_batch_stable_schema(spark, idx):
    path, _, new, _ = idx
    empty = new.filter("doc_id < 0")
    res = MI.query_minhash_index(empty, path, include_within_batch=True)
    assert res.count() == 0
    assert res.columns == ["id_index", "id_new", "jaccard", "pair_type"]
    DD.release_cache(res)


def test_filter_batch_against_index(spark, idx):
    """Survivors = batch minus index-matches minus within-batch
    non-canonicals; fresh docs pass through untouched."""
    path, old, new, _ = idx
    # add a within-batch duplicate PAIR of fresh content: 150' = clone
    # of 150 under a higher id — 150 stays (canonical), clone drops
    batch = new.unionByName(
        new.filter("doc_id = 150").select(
            (F.col("doc_id") + 70_000).alias("doc_id"), "text"
        )
    )
    out = MI.filter_batch_against_index(batch, path, threshold=THRESHOLD)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    DD.release_cache(out)
    # exact clone of indexed doc 7 -> dropped
    assert 20_007 not in kept
    # EVERY batch doc that pairs with the index is gone (short docs'
    # tail-appended clones can legitimately fall below threshold and
    # survive — expected drops derive from the pairs, not the plant)
    res = MI.query_minhash_index(
        batch, path, threshold=THRESHOLD, include_within_batch=True
    )
    prs = _pairs(res)
    DD.release_cache(res)
    cross_losers = {p[1] for p in prs if p[3] == "index-new"}
    assert cross_losers and not (cross_losers & kept)
    # fresh canonical kept, its within-batch clone dropped
    assert 150 in kept and 70_150 not in kept
    # a batch doc in NO pair passes through
    all_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    paired = {p[1] for p in prs} | {p[0] for p in prs if p[3] == "new-new"}
    untouched = all_ids - paired
    assert untouched and untouched <= kept


def test_compact_preserves_results(spark, idx, tmp_path):
    """Append fragments the index; compaction rewrites it with fewer
    files and IDENTICAL query results (manifest carried over)."""
    path0, old, new, _ = idx
    path = str(tmp_path / "frag")
    shutil.copytree(path0, path)
    # two appends -> extra small files per table
    MI.append_minhash_index(new.filter("doc_id >= 150"), path)
    MI.append_minhash_index(
        new.filter("doc_id < 150").select(
            (F.col("doc_id") + 40_000).alias("doc_id"), "text"
        ),
        path,
    )
    probe = old.filter("doc_id = 22").select(
        (F.col("doc_id") + 60_000).alias("doc_id"), "text"
    )
    before = MI.query_minhash_index(probe, path, threshold=0.9)
    got_before = _pairs(before)
    DD.release_cache(before)
    compacted = str(tmp_path / "compacted")
    stats = MI.compact_minhash_index(spark, path, compacted)
    assert set(stats) == {"shingles", "signatures", "bands"}
    assert all(
        s["files_after"] <= s["files_before"] for s in stats.values()
    )
    assert stats["bands"]["files_after"] < stats["bands"]["files_before"]
    meta = MI.read_minhash_index_meta(spark, compacted)
    assert meta["num_hashes"] == 32
    after = MI.query_minhash_index(probe, compacted, threshold=0.9)
    got_after = _pairs(after)
    DD.release_cache(after)
    assert got_after == got_before and (22, 60_022, 1.0, "index-new") in got_after


def test_guards(spark, idx, tmp_path):
    path, _, new, _ = idx
    with pytest.raises(ValueError, match="in-place"):
        MI.compact_minhash_index(spark, path, path + "/")
    with pytest.raises(TypeError, match="drop_within_batch"):
        MI.filter_batch_against_index(
            new, path, include_within_batch=True
        )
    # batch ids are ASCII [A-Za-z0-9._-] — Unicode alphanumerics
    # (str.isalnum-true) must be refused before they reach object keys
    for bad in ("снимок-1", "crawl①", "a b", ""):
        with pytest.raises(ValueError, match="batch_id"):
            MI.append_minhash_index(new, path, batch_id=bad)


def test_rollback_never_touches_prefix_extending_batch(
    spark, idx, tmp_path
):
    """Repairing torn batch "2024" must not delete committed files of
    batch "2024-06", whose id extends the torn id — the '~' publish
    delimiter sits outside the batch-id alphabet, so one batch's
    prefix glob can never swallow another's files (round-6 review:
    the old '-' delimiter made repair delete committed data)."""
    path0, _, new, _ = idx
    path = str(tmp_path / "idx_prefix")
    shutil.copytree(path0, path)
    info = MI.append_minhash_index(new, path, batch_id="2024-06")
    assert info["n_appended"] > 0
    committed = MI.verify_minhash_index(spark, path)
    meta = MI.read_minhash_index_meta(spark, path)

    # tear batch "2024": stage + publish ONE table, begin marker only
    from data_quality_checker_spark.operators.dedup import (
        _minhash_shingle_plan,
    )

    torn = new.select((F.col("doc_id") + 90_000).alias("doc_id"), "text")
    _minhash_shingle_plan(
        torn, "doc_id", "text", meta["k_shingle"], meta["shingle_mode"]
    ).write.mode("overwrite").parquet(f"{path}/_staging/2024/shingles")
    MI._touch(spark, f"{path}/_appends/2024.begin")
    assert MI._publish_staged_table(spark, path, "2024", "shingles") > 0

    repaired = MI.repair_minhash_index(spark, path)
    assert set(repaired) == {"2024"}
    # the committed 2024-06 batch survived the prefix rollback intact
    assert MI.verify_minhash_index(spark, path) == committed

    # the LEGACY glob (batch-<id>-part-*) must not swallow a
    # committed '~'-scheme batch whose id extends the torn id with
    # "-part-" — every '~'-scheme filename carries a '~', which the
    # legacy match skips. Fresh tree: the torn id must not already
    # hold a commit marker.
    path2 = str(tmp_path / "idx_prefix2")
    shutil.copytree(path0, path2)
    info2 = MI.append_minhash_index(
        new, path2, batch_id="2024-06-part-1"
    )
    assert info2["n_appended"] > 0
    committed2 = MI.verify_minhash_index(spark, path2)
    _minhash_shingle_plan(
        torn, "doc_id", "text", meta["k_shingle"], meta["shingle_mode"]
    ).write.mode("overwrite").parquet(
        f"{path2}/_staging/2024-06/shingles"
    )
    MI._touch(spark, f"{path2}/_appends/2024-06.begin")
    assert (
        MI._publish_staged_table(spark, path2, "2024-06", "shingles") > 0
    )
    repaired2 = MI.repair_minhash_index(spark, path2)
    assert set(repaired2) == {"2024-06"}
    assert MI.verify_minhash_index(spark, path2) == committed2


def test_property_cross_parity_random_corpora(spark, tmp_path_factory):
    """Hypothesis-randomized corpora (repetitive word soup so near-dup
    pairs actually occur): the index query over a random old/new split
    must equal the batch operator's cross+within pairs EXACTLY — same
    gate as test_cross_parity_with_batch_operator, over corpus shapes
    nobody hand-picked. Few examples (each is a full Spark round
    trip); the fixed-corpus tests carry the volume."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    words = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    _doc = st.lists(
        st.sampled_from(words), min_size=0, max_size=12
    ).map(" ".join)
    _corpus = st.lists(
        st.one_of(st.none(), _doc), min_size=4, max_size=18
    )

    @given(texts=_corpus, split=st.integers(min_value=1, max_value=3))
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def _run(texts, split):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        old = df.filter(f"doc_id % 4 < {split}")
        new = df.filter(f"doc_id % 4 >= {split}")
        path = str(
            tmp_path_factory.mktemp("mi_prop") / "idx"
        )
        MI.build_minhash_index(
            old, path, k_shingle=2, num_hashes=16, num_bands=4
        )
        res = MI.query_minhash_index(
            new, path, threshold=0.5, include_within_batch=True,
            broadcast=True, persist=False,
        )
        got = _pairs(res)
        # ground truth from the batch operator with MATCHING sketch
        # params (_expected uses the defaults, 32x8/k=3)
        full = DD.near_duplicates_minhash(
            old.unionByName(new), threshold=0.5,
            k_shingle=2, num_hashes=16, num_bands=4,
        )
        old_ids = {r.doc_id for r in old.select("doc_id").collect()}
        exp = set()
        for r in full.collect():
            a_old, b_old = r.id_a in old_ids, r.id_b in old_ids
            if a_old and b_old:
                continue
            j = round(r.jaccard, 6)
            if a_old != b_old:
                i_, n_ = (
                    (r.id_a, r.id_b) if a_old else (r.id_b, r.id_a)
                )
                exp.add((i_, n_, j, "index-new"))
            else:
                exp.add(
                    (
                        min(r.id_a, r.id_b),
                        max(r.id_a, r.id_b),
                        j,
                        "new-new",
                    )
                )
        DD.release_cache(full)
        assert got == exp, (texts, split, got ^ exp)

    _run()


def test_md5_family_round_trip(spark, sf_dir, tmp_path):
    """The cross-engine md5 family builds/queries too (the oracle
    entry's configuration): text shingles, string signatures."""
    old, new = _corpus(spark, sf_dir)
    path = str(tmp_path / "idx_md5")
    MI.build_minhash_index(
        old, path, num_hashes=8, num_bands=4,
        shingle_mode="text", hash_family="md5",
    )
    sig = spark.read.parquet(f"{path}/signatures")
    assert dict(sig.dtypes)["h0"] == "string"
    res = MI.query_minhash_index(new, path, threshold=0.6)
    got = _pairs(res)
    DD.release_cache(res)
    assert (7, 20_007, 1.0, "index-new") in got
