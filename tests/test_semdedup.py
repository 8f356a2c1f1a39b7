"""SemDeDup semantic dedup: planted duplicate groups, keep rule,
determinism, Lloyd refinement, and input hygiene."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import semdedup as SD


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def vecs(spark):
    # Two tight semantic groups far apart, plus two loners and two
    # junk rows. dim=4; cosine within a group ~0.999, across ~0.
    g1 = [1.0, 0.02, 0.0, 0.0]
    g2 = [0.0, 0.0, 1.0, 0.03]
    rows = [
        (0, _unit(g1)),
        (1, _unit([1.0, 0.05, 0.01, 0.0])),   # dup of 0
        (2, _unit([1.0, 0.00, 0.02, 0.0])),   # dup of 0/1
        (3, _unit(g2)),
        (4, _unit([0.0, 0.02, 1.0, 0.00])),   # dup of 3
        (5, _unit([0.5, 0.5, 0.5, 0.5])),     # loner (cos ~0.7 to both)
        (6, None),                             # NULL vector
        (7, []),                               # empty vector
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_pairs_find_planted_groups(vecs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in SD.semantic_dedup_pairs(vecs, k=3, tau=0.99).collect()
    }
    assert {(0, 1), (0, 2), (1, 2), (3, 4)} <= pairs or (
        # group members may split across cells only if two seeds land
        # inside one group; with k=3 over 6 clean rows the planted
        # groups must still each produce at least one pair
        {(0, 1), (0, 2), (1, 2)} & pairs and (3, 4) in pairs
    )
    # no cross-group or loner pairs at tau=0.99
    for a, b in pairs:
        assert {a, b} <= {0, 1, 2} or {a, b} <= {3, 4}


def test_pairs_deterministic(vecs):
    one = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 9))
        for r in SD.semantic_dedup_pairs(vecs, k=3, tau=0.99).collect()
    )
    two = sorted(
        (r["id_a"], r["id_b"], round(r["cosine"], 9))
        for r in SD.semantic_dedup_pairs(vecs, k=3, tau=0.99).collect()
    )
    assert one == two and one


def test_dedup_keeps_one_per_group_low_rule(vecs):
    kept = SD.semantic_dedup(vecs, k=3, tau=0.99, keep="low")
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # junk rows and the loner always pass through
    assert {5, 6, 7} <= ids
    # exactly one survivor per planted group (components may split
    # only if a group straddles cells; then each shard keeps one)
    g1_survivors = ids & {0, 1, 2}
    g2_survivors = ids & {3, 4}
    assert 1 <= len(g1_survivors) <= 2 and len(g2_survivors) == 1
    # keep='low' picks the component member with the LOWEST cosine to
    # its centroid — verify against an independent recomputation
    cents = SD.seed_centroids(vecs, k=3)
    assign = {
        r["id"]: (r["cell_id"], r["cos_centroid"])
        for r in SD.assign_cells(vecs, cents).collect()
    }
    pairs = SD.semantic_dedup_pairs(vecs, k=3, tau=0.99)
    from data_quality_checker_spark.operators.dedup import (
        duplicate_clusters,
    )
    comps = {}
    for r in duplicate_clusters(pairs).collect():
        comps.setdefault(r["cluster_id"], []).append(r["id"])
    for members in comps.values():
        expect = min(members, key=lambda i: (assign[i][1], i))
        assert expect in ids
        for m in members:
            if m != expect:
                assert m not in ids


def test_dedup_min_id_rule(vecs):
    kept = {
        r["vec_id"]
        for r in SD.semantic_dedup(vecs, k=3, tau=0.99, keep="min_id")
        .select("vec_id")
        .collect()
    }
    # min_id keeps the smallest id of every component
    assert 0 in kept and 3 in kept
    assert 4 not in kept


def test_lloyd_refine_runs_and_dedups(vecs):
    kept = SD.semantic_dedup(
        vecs, k=3, tau=0.99, lloyd_iters=2, dim=4, keep="low"
    )
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert {5, 6, 7} <= ids
    assert len(ids & {3, 4}) == 1
    # refined centroids: still <= k cells, means have the right dim
    cents = SD.lloyd_refine(
        vecs, SD.seed_centroids(vecs, k=3), dim=4, iters=1
    ).collect()
    assert 1 <= len(cents) <= 3
    assert all(len(r["centroid"]) == 4 for r in cents)


def test_cell_sizes_audit(vecs):
    cents = SD.seed_centroids(vecs, k=3)
    sizes = SD.cell_sizes(SD.assign_cells(vecs, cents)).collect()
    assert sum(r["n_members"] for r in sizes) == 6  # clean rows only


def test_dim_pin_parity_and_width_exclusion(vecs, spark):
    """dim= must not change values on a uniform-width corpus (it only
    adds the width filter + enables Lloyd), and wrong-width vectors
    must be excluded rather than NULL-poisoning the zip_with dot."""
    hof = sorted(
        (r["id_a"], r["id_b"], r["cell_id"], r["cosine"])
        for r in SD.semantic_dedup_pairs(vecs, k=3, tau=0.99).collect()
    )
    flat = sorted(
        (r["id_a"], r["id_b"], r["cell_id"], r["cosine"])
        for r in SD.semantic_dedup_pairs(
            vecs, k=3, tau=0.99, dim=4
        ).collect()
    )
    assert hof == flat and flat
    # a 3-wide stray is excluded on the dim=4 path, not a crash
    mixed = vecs.union(
        spark.createDataFrame(
            [(99, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
        )
    )
    out = SD.semantic_dedup_pairs(mixed, k=3, tau=0.99, dim=4).collect()
    assert all(99 not in (r["id_a"], r["id_b"]) for r in out)


def test_arrow_impl_parity(vecs):
    """impl='arrow' (numpy matmul stages) must find the same pair set
    as the relational default, with cosines equal to 6dp (summation
    order differs), and the endpoint must keep the same survivors."""
    sql_pairs = {
        (r["id_a"], r["id_b"], r["cell_id"], round(r["cosine"], 6))
        for r in SD.semantic_dedup_pairs(
            vecs, k=3, tau=0.99, dim=4
        ).collect()
    }
    ar_pairs = {
        (r["id_a"], r["id_b"], r["cell_id"], round(r["cosine"], 6))
        for r in SD.semantic_dedup_pairs(
            vecs, k=3, tau=0.99, dim=4, impl="arrow"
        ).collect()
    }
    assert sql_pairs == ar_pairs and ar_pairs
    kept_sql = {
        r["vec_id"]
        for r in SD.semantic_dedup(vecs, k=3, tau=0.99, dim=4)
        .select("vec_id")
        .collect()
    }
    kept_ar = {
        r["vec_id"]
        for r in SD.semantic_dedup(
            vecs, k=3, tau=0.99, dim=4, impl="arrow"
        )
        .select("vec_id")
        .collect()
    }
    assert kept_sql == kept_ar
    with pytest.raises(ValueError, match="requires dim"):
        SD.semantic_dedup_pairs(vecs, k=2, tau=0.9, impl="arrow")
    with pytest.raises(ValueError, match="impl must be"):
        SD.semantic_dedup_pairs(vecs, k=2, tau=0.9, impl="numpy")


def test_seed_plan_is_distributed_topk(vecs):
    """The seed draw must compile to TakeOrderedAndProject (partial
    per-partition top-k) — a global single-partition sort over the
    corpus would be the one non-scalable stage in the operator."""
    plan = (
        SD.seed_centroids(vecs, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_release_contract_frees_all_storage(vecs, spark):
    """The operator family's documented release contract: consuming a
    result then release_cache()-ing it must leave executor storage
    exactly where it started, for both impls and both endpoints
    (mirrors test_duplicate_clusters_releases_all_storage for the
    lexical twin)."""
    from data_quality_checker_spark.operators.dedup import release_cache

    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    for impl in ("sql", "arrow"):
        pairs = SD.semantic_dedup_pairs(
            vecs, k=3, tau=0.99, dim=4, impl=impl
        )
        assert pairs.count() > 0
        release_cache(pairs)
        kept = SD.semantic_dedup(vecs, k=3, tau=0.99, dim=4, impl=impl)
        assert kept.count() > 0
        release_cache(kept)
    # <=, not ==: the shared session's ContextCleaner may reclaim
    # OTHER tests' dereferenced caches concurrently, shrinking the
    # baseline mid-test; what this pins is that WE added nothing
    assert len(sc._jsc.sc().getRDDStorageInfo()) <= before


def test_validation_errors(vecs):
    with pytest.raises(ValueError, match="requires dim"):
        SD.semantic_dedup_pairs(vecs, k=2, tau=0.9, lloyd_iters=1)
    with pytest.raises(ValueError, match="0 < tau"):
        SD.semantic_dedup_pairs(vecs, k=2, tau=0.0)
    with pytest.raises(ValueError, match="keep must be"):
        SD.semantic_dedup(vecs, k=2, tau=0.9, keep="high")
    with pytest.raises(ValueError, match="k >= 1"):
        SD.seed_centroids(vecs, k=0)


def test_arrow_assignment_centroid_block_chunking(vecs, monkeypatch):
    """The k-scaling guard (VERDICT r04 item 6): with the score-matrix
    budget forced to a single double, every centroid is its own block
    and the running-max loop must still produce exactly the
    single-matmul assignment (same cells, same cosines, same lowest-
    cell tie-break)."""
    full = {
        (r["id"], r["cell_id"], round(r["cos_centroid"], 9))
        for r in SD.assign_cells(
            vecs,
            SD.seed_centroids(vecs, k=3, dim=4),
            dim=4,
            impl="arrow",
        ).collect()
    }
    monkeypatch.setattr(SD, "_SCORE_DOUBLES", 1)
    chunked = {
        (r["id"], r["cell_id"], round(r["cos_centroid"], 9))
        for r in SD.assign_cells(
            vecs,
            SD.seed_centroids(vecs, k=3, dim=4),
            dim=4,
            impl="arrow",
        ).collect()
    }
    assert full == chunked and len(full) > 0
