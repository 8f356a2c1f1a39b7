"""Benchmark decontamination (operators/decontam.py): planted exact
n-gram collisions, key-mode parity, edge cases, drop filter, and the
broadcast-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.operators import decontam as DC

EVAL_SENT = (
    "the quick brown fox jumps over the lazy dog near the old river bank"
)  # 13 tokens


def _fixture(spark):
    eval_df = spark.createDataFrame(
        [(100, EVAL_SENT), (101, "completely different benchmark prompt here")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # contains the full 13-token eval sentence verbatim (cased)
            (1, "intro words then The Quick Brown Fox Jumps Over The "
                "Lazy Dog Near The Old River Bank and a tail"),
            # clean long doc, no 13-gram overlap
            (2, "alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau"),
            # shorter than 13 tokens -> zero n-grams, clean
            (3, "too short to carry any thirteen gram at all"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    return docs, eval_df


def test_planted_contamination(spark):
    docs, eval_df = _fixture(spark)
    rep = {
        r["doc_id"]: r
        for r in DC.contamination_report(docs, eval_df, n=13).collect()
    }
    assert set(rep) == {1, 2, 3}  # null-text doc 4 carries no n-grams
    assert rep[1]["contaminated"] and rep[1]["hit_ngrams"] >= 1
    assert not rep[2]["contaminated"] and rep[2]["hit_ngrams"] == 0
    assert rep[3]["n_ngrams"] == 0 and not rep[3]["contaminated"]
    assert 0.0 < rep[1]["contamination_frac"] <= 1.0


def test_key_mode_parity(spark):
    """xxhash64 8-byte keys produce the identical report as raw text
    keys (the scale path vs the oracle-portable path)."""
    docs, eval_df = _fixture(spark)
    a = sorted(
        DC.contamination_report(docs, eval_df, n=5, key_mode="text")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        DC.contamination_report(docs, eval_df, n=5, key_mode="xxhash64")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_prebuilt_eval_table_and_min_hits(spark):
    docs, eval_df = _fixture(spark)
    ev = DC.eval_ngrams(eval_df, n=13, key_mode="xxhash64")
    rep = {
        r["doc_id"]: r
        for r in DC.contamination_report(
            docs, ev, n=13, key_mode="xxhash64", min_hits=1000,
            eval_is_ngrams=True,
        ).collect()
    }
    # hits still counted, but the verdict threshold is not met
    assert rep[1]["hit_ngrams"] >= 1 and not rep[1]["contaminated"]


def test_drop_contaminated(spark):
    docs, eval_df = _fixture(spark)
    kept = DC.drop_contaminated(docs, eval_df, n=13)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # doc 1 dropped; clean docs kept, including the null-text row
    assert ids == {2, 3, 4}


def test_self_contamination_full_overlap(spark):
    """A corpus doc identical to an eval doc has contamination_frac 1."""
    _, eval_df = _fixture(spark)
    corpus = eval_df.withColumn("doc_id", F.col("doc_id") + 1000)
    rep = {
        r["doc_id"]: r
        for r in DC.contamination_report(corpus, eval_df, n=13).collect()
    }
    assert rep[1100]["contamination_frac"] == 1.0
    assert rep[1100]["contaminated"]


def test_broadcast_plan_shape(spark):
    """The eval join must be a broadcast hash join (no sort-merge
    exchange of exploded corpus n-grams)."""
    docs, eval_df = _fixture(spark)
    plan = (
        DC.contamination_report(docs, eval_df, n=5, key_mode="xxhash64")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_broadcast_guard_fallback_plan(spark):
    """broadcast=None takes a row-count guard: over the key threshold
    the eval join must FALL BACK to a shuffled join (no forced
    BroadcastHashJoin that could OOM the build side); under it the
    broadcast hint applies. Results are identical either way."""
    docs, eval_df = _fixture(spark)

    def plan_of(**kw):
        return (
            DC.contamination_report(
                docs, eval_df, n=5, key_mode="xxhash64", **kw
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    # guard trips (threshold 0 keys) -> no broadcast hint; pin the
    # autoBroadcastJoinThreshold off so Catalyst can't re-broadcast
    # the tiny test table on its own and hide the fallback
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fallback = plan_of(broadcast=None, broadcast_max_keys=0)
        assert "SortMergeJoin" in fallback or "ShuffledHashJoin" in fallback
        forced_off = plan_of(broadcast=False)
        assert (
            "SortMergeJoin" in forced_off
            or "ShuffledHashJoin" in forced_off
        )
        # forced hint still wins over the disabled threshold
        assert "BroadcastHashJoin" in plan_of(broadcast=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # guard passes (tiny eval) -> broadcast
    assert "BroadcastHashJoin" in plan_of(
        broadcast=None, broadcast_max_keys=5_000_000
    )
    # verdict parity across strategies
    a = sorted(
        tuple(r)
        for r in DC.contamination_report(
            docs, eval_df, n=5, key_mode="xxhash64", broadcast=True
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in DC.contamination_report(
            docs, eval_df, n=5, key_mode="xxhash64", broadcast=False
        ).collect()
    )
    assert a == b


def test_key_mode_validation(spark):
    """A typo'd key_mode must raise loudly, not silently report every
    document clean; a prebuilt eval table with the wrong key dtype for
    the requested mode likewise."""
    import pytest

    docs, eval_df = _fixture(spark)
    with pytest.raises(ValueError, match="key_mode"):
        DC.contamination_report(docs, eval_df, key_mode="xxhash")
    ev_txt = DC.eval_ngrams(eval_df, n=5, key_mode="text")
    with pytest.raises(ValueError, match="ng_key"):
        DC.contamination_report(
            docs, ev_txt, n=5, key_mode="xxhash64", eval_is_ngrams=True
        )
    ev_hash = DC.eval_ngrams(eval_df, n=5, key_mode="xxhash64")
    with pytest.raises(ValueError, match="ng_key"):
        DC.contamination_report(
            docs, ev_hash, n=5, key_mode="text", eval_is_ngrams=True
        )


def test_metrics_schema_stable_without_decontam(spark):
    """partition_metrics always emits drop_contaminated (0 when the
    stage didn't run) so resumed runs with the stage toggled never mix
    parquet schemas in one metrics directory."""
    from data_quality_checker_spark.plans import synth
    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        partition_metrics,
        score_pages,
    )

    scored = score_pages(synth.pages_df(spark, 40, seed=11),
                         PipelineConfig(num_buckets=4))
    m = partition_metrics(scored, "run-x")
    assert "drop_contaminated" in m.columns
    assert m.agg(F.sum("drop_contaminated")).collect()[0][0] == 0


def test_pipeline_decontam_stage(spark):
    """with_decontam_verdict over a scored synthetic corpus: a kept
    page whose text contains an eval 13-gram loses keep_final, clean
    pages keep theirs, and run_pipeline(decontam_eval=...) lands the
    contaminated column + drop_contaminated metric."""
    import tempfile

    from data_quality_checker_spark.plans import synth
    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
        score_pages,
        with_decontam_verdict,
    )

    base = synth.pages_df(spark, 120, seed=37)
    scored = score_pages(base, PipelineConfig())
    # eval corpus = the raw text of two pages the rules keep
    kept2 = scored.filter("keep").select("text").limit(2)
    eval_df = spark.createDataFrame(
        [(r["text"],) for r in kept2.collect()], ["text"]
    )
    out = with_decontam_verdict(scored, eval_df, PipelineConfig())
    assert {"contaminated", "keep_final"} <= set(out.columns)
    n_contam = out.filter("contaminated").count()
    assert n_contam >= 2  # the two eval-source pages at minimum
    assert (
        out.filter("contaminated and keep_final").count() == 0
    )
    assert (
        out.filter("not contaminated")
        .filter(F.col("keep_final") != F.col("keep"))
        .count()
        == 0
    )

    with tempfile.TemporaryDirectory() as d:
        run_pipeline(
            spark,
            base,
            f"{d}/out",
            PipelineConfig(num_buckets=8),
            decontam_eval=eval_df,
        )
        scored_disk = spark.read.parquet(f"{d}/out/scored")
        assert "contaminated" in scored_disk.columns
        m = spark.read.parquet(f"{d}/out/metrics")
        assert "drop_contaminated" in m.columns
        total = m.agg(F.sum("drop_contaminated")).collect()[0][0]
        assert total == n_contam


def test_decontam_verdict_broadcast_guard(spark):
    """The contaminated-url join-back in with_decontam_verdict takes a
    row-count guard (guarded_bad_set): a pathological eval set — the
    kept corpus's own text with decontam_ngram=1, min_hits=1 — makes
    EVERY kept page contaminated, so `bad` is corpus-sized and must
    not force a broadcast build over the threshold. Verdicts are
    identical under both strategies, and the fallback plan joins back
    without the broadcast hint (shuffle join)."""
    from data_quality_checker_spark.plans import synth
    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        score_pages,
        with_decontam_verdict,
    )

    base = synth.pages_df(spark, 80, seed=41)
    cfg = PipelineConfig(decontam_ngram=1, decontam_min_hits=1)
    scored = score_pages(base, cfg)
    eval_df = scored.filter("keep").select("text")

    def verdicts(**kw):
        out = with_decontam_verdict(scored, eval_df, cfg, **kw)
        rows = sorted(
            (r["url"], r["contaminated"], r["keep_final"])
            for r in out.select(
                "url", "contaminated", "keep_final"
            ).collect()
        )
        plan = (
            out._jdf.queryExecution().executedPlan().toString()
        )
        for dep in getattr(out, "_cached_deps", ()):
            dep.unpersist()
        return rows, plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # pin auto-broadcast off so Catalyst can't hide the fallback
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bc_rows, bc_plan = verdicts()  # guard passes -> hinted
        fb_rows, fb_plan = verdicts(broadcast_max_bad=0)  # guard trips
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    assert bc_rows == fb_rows
    # sanity: the adversarial eval really contaminated every kept page
    n_kept = scored.filter("keep").count()
    assert n_kept > 0
    assert sum(1 for _, c, _ in bc_rows if c) == n_kept
    assert all(not kf for _, c, kf in bc_rows if c)
    # fallback plan shuffles the join-back instead of broadcasting
    assert "SortMergeJoin" in fb_plan or "ShuffledHashJoin" in fb_plan
    assert (
        "SortMergeJoin" not in bc_plan
        and "ShuffledHashJoin" not in bc_plan
    )


def test_dedup_lines_corpus(spark):
    """C4-style line dedup: the boilerplate line survives only at its
    first (id, pos) occurrence; empty lines are structure and never
    removed; NULL text passes through; both key modes agree."""
    from data_quality_checker_spark.operators.dedup import (
        dedup_lines_corpus,
    )

    boiler = "subscribe to our newsletter"
    rows = [
        (1, f"alpha one\n{boiler}\n\nbody of doc one"),
        (2, f"{boiler}\nbeta two"),
        (3, f"gamma three\n\n{boiler}"),
        (4, "unique only\n\nno boilerplate here"),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup_lines_corpus(docs).collect()
    }
    # doc 1 holds the canonical (min id, pos) copy -> unchanged
    assert out[1]["text_deduped"] == rows[0][1]
    assert out[1]["n_removed"] == 0 and out[1]["n_lines"] == 4
    # later copies removed, order + empty lines preserved
    assert out[2]["text_deduped"] == "beta two"
    assert out[2]["n_removed"] == 1
    assert out[3]["text_deduped"] == "gamma three\n"
    assert out[3]["n_removed"] == 1
    assert out[4]["text_deduped"] == rows[3][1]
    assert out[5]["text_deduped"] is None and out[5]["n_lines"] == 0

    a = sorted(
        (r["doc_id"], r["text_deduped"])
        for r in dedup_lines_corpus(docs, key_mode="text").collect()
    )
    b = sorted(
        (r["doc_id"], r["text_deduped"])
        for r in dedup_lines_corpus(docs).collect()
    )
    assert a == b


def test_dedup_lines_min_count_and_min_chars(spark):
    from data_quality_checker_spark.operators.dedup import (
        dedup_lines_corpus,
    )

    docs = spark.createDataFrame(
        [(1, "dup\nx\ndup"), (2, "dup\nyy")], ["doc_id", "text"]
    )
    # min_count=4: nothing reaches the bar
    out = dedup_lines_corpus(docs, min_count=4).collect()
    assert all(r["n_removed"] == 0 for r in out)
    # min_line_chars=4 exempts the 3-char 'dup' line
    out = dedup_lines_corpus(docs, min_line_chars=4).collect()
    assert all(r["n_removed"] == 0 for r in out)
    # default: doc 1 keeps its first copy (intra-doc dedup too)
    out = {
        r["doc_id"]: r for r in dedup_lines_corpus(docs).collect()
    }
    assert out[1]["text_deduped"] == "dup\nx"
    assert out[2]["text_deduped"] == "yy"


def test_eval_ngrams_storage_path(spark, tmp_path_factory):
    """storage_path materializes the eval key table as parquet; the
    reloaded table gives identical contamination verdicts."""
    d = str(tmp_path_factory.mktemp("evng"))
    docs, eval_df = _fixture(spark)
    ev = DC.eval_ngrams(
        eval_df, n=13, key_mode="xxhash64", storage_path=f"{d}/keys"
    )
    import os

    assert os.path.isdir(f"{d}/keys")
    a = sorted(
        tuple(r)
        for r in DC.contamination_report(
            docs, ev, n=13, key_mode="xxhash64", eval_is_ngrams=True
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in DC.contamination_report(
            docs, eval_df, n=13, key_mode="xxhash64"
        ).collect()
    )
    assert a == b


def test_snapshot_diff_classification(spark):
    from data_quality_checker_spark.operators.joins import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "gone"), (5, None),
         (6, None), (7, "")],
        ["url", "text"],
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new"), (5, None),
         (6, ""), (7, None)],
        ["url", "text"],
    )
    got = {
        r["url"]: r["status"]
        for r in snapshot_diff(old, new, key="url").collect()
    }
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",  # null == null via the <NULL> sentinel
        6: "changed",  # NULL -> '' is a change, not md5('')==md5('')
        7: "changed",  # '' -> NULL likewise
    }


def test_contamination_report_empty_eval(spark):
    """An empty eval corpus flags nothing (left join against an empty
    broadcast table)."""
    docs, _ = _fixture(spark)
    empty_eval = spark.createDataFrame([], "text string")
    rep = DC.contamination_report(docs, empty_eval, n=13).collect()
    assert rep and all(not r["contaminated"] for r in rep)


def test_duplicate_spans(spark):
    """Planted exact-substring duplication: two docs share a >=window
    token run; a third is clean; self-repetition also counts."""
    from data_quality_checker_spark.operators.dedup import duplicate_spans

    shared = "one two three four five six seven eight"  # 8 tokens
    rows = [
        (1, f"intro {shared} closing words here"),
        (2, f"{shared} different ending entirely now"),
        (3, "totally unrelated text with many novel words inside it"),
        # self-repetition: the same 8-gram twice within one doc
        (4, f"{shared} middle filler {shared}"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in duplicate_spans(
            docs, window=8, stride=1, key_mode="text"
        ).collect()
    }
    assert got[1]["dup_windows"] >= 1 and got[1]["dup_token_frac"] > 0
    assert got[2]["dup_windows"] >= 1
    assert got[3]["dup_windows"] == 0 and got[3]["dup_token_frac"] == 0.0
    assert got[4]["dup_windows"] >= 2  # both copies flagged
    # coverage never exceeds 1
    assert all(r["dup_token_frac"] <= 1.0 for r in got.values())
    # parity: xxhash64 keys give the same report
    h = {
        r["doc_id"]: tuple(r)
        for r in duplicate_spans(docs, window=8, stride=1).collect()
    }
    assert h == {k: tuple(v) for k, v in got.items()}


def test_chunk_documents(spark):
    from data_quality_checker_spark.operators.chunking import (
        chunk_documents,
    )

    text10 = " ".join(f"t{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text10), (2, "a b"), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    got = sorted(
        tuple(r)
        for r in chunk_documents(
            docs, max_tokens=4, overlap=1
        ).collect()
    )
    assert got == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t3 t4 t5 t6", 4),
        (1, 2, "t6 t7 t8 t9", 4),
        (2, 0, "a b", 2),
    ]
    # full coverage: every token appears in some chunk
    toks = set()
    for _, _, ct, _ in got:
        toks.update(ct.split())
    assert {f"t{i}" for i in range(10)} <= toks
    # no-overlap exact tiling
    flat = chunk_documents(docs, max_tokens=5, overlap=0).collect()
    one = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in flat
        if r["doc_id"] == 1
    )
    assert one == [(0, "t0 t1 t2 t3 t4"), (1, "t5 t6 t7 t8 t9")]
    # trailing chunk fully contained in the previous one is suppressed
    nine = spark.createDataFrame(
        [(1, " ".join(f"x{i}" for i in range(9)))], ["doc_id", "text"]
    )
    ch = chunk_documents(nine, max_tokens=8, overlap=7).collect()
    assert max(r["chunk_id"] for r in ch) == 1
    assert ch[-1]["n_tokens"] <= 8
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=4, overlap=4)


def test_pack_sequences(spark):
    """Concat-and-split packing invariants on a hand-checkable corpus:
    exact span arithmetic in one bucket, zero internal padding, full
    token conservation, boundary-crossing docs split correctly, and
    loader-reassembly offsets that tile each document."""
    from data_quality_checker_spark.operators.chunking import (
        pack_sequences,
    )

    # one bucket, doc_id order, max_tokens=8; docs of 5/6/4/10 tokens
    docs = spark.createDataFrame(
        [
            (1, " ".join("a" * 1 for _ in range(5))),
            (2, " ".join("b" for _ in range(6))),
            (3, " ".join("c" for _ in range(4))),
            (4, " ".join("d" for _ in range(10))),
            (5, None),
            (6, ""),
        ],
        ["doc_id", "text"],
    )
    from pyspark.sql import functions as F

    rows = sorted(
        (r["doc_id"], r["seq_in_bucket"], r["doc_token_start"],
         r["n_tokens_in_seq"])
        for r in pack_sequences(
            docs,
            max_tokens=8,
            bucket_col=F.lit(0),
            order_col=F.col("doc_id"),
        ).collect()
    )
    # stream: d1[0..5) d2[5..11) d3[11..15) d4[15..25); seqs of 8:
    # s0=[0,8): d1 all 5 + d2 first 3; s1=[8,16): d2 last 3 + d3 all 4
    #  + d4 first 1; s2=[16,24): d4 next 8; s3=[24,25): d4 last 1
    assert rows == [
        (1, 0, 0, 5),
        (2, 0, 0, 3),
        (2, 1, 3, 3),
        (3, 1, 0, 4),
        (4, 1, 0, 1),
        (4, 2, 1, 8),
        (4, 3, 9, 1),
    ]
    # conservation: per-doc sum of n_tokens_in_seq == n_tokens_doc,
    # and doc_token_start offsets tile [0, n) contiguously
    from collections import defaultdict

    spans = defaultdict(list)
    for did, _, st, n in rows:
        spans[did].append((st, n))
    for did, sp in spans.items():
        sp.sort()
        assert sp[0][0] == 0
        for (s1, n1), (s2, _) in zip(sp, sp[1:]):
            assert s1 + n1 == s2, (did, sp)
    # every sequence except the bucket-final one is exactly full
    per_seq = defaultdict(int)
    for _, seq, _, n in rows:
        per_seq[seq] += n
    last = max(per_seq)
    assert all(v == 8 for s, v in per_seq.items() if s != last)

    # default hash bucketing: deterministic across invocations and
    # conserving at a larger scale
    big = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i % 37 + 1))) for i in range(500)],
        ["doc_id", "text"],
    )
    a = pack_sequences(big, max_tokens=32, num_buckets=8)
    b = pack_sequences(big, max_tokens=32, num_buckets=8)
    la = sorted(map(tuple, a.collect()))
    assert la == sorted(map(tuple, b.collect()))
    tot = sum(r[5] for r in la)  # n_tokens_in_seq
    exp = sum(i % 37 + 1 for i in range(500))
    assert tot == exp
