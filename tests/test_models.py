"""SparkFiles model-distribution path: a REAL artifact (gzip wordlist
langid model) shipped via addFile, loaded worker-side inside the
iterator pandas UDF, with a non-picklable model object — proving the
fastText/KenLM slot plumbing with something this sandbox can run."""

from __future__ import annotations

import pickle

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.functions import text as X
from data_quality_checker_spark.plans import models, udfs


def test_artifact_roundtrip_and_nonpicklable(tmp_path):
    path = models.write_langid_model(str(tmp_path / "langid.model.gz"))
    m = models.load_langid_model(path)
    assert m.predict("the quick brown fox and the dog") == "en"
    assert m.predict(None) == "und"
    # real model semantics: loaded handles never pickle — accidental
    # closure capture must fail loudly, not serialize per task
    with pytest.raises(TypeError, match="not picklable"):
        pickle.dumps(m)
    with pytest.raises(ValueError, match="artifact"):
        bad = str(tmp_path / "bad.gz")
        import gzip, json  # noqa: E401

        with gzip.open(bad, "wt") as fh:
            json.dump({"format": "other"}, fh)
        models.load_langid_model(bad)


def test_langid_model_path_parity_on_fixture_corpus(spark, sf_dir, tmp_path):
    """Default-weights model through addFile + SparkFiles must agree
    row-for-row with BOTH the pure-SQL heuristic and the UDF fallback
    on the fixture corpus (VERDICT r01 item 8)."""
    path = models.write_langid_model(str(tmp_path / "langid_par.model.gz"))
    spark.sparkContext.addFile(path)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.select(
        udfs.langid_udf(F.col("text"), model_path=path).alias("model_lang"),
        udfs.langid_udf(F.col("text")).alias("heur_lang"),
        X.langid_best("text").alias("sql_lang"),
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["model_lang"] == r["heur_lang"] == r["sql_lang"], r


def test_langid_custom_weights_actually_drive_predictions(spark, tmp_path):
    """A weighted artifact must CHANGE predictions (no silent fallback
    to the heuristic when the model loads)."""
    path = models.write_langid_model(
        str(tmp_path / "langid_w.model.gz"),
        weights={"en": {"the": 1.0}, "xx": {"zz": 5.0}},
    )
    spark.sparkContext.addFile(path)
    df = spark.createDataFrame(
        [("zz zz the cat",), ("the the zz",), (None,)], "text string"
    )
    got = [
        r["lang"]
        for r in df.select(
            udfs.langid_udf(F.col("text"), model_path=path).alias("lang")
        ).collect()
    ]
    # zz outweighs the 5:1 -> 'xx'; two 'the' beat one zz? no: zz=5.0
    assert got == ["xx", "xx", "und"]


def test_trigram_lm_artifact_parity_with_dataframe_scorer(
    spark, sf_dir, tmp_path
):
    """The artifact/UDF scoring path must agree row-for-row with the
    DataFrame scoring path (same trained counts, same smoothing)."""
    import pytest as _pt

    from data_quality_checker_spark.plans import lm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tri, bi, v = lm.train_trigram_counts(docs.filter("doc_id < 100"))
    path = lm.write_trigram_lm(str(tmp_path / "tri.lm.gz"), tri, bi, v)
    spark.sparkContext.addFile(path)

    score = docs.filter("doc_id >= 100 and doc_id < 200")
    df_scores = {
        r["id"]: r["perplexity"]
        for r in lm.perplexity_df(score, tri, bi, v).collect()
    }
    got = {
        r["doc_id"]: r["ppl"]
        for r in score.select(
            "doc_id", udfs.perplexity_udf(F.col("text"), path).alias("ppl")
        ).collect()
    }
    assert set(got) == set(df_scores) and len(got) == 100
    for k, val in df_scores.items():
        if val is None:
            assert got[k] is None
        else:
            assert got[k] == _pt.approx(val, rel=1e-9), k

    # the loaded model is deliberately non-picklable (KenLM semantics)
    import pickle

    m = lm.load_trigram_lm(path)
    with pytest.raises(TypeError, match="not picklable"):
        pickle.dumps(m)
    # in-domain text scores lower perplexity than out-of-domain gibberish
    sample = docs.filter("doc_id < 5 and text is not null").first()["text"]
    assert m.perplexity(sample) < m.perplexity(
        "zzq qqz xqx " * 20
    )


def test_write_trigram_lm_min_count_prunes_and_guards(spark, tmp_path):
    """min_count prunes singleton grams pre-collect (KenLM --prune
    semantics: pruned grams score as unseen); max_rows fails fast
    instead of OOMing the driver mid-collect."""
    from data_quality_checker_spark.plans import lm

    corpus = spark.createDataFrame(
        [("a b c a b c a b c",), ("x y z",)], "text string"
    )
    tri, bi, v = lm.train_trigram_counts(corpus)
    pruned_path = lm.write_trigram_lm(
        str(tmp_path / "pruned.lm.gz"), tri, bi, v, min_count=2
    )
    m = lm.load_trigram_lm(pruned_path)
    assert "a b c" in m.tri            # count 3 survives
    assert "x y z" not in m.tri        # singleton pruned
    assert all(n >= 2 for n in m.tri.values())
    assert all(n >= 2 for n in m.bi.values())
    # pruned grams fall back to the add-one mass -> the pruned model
    # scores 'x y z' strictly worse than the unpruned model
    full = lm.load_trigram_lm(
        lm.write_trigram_lm(str(tmp_path / "full.lm.gz"), tri, bi, v)
    )
    assert m.perplexity("x y z") > full.perplexity("x y z")
    assert m.perplexity("a b c a b c") == full.perplexity("a b c a b c")
    import pytest as _pt

    with _pt.raises(ValueError, match="max_rows"):
        lm.write_trigram_lm(
            str(tmp_path / "guard.lm.gz"), tri, bi, v, max_rows=1
        )


def test_load_langid_model_rejects_non_gzip_json(tmp_path):
    """A fastText .bin (or any non-gzip-json file) handed to the
    gzip-json loader must fail with an ACTIONABLE error naming the
    correct route, not a worker-side BadGzipFile (review r5: the
    config comment used to invite exactly this mistake)."""
    import pytest

    from data_quality_checker_spark.plans.models import load_langid_model

    bogus = tmp_path / "lid.176.bin"
    bogus.write_bytes(b"\xba\xd0\x0d fastText binary-ish bytes")
    with pytest.raises(ValueError, match="SPARK_DQC_FASTTEXT_MODEL"):
        load_langid_model(str(bogus))
