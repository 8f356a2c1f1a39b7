"""Averaged-perceptron POS/NER artifact (plans/postagger.py): training
determinism, closed-class parity with the Catalyst heuristic, suffix
generalization to unseen words, artifact round-trip + non-picklability,
and UDF/Python-mirror parity through the addFile deployment path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import entities as E
from data_quality_checker_spark.plans import postagger as P

_TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "She quickly walked into the beautiful garden yesterday",
    "NASA launched a new rocket from Cape Canaveral in Florida",
    "It is really wonderful and truly amazing to see",
    "The talented engineer carefully designed a reliable system",
    "John Smith visited New York City with Mary Jones",
    "A colorful bird slowly flew over the peaceful valley",
    "The 42 students finished 3.5 hours of difficult homework",
] * 10


def _model(tmpdir) -> str:
    sents = [
        [(t, P.pos_tag_python(t)) for t in P.tokenize(x)] for x in _TEXTS
    ]
    payload = P.train_pos_perceptron(tagged_sents=sents, n_iter=5, seed=42)
    return P.write_pos_model(os.path.join(tmpdir, "pos.json.gz"), payload)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return _model(str(tmp_path_factory.mktemp("posmodel")))


def test_training_deterministic_and_learned(model_path):
    sents = [
        [(t, P.pos_tag_python(t)) for t in P.tokenize(x)] for x in _TEXTS
    ]
    a = P.train_pos_perceptron(tagged_sents=sents, n_iter=5, seed=42)
    b = P.train_pos_perceptron(tagged_sents=sents, n_iter=5, seed=42)
    assert a == b
    tagger = P.load_pos_model(model_path)
    tot = hit = 0
    for x in set(_TEXTS):
        toks = P.tokenize(x)
        for gold, pred in zip(
            [P.pos_tag_python(t) for t in toks], tagger.tag(toks)
        ):
            tot += 1
            hit += gold == pred
    assert hit / tot >= 0.9  # it actually learned the weak labels


def test_closed_class_parity_three_ways(spark, model_path):
    """Function words + numerals: artifact tagger == Python heuristic
    == Catalyst CASE, token for token (the dictionary-routing
    guarantee)."""
    tagger = P.load_pos_model(model_path)
    closed = [w for ws in E.POS_WORD_CLASSES.values() for w in ws]
    closed += ["42", "3.5", "1,000"]
    # artifact vs python heuristic
    assert tagger.tag(closed) == [P.pos_tag_python(w) for w in closed]
    # python heuristic vs the Catalyst CASE
    df = spark.createDataFrame([(w,) for w in closed], ["token"])
    got = {
        r["token"]: r["tag"]
        for r in df.select(
            "token", E.pos_tag_expr(F.col("token")).alias("tag")
        ).collect()
    }
    for w in closed:
        assert got[w] == P.pos_tag_python(w), w


def test_suffix_generalization_unseen_words(model_path):
    """The learned suffix/shape weights extend to words never seen in
    training — the capability the 3-rule CASE heuristic lacks."""
    tagger = P.load_pos_model(model_path)
    s = P.tokenize("the team worked zorply and flumbed a bezzleful doodad")
    tags = dict(zip(s, tagger.tag(s)))
    assert tags["zorply"] == "ADV"
    assert tags["flumbed"] == "VERB"
    assert tags["bezzleful"] == "ADJ"
    assert tags["doodad"] == "NOUN"


def test_artifact_round_trip_and_not_picklable(model_path, tmp_path):
    import pickle

    tagger = P.load_pos_model(model_path)
    with pytest.raises(TypeError, match="not picklable"):
        pickle.dumps(tagger)
    with pytest.raises(ValueError, match="artifact"):
        bad = str(tmp_path / "bad.json.gz")
        import gzip, json

        with gzip.open(bad, "wt") as fh:
            json.dump({"format": "other"}, fh)
        P.load_pos_model(bad)


def test_udf_parity_with_python_mirror(spark, model_path):
    """pos_tags_udf through the real addFile/SparkFiles deployment ==
    pos_tags_python per document; pos_distribution_model matches the
    mirror's aggregate."""
    spark.sparkContext.addFile(model_path)
    rows = [(i, t) for i, t in enumerate(_TEXTS[:8])] + [
        (100, None),
        (101, ""),
        (102, "zorply flumbed bezzleful"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["tags"]
        for r in df.select(
            "doc_id",
            P.pos_tags_udf(F.col("text"), model_path).alias("tags"),
        ).collect()
    }
    tagger = P.load_pos_model(model_path)
    for i, t in rows:
        assert got[i] == P.pos_tags_python(t, tagger), i

    dist = {
        r["pos"]: r["n"]
        for r in P.pos_distribution_model(df, model_path).collect()
    }
    mirror: dict[str, int] = {}
    for _, t in rows:
        for tag in P.pos_tags_python(t, tagger):
            mirror[tag] = mirror.get(tag, 0) + 1
    assert dist == mirror


def test_entity_candidates_model(spark, model_path):
    """Model NER chunks PROPN runs: multiword entities + acronyms
    surface; lowercase text yields nothing."""
    spark.sparkContext.addFile(model_path)
    df = spark.createDataFrame(
        [
            (1, "John Smith visited New York City with Mary Jones"),
            (2, "NASA launched a new rocket"),
            (3, "all lowercase words only here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id"], r["entity"])
        for r in P.entity_candidates_model(df, model_path).collect()
    }
    ents1 = {e for (i, e) in got if i == 1}
    assert "John Smith" in ents1
    assert any("New York City" in e for e in ents1)
    assert (2, "NASA") in got
    assert not {e for (i, e) in got if i == 3}


def test_train_from_dataframe_stride_sample(spark):
    """The df path (weak labels from the corpus itself) trains end to
    end with the stride-capped seeded sample."""
    df = spark.createDataFrame(
        [(i, _TEXTS[i % len(_TEXTS)]) for i in range(60)] + [(999, None)],
        "doc_id long, text string",
    )
    payload = P.train_pos_perceptron(df, sample_docs=40, n_iter=2, seed=7)
    assert payload["format"] == P.FORMAT
    assert "NOUN" in payload["classes"] and payload["weights"]
