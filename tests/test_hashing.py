"""Sketch-function tests: minhash/jaccard/simhash behaviors."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_quality_checker_spark.functions import hashing as H


def test_minhash_md5_matches_python(spark):
    txt = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame([(txt,)], ["text"]).select(
        H.minhash_signature_md5(H.shingles("text", 3), 4).alias("sig")
    )
    sig = df.collect()[0]["sig"]

    toks = txt.lower().split()
    sh = sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    expect = [
        min(hashlib.md5(f"{j}|{s}".encode()).hexdigest() for s in sh)
        for j in range(4)
    ]
    assert sig == expect


def test_jaccard_and_simhash_similarity(spark):
    a = "the cat sat on the mat and looked at the bird outside"
    b = "the cat sat on the mat and looked at the bird inside"
    c = "completely different words entirely unrelated content here now"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], ["id", "text"])
    df = df.select(
        "id",
        H.simhash64("text").alias("sh"),
        H.shingles("text", 2).alias("g"),
    )
    rows = {r["id"]: r for r in df.collect()}
    # jaccard(a,b) high, jaccard(a,c) zero
    jab, jac = (
        spark.createDataFrame(
            [(rows[0]["g"], rows[1]["g"]), (rows[0]["g"], rows[2]["g"])],
            ["x", "y"],
        )
        .select(H.jaccard(F.col("x"), F.col("y")).alias("j"))
        .collect()
    )
    assert jab["j"] > 0.7 and jac["j"] == 0.0

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hamming(rows[0]["sh"], rows[1]["sh"]) < hamming(
        rows[0]["sh"], rows[2]["sh"]
    )


def test_band_keys_bucket_near_dups(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    df = spark.createDataFrame([(0, a), (1, b)], ["id", "text"])
    sig = H.minhash_signature(H.shingles("text", 2), 16)
    out = df.select(
        "id", F.explode(H.band_keys(sig, 8, 2)).alias("bk")
    )
    shared = (
        out.groupBy("bk").count().filter(F.col("count") > 1).count()
    )
    assert shared >= 1  # near-dups share at least one LSH band
