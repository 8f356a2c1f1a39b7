"""Extended PII scrub (plans/scrub.py SCRUB_PATTERNS_EXTENDED) and the
Luhn checksum gate: known card vectors, Python-mirror parity, and the
invariant that the DEFAULT scrub chain is untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans.scrub import (
    SCRUB_PATTERNS,
    SCRUB_PATTERNS_EXTENDED,
    luhn_valid_count,
    luhn_valid_python,
    scrub_expr,
    scrub_python,
)

SAMPLE = (
    "mail a@b.com card 4111-1111-1111-1111 ssn 123-45-6789 "
    "call +1 555-123-4567 at 10.0.0.1 or 2001:db8:85a3:0:0:8a2e:370:7334 "
    "bad card 4111-1111-1111-1112"
)


def test_default_patterns_unchanged():
    """The golden byte-identity contract rides on the base chain —
    it must stay exactly (email, phone, ip)."""
    assert tuple(n for n, _, _ in SCRUB_PATTERNS) == ("email", "phone", "ip")
    assert len(SCRUB_PATTERNS_EXTENDED) == 6
    assert tuple(n for n, _, _ in SCRUB_PATTERNS_EXTENDED) == (
        "email", "ccn", "ssn", "phone", "ip", "ipv6",
    )


def test_extended_scrub_spark_matches_python(spark):
    df = spark.createDataFrame([(1, SAMPLE), (2, None), (3, "clean")],
                               ["id", "text"])
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", scrub_expr("text", SCRUB_PATTERNS_EXTENDED).alias("s")
        ).collect()
    }
    assert got[1] == scrub_python(SAMPLE, SCRUB_PATTERNS_EXTENDED)
    assert got[2] is None
    assert got[3] == "clean"
    for token in ("<EMAIL>", "<CCN>", "<SSN>", "<PHONE>", "<IP>", "<IPV6>"):
        assert token in got[1], token
    # no raw PII survives
    assert "4111" not in got[1] and "123-45-6789" not in got[1]


def test_luhn_known_vectors(spark):
    rows = [
        (1, "4111-1111-1111-1111"),          # valid Visa test PAN
        (2, "4111-1111-1111-1112"),          # checksum off by one
        (3, "378282246310005"),              # valid 15-digit Amex
        (4, "x 4111111111111111 y 5500-0000-0000-0004 z"),  # both valid
        (5, "no cards at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", luhn_valid_count("text").alias("n")
        ).collect()
    }
    expect = {i: luhn_valid_python(t) for i, t in rows}
    assert got == expect
    assert got[1] == 1 and got[2] == 0 and got[3] == 1
    assert got[4] == 2 and got[5] == 0 and got[6] == 0


def test_base_scrub_unaffected_by_extension(spark):
    """scrub_expr with no patterns argument must produce the same
    bytes it always did (golden fixtures in test_pipeline.py also pin
    this end-to-end)."""
    df = spark.createDataFrame([(1, SAMPLE)], ["id", "text"])
    got = df.select(scrub_expr("text").alias("s")).collect()[0]["s"]
    assert got == scrub_python(SAMPLE)
    # base chain does NOT know about ccn/ssn/ipv6
    assert "<CCN>" not in got and "<SSN>" not in got
