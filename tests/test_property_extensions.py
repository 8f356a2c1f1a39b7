"""Property tests for the round-3 portable primitives: extended PII
scrub, Luhn counting, punctuation folding, and the deterministic
sampling predicate — each pinned against its pure-Python mirror on
adversarial random strings (same batched one-job-per-corpus pattern
as test_property_oracle.py)."""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_quality_checker_spark.functions.text import (
    normalize_punctuation,
    normalize_punctuation_python,
)
from data_quality_checker_spark.plans.sampling import hash_frac_predicate
from data_quality_checker_spark.plans.scrub import (
    SCRUB_PATTERNS_EXTENDED,
    luhn_valid_count,
    luhn_valid_python,
    scrub_expr,
    scrub_python,
)

# digit-heavy alphabet so card/ssn/phone/ip shapes actually occur,
# plus the punctuation-folding specials and unicode probes
_ALPHABET = (
    string.digits * 3
    + "-. ()@+:"
    + string.ascii_letters
    + " \n\t\r"
    + "‘’“”–—… ´é漢"
)

_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=_ALPHABET, min_size=0, max_size=120),
        # seeded realistic shapes
        st.sampled_from(
            [
                "4111-1111-1111-1111 x 123-45-6789",
                "call +1 555 123 4567 at 10.0.0.1",
                "2001:db8:85a3:0:0:8a2e:370:7334 end",
                "378282246310005 and 4111111111111112",
                "a@b.co ‘q’ … 12.34.56.78",
            ]
        ),
    ),
    min_size=1,
    max_size=24,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_texts)
def test_extended_scrub_and_luhn_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id",
        scrub_expr("text", SCRUB_PATTERNS_EXTENDED).alias("s"),
        luhn_valid_count("text").alias("luhn"),
        normalize_punctuation("text").alias("norm"),
    ).collect()
    for r in rows:
        t = texts[r["id"]]
        assert r["s"] == scrub_python(t, SCRUB_PATTERNS_EXTENDED), repr(t)
        assert r["luhn"] == luhn_valid_python(t), repr(t)
        assert r["norm"] == normalize_punctuation_python(t), repr(t)


@settings(max_examples=8, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0))
def test_hash_frac_matches_python_mirror(spark, p):
    """The sampling predicate reproduces byte-for-byte in Python:
    md5 hex prefix < %013x-formatted floor(p * 2^52) threshold."""
    import hashlib
    import math

    df = spark.range(0, 400).select(F.col("id"))
    kept = {
        r["id"]
        for r in df.filter(hash_frac_predicate(F.col("id"), p)).collect()
    }
    thresh = format(math.floor(p * float(2**52)), "013x")
    expect = {
        i
        for i in range(400)
        if p >= 1.0
        or hashlib.md5(str(i).encode()).hexdigest()[:13] < thresh
    }
    assert kept == expect
