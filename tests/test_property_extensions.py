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


def _line_dedup_python(
    docs: list[tuple[int, str | None]],
    min_count: int = 2,
    min_line_chars: int = 1,
) -> dict[int, tuple[str | None, int, int]]:
    """Pure-Python mirror of dedup_lines_corpus: global first-(id,pos)
    occurrence of every duplicated eligible line survives."""
    from collections import Counter

    lines: list[tuple[int, int, str]] = []
    for i, t in docs:
        if t is None:
            continue
        for pos, ln in enumerate(t.split("\n")):
            lines.append((i, pos, ln))
    counts = Counter(
        ln for _, _, ln in lines if len(ln) >= min_line_chars
    )
    first: dict[str, tuple[int, int]] = {}
    for i, pos, ln in sorted(lines):
        if len(ln) >= min_line_chars and counts[ln] >= min_count:
            first.setdefault(ln, (i, pos))
    out: dict[int, tuple[str | None, int, int]] = {}
    for i, t in docs:
        if t is None:
            out[i] = (None, 0, 0)
            continue
        kept, removed, total = [], 0, 0
        for pos, ln in enumerate(t.split("\n")):
            total += 1
            dup = (
                len(ln) >= min_line_chars
                and counts[ln] >= min_count
                and first[ln] != (i, pos)
            )
            if dup:
                removed += 1
            else:
                kept.append(ln)
        out[i] = ("\n".join(kept), total, removed)
    return out


_line_alphabet = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "x", "", "boiler plate line"]
)
_line_docs = st.lists(
    st.one_of(
        st.none(),
        st.lists(_line_alphabet, min_size=0, max_size=6).map(
            "\n".join
        ),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_line_docs)
def test_line_dedup_matches_python_mirror(spark, texts):
    from data_quality_checker_spark.operators.dedup import (
        dedup_lines_corpus,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["text_deduped"],
            r["n_lines"],
            r["n_removed"],
        )
        for r in dedup_lines_corpus(df, key_mode="text").collect()
    }
    assert got == _line_dedup_python(docs)


def _dup_spans_python(
    docs: list[tuple[int, str | None]], window: int, stride: int
) -> dict[int, tuple[int, int, int, float]]:
    """Pure-Python mirror of duplicate_spans (min_count=2)."""
    from collections import Counter

    toks = {
        i: t.lower().split() for i, t in docs if t is not None
    }
    spans: list[tuple[int, int, str]] = []
    for i, tk in toks.items():
        if len(tk) < window:
            continue
        for pos in range(0, len(tk) - window + 1, stride):
            spans.append((i, pos, " ".join(tk[pos : pos + window])))
    counts = Counter(s for _, _, s in spans)
    out: dict[int, tuple[int, int, int, float]] = {}
    for i, tk in toks.items():
        if len(tk) < window:
            continue
        mine = [(p, s) for j, p, s in spans if j == i]
        dup_pos = sorted(p for p, s in mine if counts[s] >= 2)
        covered, end = 0, -1
        for p in dup_pos:
            if p >= end:
                covered += window
            else:
                covered += p + window - end
            end = p + window
        out[i] = (
            len(tk),
            len(mine),
            len(dup_pos),
            round(covered / len(tk), 6),
        )
    return out


_span_words = st.sampled_from(["aa", "bb", "cc", "dd"])
_span_docs = st.lists(
    st.one_of(
        st.none(),
        st.lists(_span_words, min_size=0, max_size=14).map(" ".join),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_span_docs)
def test_duplicate_spans_matches_python_mirror(spark, texts):
    from data_quality_checker_spark.operators.dedup import (
        duplicate_spans,
    )

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_windows"],
            r["dup_windows"],
            r["dup_token_frac"],
        )
        for r in duplicate_spans(
            df, window=3, stride=2, key_mode="text"
        ).collect()
    }
    assert got == _dup_spans_python(docs, window=3, stride=2)
