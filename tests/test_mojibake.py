"""Mojibake repair (plans/mojibake.py): table validity against a real
cp1252 round-trip, Catalyst-vs-Python parity, and null/no-op
behavior."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_quality_checker_spark.plans.mojibake import (
    MOJIBAKE_TABLE,
    fix_mojibake_py,
    with_mojibake_fix,
)

_JAVA_C1 = (0x81, 0x8D, 0x8F, 0x90, 0x9D)


def test_table_is_the_cp1252_misdecode_of_each_char():
    """Every corrupted sequence must be EXACTLY the repaired char's
    UTF-8 bytes mis-decoded as cp1252 (Java semantics: undefined
    cp1252 bytes map to their C1 control), and no entry may be a
    prefix of a later entry (it would eat the longer match)."""
    for bad, good in MOJIBAKE_TABLE:
        # the NBSP entry repairs to a plain space by convention, but
        # the corrupted sequence is NBSP's own mis-decode
        target = " " if good == " " else good
        raw = target.encode("utf-8")
        try:
            expect = raw.decode("cp1252")
        except UnicodeDecodeError:
            expect = "".join(
                bytes([b]).decode("cp1252")
                if b not in _JAVA_C1
                else chr(b)
                for b in raw
            )
        assert bad == expect, (repr(bad), repr(expect), repr(good))
    for i, (b1, _) in enumerate(MOJIBAKE_TABLE):
        for b2, _ in MOJIBAKE_TABLE[i + 1:]:
            assert not b2.startswith(b1), (repr(b1), repr(b2))


def test_repair_unit(spark):
    rows = [
        (0, "donâ€™t say â€œcafÃ©â€ â€” ever"),
        (1, "plain ascii stays."),
        (2, "already fixed: don’t — café"),
        (3, None),
        (4, "symbols Â© Â» 25Â° and Â tight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in with_mojibake_fix(df).collect()}
    assert out[0]["text_fixed"] == "don’t say “café” — ever"
    assert out[0]["had_mojibake"]
    assert out[1]["text_fixed"] == rows[1][1]
    assert not out[1]["had_mojibake"]
    assert out[2]["text_fixed"] == rows[2][1]
    assert not out[2]["had_mojibake"]
    assert out[3]["text_fixed"] is None
    assert not out[3]["had_mojibake"]
    assert out[4]["text_fixed"] == "symbols © » 25° and  tight"
    assert out[4]["had_mojibake"]


_BADS = [b for b, _ in MOJIBAKE_TABLE]
_ALPHABET = "abc . Ã¢â€¦Â©é’“ \n\t"

_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=_ALPHABET, min_size=0, max_size=80),
        st.sampled_from(_BADS),
        st.sampled_from(
            ["".join(_BADS), "xÃ©y" * 10, "â" * 5, "Ã" * 5, "â‚¬1Â£2"]
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
def test_repair_matches_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = with_mojibake_fix(df).collect()
    for r in rows:
        t = texts[r["id"]]
        assert r["text_fixed"] == fix_mojibake_py(t), repr(t)
