"""C4 line cleaning (plans/lineclean.py) and Gopher document signals
(plans/gopher.py): deterministic unit cases plus property parity
against the pure-Python mirrors (same batched one-job-per-corpus
pattern as test_property_extensions.py)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_quality_checker_spark.plans.gopher import (
    gopher_signal_exprs,
    gopher_signals_py,
    with_gopher_signals,
)
from data_quality_checker_spark.plans.lineclean import (
    c4_clean_exprs,
    c4_clean_py,
    with_c4_clean,
)

_PAGE_GOOD = (
    "This is the first sentence of the page.\n"
    "Here is another sentence that ends with a question mark?\n"
    "We have written a third one to be safe.\n"
    "And that sentence makes four of them.\n"
    "Finally the fifth sentence closes the page."
)

_PAGE_MESSY = (
    "Home | About | Contact\n"          # no terminal punct -> dropped
    "Enable javascript to continue.\n"   # javascript line -> dropped
    "Click here\n"                       # short + no punct -> dropped
    "This genuine sentence survives the cleaning pass.\n"
    "So does this one, because it also ends properly.\n"
    "ok.\n"                              # < 3 words -> dropped
)


def test_c4_clean_unit(spark):
    df = spark.createDataFrame(
        [
            (0, _PAGE_GOOD),
            (1, _PAGE_MESSY),
            (2, "Lorem Ipsum dolor sit amet. " * 6),
            (3, "function f() { return 1; } and prose around it."),
            (4, None),
            (5, "No terminal punctuation anywhere at all\nstill none"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_c4_clean(df).collect()}
    assert rows[0]["c4_keep"] and rows[0]["text_c4"] == _PAGE_GOOD
    assert rows[0]["c4_n_lines"] == rows[0]["c4_n_lines_kept"] == 5
    # messy page: only the two genuine sentences survive, and the page
    # then fails the 5-sentence bar
    assert rows[1]["c4_n_lines"] == 6 and rows[1]["c4_n_lines_kept"] == 2
    assert rows[1]["c4_too_few_sentences"] and not rows[1]["c4_keep"]
    assert rows[2]["c4_lorem_ipsum"] and not rows[2]["c4_keep"]
    assert rows[3]["c4_curly_brace"] and not rows[3]["c4_keep"]
    assert rows[4]["text_c4"] is None and not rows[4]["c4_keep"]
    assert rows[5]["c4_n_lines_kept"] == 0 and rows[5]["text_c4"] == ""


def test_gopher_signals_unit(spark):
    prose = (
        "The results have to be read with care, and we note that the "
        "methods of this report are consistent with those of prior "
        "work on the subject."
    )
    bullets = "\n".join(f"• item {i} in the list" for i in range(10))
    trailing = "\n".join(f"this line trails off number {i}..." for i in range(10))
    hashes = "# # # # # # tag soup " * 5
    digits = "12345 67890 11111 22222 33333 44444 55555"
    df = spark.createDataFrame(
        [(0, prose), (1, bullets), (2, trailing), (3, hashes),
         (4, digits), (5, None), (6, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_gopher_signals(df).collect()}
    assert rows[0]["gopher_keep"]
    assert rows[0]["gopher_required_stop_hits"] >= 4
    assert rows[1]["gopher_bullet_line_frac"] == 1.0
    assert not rows[1]["gopher_keep"]
    assert rows[2]["gopher_ellipsis_line_frac"] == 1.0
    assert not rows[2]["gopher_keep"]
    assert rows[3]["gopher_symbol_word_ratio"] > 0.1
    assert not rows[3]["gopher_keep"]
    assert rows[4]["gopher_alpha_word_frac"] == 0.0
    assert not rows[4]["gopher_keep"]
    assert not rows[5]["gopher_keep"] and not rows[6]["gopher_keep"]
    assert rows[6]["gopher_required_stop_hits"] == 0


_ALPHABET = (
    "the of and to be that have with a b c . ! ? \" ” … # { } \n "
    "• - * lorem ipsum javascript 0123456789\t "
)

_texts = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=_ALPHABET, min_size=0, max_size=160),
        st.sampled_from(
            [
                _PAGE_GOOD,
                _PAGE_MESSY,
                "• bullet one.\n• bullet two.\nplain text here...",
                "the be to of and that have with.",
                "a.\nb!\nc?\nd\"\ne”\nf…",
                "x\t \ny  \r\nz.",
                "\tok fine here.\n the be to of.",
                "the be to of and that.",
            ]
        ),
    ),
    min_size=1,
    max_size=16,
)


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_texts)
def test_c4_and_gopher_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    cols = {}
    cols.update(c4_clean_exprs("text"))
    cols.update(gopher_signal_exprs("text"))
    rows = df.withColumns(cols).collect()
    for r in rows:
        t = texts[r["id"]]
        c4 = c4_clean_py(t)
        for k in ("c4_n_lines", "c4_n_lines_kept", "text_c4",
                  "c4_lorem_ipsum", "c4_curly_brace",
                  "c4_too_few_sentences", "c4_keep"):
            assert r[k] == c4[k], (k, repr(t))
        go = gopher_signals_py(t)
        for k in ("gopher_required_stop_hits", "gopher_keep"):
            assert r[k] == go[k], (k, repr(t))
        for k in ("gopher_symbol_word_ratio", "gopher_bullet_line_frac",
                  "gopher_ellipsis_line_frac", "gopher_alpha_word_frac"):
            assert _close(r[k], go[k]), (k, repr(t))


def test_pipeline_webtext_stages_opt_in(spark):
    """score_pages with c4_line_clean + gopher_quality: cleaned text
    flows through rules/scrub, keep is gated by both stages, the raw
    text is preserved, and partition_metrics keeps a stable schema
    whether the stages ran or not."""
    import datetime

    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        partition_metrics,
        score_pages,
    )

    ts = datetime.datetime(2025, 1, 1)
    good = (
        "The quick brown fox jumps over the lazy dog and keeps "
        "running to be sure of the distance that it can have with "
        "room to spare. " * 4
    ).strip()
    page_good = "\n".join([good[:150] + ".",
                           "Here is the second good sentence of prose.",
                           "And that was followed by a third one of course.",
                           "The fourth sentence is here to help with the bar.",
                           "Finally the fifth one closes out the page."])
    page_messy = "Home | About\n" + page_good + "\nEnable javascript now."
    pages = spark.createDataFrame(
        [
            ("https://a.example.org/1", ts, page_good, "en"),
            ("https://a.example.org/2", ts, page_messy, "en"),
            ("https://a.example.org/3", ts, "• a\n• b\n• c", "en"),
        ],
        "url string, warc_ts timestamp, text string, lang string",
    )
    cfg = PipelineConfig(c4_line_clean=True, gopher_quality=True)
    scored = score_pages(pages, cfg)
    rows = {r["url"].rsplit("/", 1)[1]: r for r in scored.collect()}
    assert rows["1"]["keep"] and rows["1"]["c4_keep"]
    assert rows["1"]["gopher_keep"]
    # messy page: junk lines removed from the text the battery sees,
    # raw text preserved
    assert "javascript" not in rows["2"]["text"].lower()
    assert "javascript" in rows["2"]["text_raw"].lower()
    # bullet page fails c4 (no sentences survive) -> keep gated off
    assert not rows["3"]["c4_keep"] and not rows["3"]["keep"]
    m_on = partition_metrics(scored, "t").collect()
    assert sum(r["drop_c4_clean"] for r in m_on) == 1
    assert sum(r["drop_gopher"] for r in m_on) >= 1
    # default config: stages off, schema stable with zero counters
    m_off = partition_metrics(
        score_pages(pages, PipelineConfig()), "t"
    ).collect()
    assert sum(r["drop_c4_clean"] for r in m_off) == 0
    assert sum(r["drop_gopher"] for r in m_off) == 0


def test_c4_then_gopher_compose_single_stage(spark):
    """The two stages over one corpus stay a single shuffle-free
    projection chain (scale pin: no Exchange in the plan)."""
    df = spark.createDataFrame(
        [(0, _PAGE_GOOD)], "doc_id long, text string"
    )
    out = with_gopher_signals(with_c4_clean(df), text_col="text_c4")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert not re.search(
        r"Exchange (hash|range)partitioning|Exchange SinglePartition",
        plan,
    )
    row = out.collect()[0]
    assert row["c4_keep"] and row["gopher_keep"]
