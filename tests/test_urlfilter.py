"""URL/domain filtering (plans/urlfilter.py): host extraction with
ports/userinfo, naive eTLD+1, shape flags, blocklist anti-join plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_checker_spark.plans import urlfilter as UF


def _one(spark, url, expr):
    df = spark.createDataFrame([(url,)], ["url"])
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_host_and_domain_extraction(spark):
    cases = {
        "https://www.Example.COM/path": ("www.example.com", "example.com"),
        "http://user:pw@deep.sub.site.org:8080/x?q=1": (
            "deep.sub.site.org", "site.org"),
        "https://shop.example.co.uk/item": (
            "shop.example.co.uk", "example.co.uk"),
        "http://10.1.2.3/page": ("10.1.2.3", "10.1.2.3"),
        "https://localhost/admin": ("localhost", "localhost"),
        "not a url": ("", ""),
    }
    for url, (host, dom) in cases.items():
        assert _one(spark, url, UF.url_host("url")) == host, url
        assert _one(spark, url, UF.registrable_domain("url")) == dom, url


def test_quality_flags(spark):
    rows = [
        (1, "https://cdn.site.com/a/b/logo.PNG"),
        (2, "https://site.com/article?id=3"),
        (3, "http://192.168.0.1/x"),
        (4, "https://site.com/find?" + "x" * 300),
        (5, "https://super-casino.net/play"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    flags = UF.url_quality_flags("url", blocked_words=("casino",))
    got = {
        r["id"]: r
        for r in df.select(
            "id", *[v.alias(k) for k, v in flags.items()]
        ).collect()
    }
    assert got[1]["url_bad_ext"] and not got[2]["url_bad_ext"]
    assert got[3]["url_ip_host"] and not got[2]["url_ip_host"]
    assert got[4]["url_long_query"] and not got[2]["url_long_query"]
    assert got[5]["url_blocked_word"] and not got[2]["url_blocked_word"]


def test_blocklist_anti_join_and_plan(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.good.org/a"),
            (2, "https://sub.spamfarm.biz/b"),
            (3, "https://mirror.spamfarm.biz/c"),
        ],
        ["id", "url"],
    )
    bl = spark.createDataFrame([("SpamFarm.biz",)], ["domain"])
    kept = UF.filter_blocked_domains(df, bl)
    assert {r["id"] for r in kept.collect()} == {1}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
