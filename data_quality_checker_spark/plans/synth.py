"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md
F1): seeded numpy, no wall-clock, no network. Each violation class is
injected at a fixed rate so expected per-rule drop counts are
computable in closed form; hosts are Zipf-skewed to exercise salting;
a controlled fraction of duplicate urls (differing warc_ts) exercises
latest-capture dedup."""

from __future__ import annotations

import datetime as dt

import numpy as np

from data_quality_checker_spark.functions.wordlists import STOPWORDS, TOXIC_WORDS

# word pools: clean English text mixes stopwords + content words so it
# passes every rule; content-only docs trip `low_stopword`.
_CONTENT = (
    "data table query engine spark batch stream filter join scan sort "
    "merge hash window partition column row value key group order index "
    "cache memory disk network cluster node task stage shuffle broadcast "
    "vector metric model train test deploy monitor alert report chart "
    "user page site link text word line token corpus crawl fetch parse"
).split()
_STOP = list(STOPWORDS["en"])

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_BASE_TS = dt.datetime(2024, 3, 1, 0, 0, 0)


def _clean_text(rng: np.random.RandomState, n_words: int) -> str:
    words = []
    for i in range(n_words):
        if i % 4 == 0:
            words.append(_STOP[rng.randint(len(_STOP))])
        else:
            words.append(_CONTENT[rng.randint(len(_CONTENT))])
    # break into lines of ~12 words
    out_lines = [
        " ".join(words[i : i + 12]) for i in range(0, len(words), 12)
    ]
    return "\n".join(out_lines)


def _foreign_text(rng: np.random.RandomState, lang: str, n_words: int) -> str:
    pool = list(STOPWORDS[lang]) + [w + "o" for w in _CONTENT[:20]]
    return " ".join(pool[rng.randint(len(pool))] for _ in range(n_words))


def make_pages(n: int, seed: int = 42) -> list[dict]:
    """n pages as plain dicts (usable without Spark for the oracle)."""
    rng = np.random.RandomState(seed)
    pages: list[dict] = []
    for i in range(n):
        r = rng.rand()
        lang = "en"
        if r < 0.55:
            text = _clean_text(rng, 30 + rng.randint(60))
        elif r < 0.63:
            lang = ["es", "fr", "de"][rng.randint(3)]
            text = _foreign_text(rng, lang, 40 + rng.randint(30))
        elif r < 0.68:
            text = " ".join(
                _CONTENT[rng.randint(len(_CONTENT))] for _ in range(3)
            )  # too_short + too_few_words
        elif r < 0.70:
            text = _clean_text(rng, 5200)  # too_many_words (+ repetition)
        elif r < 0.75:
            base = _clean_text(rng, 40)
            text = base + " @#$% *&^! ~~~ |||" * max(3, len(base) // 60)
        elif r < 0.80:
            text = " ".join(
                _CONTENT[rng.randint(len(_CONTENT))] for _ in range(50)
            )  # low_stopword
        elif r < 0.85:
            w = _CONTENT[rng.randint(len(_CONTENT))]
            text = " ".join([w] * 60 + ["the", "and"])  # high_repetition
        elif r < 0.88:
            line = " ".join(_CONTENT[k % len(_CONTENT)] for k in range(i, i + 8))
            text = "\n".join([line] * 7 + [_clean_text(rng, 12)])  # dup_lines
        elif r < 0.93:
            base = _clean_text(rng, 45)
            pii = (
                " contact john.doe@example.com or +1 (555) 123-4567"
                " from 192.168.1.77 today"
            )
            text = base + pii  # kept, but scrubbed
        elif r < 0.96:
            base = _clean_text(rng, 45)
            tox = TOXIC_WORDS[rng.randint(len(TOXIC_WORDS))]
            text = base + " " + tox
        elif r < 0.98:
            text = ""
        else:
            text = None
        host = f"host{int(rng.zipf(1.5)) % 50}.example"
        url = f"https://{host}/p{i}"
        ts = _BASE_TS + dt.timedelta(seconds=int(i))
        if i % 37 == 1 and pages:
            # duplicate capture of the previous url, later timestamp
            url = pages[-1]["url"]
            ts = pages[-1]["warc_ts"] + dt.timedelta(hours=1)
        html = (
            b"<html><body>" + (text or "").encode("utf-8") + b"</body></html>"
        )
        # claimed lang is wrong ~10% of the time (langid must disagree)
        claimed = lang if rng.rand() > 0.1 else ["en", "es", "zz"][rng.randint(3)]
        pages.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": text,
                "lang": claimed,
            }
        )
    return pages


def pages_df(spark, n: int, seed: int = 42):
    """The corpus as a Spark DataFrame with the north-rule schema."""
    rows = [
        (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
        for p in make_pages(n, seed)
    ]
    return spark.createDataFrame(rows, PAGE_SCHEMA)


def pages_df_distributed(
    spark, n: int, seed: int = 42, corpus_version: str = "v2"
):
    """Fully-distributed deterministic corpus generator for benchmarks:
    spark.range(n) + hash-indexed literal word pools, zero driver-side
    loops — the shape a 100 TB synthetic load test would use. Texts are
    deterministic functions of (id, seed); violation classes are mixed
    in at ~the make_pages rates via hash buckets. (Correctness tests
    use make_pages, which has an exact Python oracle.)

    ``corpus_version``: 'v2' (default) is the honest mix with the
    too_many_words long-doc and dup-lines classes; 'v1' reproduces the
    round-1/2 bench ladder that skipped them (wider short/pii bands) —
    kept ONLY so round-over-round throughput can be compared on the
    same corpus a past round measured (BENCH.md re-anchor)."""
    from pyspark.sql import functions as F

    stop_arr = F.array(*[F.lit(w) for w in _STOP])
    content_arr = F.array(*[F.lit(w) for w in _CONTENT])
    es_arr = F.array(*[F.lit(w) for w in STOPWORDS["es"]])

    def pick(arr, size, salt):
        # deterministic word pick per (id, position, seed); salt may be
        # an int literal or a column — xxhash64 sees IntegerType either
        # way, so both forms produce THE SAME hash (byte-identity of
        # the corpus across the two construction styles is pinned by
        # test_synth_generator_byte_identity)
        salt_c = F.lit(salt) if isinstance(salt, int) else salt
        return F.element_at(
            arr,
            (
                F.pmod(
                    F.xxhash64(F.col("id"), salt_c, F.lit(seed)),
                    F.lit(size),
                )
                + 1
            ).cast("int"),
        )

    # Per-position picks via transform over a position sequence rather
    # than an unrolled concat_ws of one subtree per position: the
    # unrolled form put hundreds of xxhash64/element_at subtrees into
    # ONE projection (text inlines twice: html + text), janino's 64 KB
    # method limit tripped, and every corpus generation ran with
    # whole-stage-codegen fallback noise (InternalCompilerException
    # per attempt). The transform form is one expression per pool —
    # HOFs evaluate per-element outside codegen, which is fine for the
    # one-time generation job — and hashes IDENTICALLY (same salt
    # integers, same types).
    def words_expr(n_words, stop_every=4):
        idx = F.sequence(F.lit(0), F.lit(n_words - 1))

        def _one(i):
            return F.when(
                F.pmod(i, F.lit(stop_every)) == 0,
                pick(stop_arr, len(_STOP), i + F.lit(1000)),
            ).otherwise(
                pick(content_arr, len(_CONTENT), i + F.lit(2000))
            )

        return F.array_join(F.transform(idx, _one), " ")

    def pool_expr(arr, size, n_words, salt_base):
        idx = F.sequence(F.lit(salt_base), F.lit(salt_base + n_words - 1))
        return F.array_join(
            F.transform(idx, lambda s: pick(arr, size, s)), " "
        )

    clean = words_expr(60)
    short = words_expr(3)
    foreign = pool_expr(es_arr, len(STOPWORDS["es"]), 40, 3000)
    nostop = pool_expr(content_arr, len(_CONTENT), 50, 4000)
    repeated = F.concat(
        F.array_join(
            F.array_repeat(pick(content_arr, len(_CONTENT), 5000), 60),
            " ",
        ),
        F.lit(" the and"),
    )
    pii = F.concat(
        words_expr(45),
        F.lit(
            " contact john.doe@example.com or +1 (555) 123-4567"
            " from 192.168.1.77 today"
        ),
    )
    toxic = F.concat(words_expr(45), F.lit(" " + TOXIC_WORDS[0]))
    # restored classes (review finding: the old ladder skipped them, so
    # benches never exercised the dup-lines line-array path or the
    # too_many_words gate and overstated throughput on the real mix):
    # ~5,200 words of text (too_many_words) and 7 duplicated lines
    # F.repeat keeps these single expressions (a 80x concat_ws of the
    # word subtree would explode the codegen plan)
    long_doc = F.repeat(F.concat(words_expr(65), F.lit(" ")), 80)
    dup_line_txt = F.concat(
        F.repeat(F.concat(words_expr(8), F.lit("\n")), 7),
        words_expr(12),
    )

    bucket = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(100))
    if corpus_version == "v2":
        text = (
            F.when(bucket < 55, clean)
            .when(bucket < 63, foreign)
            .when(bucket < 66, short)
            .when(bucket < 68, long_doc)
            .when(bucket < 75, F.concat(clean, F.lit(" @#$% *&^! ~~~ ||| @#$% *&^!")))
            .when(bucket < 80, nostop)
            .when(bucket < 85, repeated)
            .when(bucket < 88, dup_line_txt)
            .when(bucket < 93, pii)
            .when(bucket < 96, toxic)
            .when(bucket < 98, F.lit(""))
            .otherwise(F.lit(None).cast("string"))
        )
    elif corpus_version == "v1":
        text = (
            F.when(bucket < 55, clean)
            .when(bucket < 63, foreign)
            .when(bucket < 68, short)
            .when(bucket < 75, F.concat(clean, F.lit(" @#$% *&^! ~~~ ||| @#$% *&^!")))
            .when(bucket < 80, nostop)
            .when(bucket < 85, repeated)
            .when(bucket < 93, pii)
            .when(bucket < 96, toxic)
            .when(bucket < 98, F.lit(""))
            .otherwise(F.lit(None).cast("string"))
        )
    else:
        raise ValueError(f"unknown corpus_version: {corpus_version!r}")
    host = F.concat(
        F.lit("host"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(50)),
        F.lit(".example"),
    )
    return spark.range(n).select(
        F.concat(F.lit("https://"), host, F.lit("/p"), F.col("id")).alias(
            "url"
        ),
        (
            F.lit(_BASE_TS)
            + F.make_dt_interval(secs=F.col("id").cast("double"))
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.coalesce(text, F.lit("")), F.lit("</body></html>")),
            "UTF-8",
        ).alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )
