"""Dedup + similarity + NLP + multimodal operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_checker_spark.operators import dedup as D
from data_quality_checker_spark.operators import multimodal as M
from data_quality_checker_spark.operators import nlp as N
from data_quality_checker_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    a = "the quick brown fox jumps over the lazy dog near the old river bank"
    b = a.replace("old", "new")  # near-dup of a
    c = "completely different content about spark query engines and shuffles here"
    rows = [
        (0, a),
        (1, a),          # exact dup of 0
        (2, b),          # near dup of 0/1
        (3, c),
        (4, "tiny"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = D.exact_duplicate_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["doc_ids"] == [0, 1]
    assert D.exact_duplicates(docs).count() == 2


def test_minhash_near_duplicates(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.near_duplicates_minhash(
            docs, threshold=0.5, k_shingle=2
        ).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert all(3 not in p and 4 not in p for p in pairs)


def test_simhash_near_duplicates(spark):
    # simhash is a LONG-document sketch: with few tokens the per-bit
    # majority votes are unstable; use ~200-token docs.
    words = [f"w{i % 37}x{i % 11}" for i in range(200)]
    a = " ".join(words)
    b = a.replace("w0x0", "changed", 1)  # one token of 200
    c = " ".join(f"z{i}" for i in range(200))
    df = spark.createDataFrame(
        [(0, a), (1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    res = D.near_duplicates_simhash(df, max_hamming=6, persist=False)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"] for r in res.collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0
    assert not any(3 in p for p in pairs)


def test_ngram_jaccard_with_blocking(spark, docs):
    pairs = D.ngram_jaccard_pairs(
        docs.withColumn("blk", F.lit(1)),
        n=2,
        threshold=0.4,
        block_col=F.col("blk"),
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got and (0, 2) in got


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(5)
    base = rng.normal(0, 1, (30, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # 100-102: near-dups of vector 0 (tiny perturbation)
    for j in range(3):
        rows.append(
            (100 + j, [float(x + 0.001 * j) for x in base[0]])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_duplicates(vectors):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.embedding_near_duplicates(
            vectors, dim=8, threshold=0.999
        ).collect()
    }
    assert (0, 100) in pairs and (100, 101) in pairs


def test_topk_bruteforce_exact(vectors):
    queries = vectors.filter("vec_id = 0")
    got = SIM.topk_bruteforce(vectors, queries, k=3).orderBy("rank").collect()
    assert [r["id"] for r in got] == [100, 101, 102]
    assert got[0]["cosine"] > 0.9999

    # numpy cross-check of the full ranking
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect()}
    q = rows[0]
    sims = {
        i: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q)))
        for i, v in rows.items()
        if i != 0
    }
    expect = sorted(sims, key=lambda i: (-sims[i], i))[:3]
    assert [r["id"] for r in got] == expect


def test_topk_lsh_recall(vectors):
    queries = vectors.filter("vec_id = 0")
    exact = {
        r["id"]
        for r in SIM.topk_bruteforce(vectors, queries, k=3).collect()
    }
    approx = {
        r["id"]
        for r in SIM.topk_lsh(
            vectors, queries, k=3, dim=8, num_tables=6, num_planes=4
        ).collect()
    }
    # near-identical vectors collide in every table -> recall 1 here
    assert exact <= approx | exact
    assert len(exact & approx) >= 2


def test_nlp_corpus_ops(spark, docs):
    top = N.word_frequencies(docs, top_k=1).collect()
    assert top[0]["token"] == "the"
    bigrams = {r["ngram"] for r in N.top_ngrams(docs, n=2, top_k=20).collect()}
    assert "the quick" in bigrams and "lazy dog" in bigrams
    wl = {r["word_length"]: r["n"] for r in N.word_length_distribution(docs).collect()}
    assert wl[3] > 0
    div = N.corpus_lexical_diversity(docs).collect()[0]
    assert 0 < div["lexical_diversity"] < 1
    sent = spark.createDataFrame(
        [(0, "One two three. Four five! Six?")], "doc_id long, text string"
    )
    dist = {
        r["sentence_words"]: r["n"]
        for r in N.sentence_length_distribution(sent).collect()
    }
    assert dist == {3: 1, 2: 1, 1: 1}


def test_tfidf_top_terms(spark):
    df = spark.createDataFrame(
        [
            (0, "spark spark spark common"),
            (1, "duck duck common"),
            (2, "goose goose common"),
        ],
        "doc_id long, text string",
    )
    rows = N.tfidf_top_terms(df, top_k=1).collect()
    best = {r["doc"]: r["term"] for r in rows}
    assert best == {0: "spark", 1: "duck", 2: "goose"}


def test_lda_topics_runs(spark, docs):
    topics, vocab = N.lda_topics(docs, num_topics=2, max_iter=3)
    assert topics.count() == 2 and len(vocab) > 0


def test_multimodal_features_and_frames(spark, docs):
    media = M.attach_fake_media(docs.filter("text is not null"), "doc_id", "text")
    feats = M.extract_media_features(media).collect()
    assert len(feats) == 5
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["byte_length"] > 0
    assert by_id[0]["sha256"] == by_id[1]["sha256"]  # same text -> same digest
    img = [r for r in feats if r["kind"] == "image"]
    assert all(r["width"] is not None for r in img)
    frames = M.sample_video_frames(media).collect()
    vids = {r["media_id"] for r in media.filter("kind='video'").collect()}
    assert {f["media_id"] for f in frames} == vids
    # deterministic: same payload -> same frame digests
    again = M.sample_video_frames(media).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def test_topk_ivf(vectors):
    queries = vectors.filter("vec_id = 0")
    exact = [
        r["id"]
        for r in SIM.topk_bruteforce(vectors, queries, k=3)
        .orderBy("rank")
        .collect()
    ]
    got = (
        SIM.topk_ivf(
            vectors, queries, k=3, num_centroids=4, n_probe=4
        )  # n_probe == num_centroids -> exhaustive -> exact
        .orderBy("rank")
        .collect()
    )
    assert [r["id"] for r in got] == exact
    # fewer probes: still finds the planted near-dups (same cell as q)
    near = {
        r["id"]
        for r in SIM.topk_ivf(
            vectors, queries, k=3, num_centroids=4, n_probe=1
        ).collect()
    }
    assert {100, 101, 102} & near


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_ivf_assignment_is_shuffle_free(vectors):
    """The corpus->cell assignment must be a pure argmin projection:
    no Exchange keyed on the per-row _id (the old crossJoin + rank
    window shuffled the whole embedding corpus), and exactly one
    Window (the final per-query top-k)."""
    queries = vectors.filter("vec_id = 0")
    plan = _plan(
        SIM.topk_ivf(vectors, queries, k=3, num_centroids=4, n_probe=2)
    )
    assert "hashpartitioning(_id" not in plan, plan
    assert plan.count("windowspecdefinition") == 1, plan


def test_topk_lsh_shuffle_carries_no_vectors(vectors):
    """Candidate dedup must aggregate (query_id, id, cosine) — never
    group on rows still carrying the qv/cv embedding arrays."""
    queries = vectors.filter("vec_id = 0")
    plan = _plan(
        SIM.topk_lsh(vectors, queries, k=3, dim=8, num_tables=4, num_planes=4)
    )
    for line in plan.splitlines():
        if "keys=" in line:
            assert "qv" not in line and "cv" not in line, line
    assert "max(cosine" in plan, plan


def test_minhash_storage_path_matches_inmemory(spark, docs, tmp_path):
    inmem = D.near_duplicates_minhash(docs, threshold=0.5)
    got_mem = {(r["id_a"], r["id_b"]) for r in inmem.collect()}
    stored = D.near_duplicates_minhash(
        docs, threshold=0.5, storage_path=str(tmp_path / "mh")
    )
    got_disk = {(r["id_a"], r["id_b"]) for r in stored.collect()}
    assert got_mem == got_disk and (0, 1) in got_disk
    # the intermediates landed as real parquet tables
    sh = spark.read.parquet(str(tmp_path / "mh" / "shingles"))
    sig = spark.read.parquet(str(tmp_path / "mh" / "signatures"))
    assert {"id", "sh"} <= set(sh.columns)
    assert sig.count() == sh.count()
    # disk-backed run caches nothing; in-memory run releases on demand
    assert stored._cached_deps == ()
    assert len(inmem._cached_deps) == 2
    D.release_cache(inmem)
    assert all(
        not d.storageLevel.useMemory and not d.storageLevel.useDisk
        for d in inmem._cached_deps
    )


def test_duplicate_clusters_and_drop(spark):
    # components: chain 1-2-3-4 (diameter 3), star 10-{11,12,13},
    # pair 20-21, singleton 30 (no edges -> passes through drop)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in D.duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 4, 10, 11, 20, 21, 30]],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"] for r in D.drop_near_duplicates(docs, pairs).collect()
    }
    # one canonical (min id) per cluster + untouched singleton
    assert kept == {1, 10, 20, 30}


def test_ivf_index_build_load_search(vectors, tmp_path, spark):
    idx = SIM.build_ivf_index(
        vectors, num_centroids=4, storage_path=str(tmp_path / "ivf")
    )
    # disk layout IS the inverted file: one partition dir per cell
    import os

    cells = [
        d for d in os.listdir(str(tmp_path / "ivf" / "assignments"))
        if d.startswith("cell=")
    ]
    assert 1 <= len(cells) <= 4
    reopened = SIM.load_ivf_index(spark, str(tmp_path / "ivf"))
    assert reopened.centroids == idx.centroids
    queries = vectors.filter("vec_id = 0")
    got = {
        r["id"]
        for r in SIM.search_ivf(reopened, queries, k=3, n_probe=4).collect()
    }
    exact = {
        r["id"] for r in SIM.topk_bruteforce(vectors, queries, k=3).collect()
    }
    assert got == exact  # n_probe == num_centroids -> exhaustive


def test_ivf_index_append_then_search(vectors, tmp_path, spark):
    """Rolling form for embeddings: build on half the corpus, append
    the other half against the FROZEN quantizer — appended vectors are
    searchable, base assignments untouched, and with n_probe exhaustive
    the results equal brute force over the union."""
    from pyspark.sql import functions as F

    base = vectors.filter("vec_id % 2 = 0")
    batch = vectors.filter("vec_id % 2 = 1")
    path = str(tmp_path / "ivf_roll")
    idx = SIM.build_ivf_index(base, num_centroids=4, storage_path=path)
    n_base = base.count()
    info = SIM.append_ivf_index(batch, path)
    assert info["n_appended"] == batch.count()
    reopened = SIM.load_ivf_index(spark, path)
    assert reopened.centroids == idx.centroids  # quantizer frozen
    assert reopened.assignments.count() == n_base + info["n_appended"]
    # an exact duplicate of an APPENDED vector must be found top-1
    probe = batch.filter("vec_id = 1").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    got = SIM.search_ivf(reopened, probe, k=3, n_probe=4)
    top = got.filter("rank = 1").head()
    assert top["id"] == 1 and top["cosine"] > 0.999999
    # exhaustive probe == brute force over the union
    queries = vectors.filter("vec_id = 2")
    union_ids = {
        r["id"]
        for r in SIM.search_ivf(reopened, queries, k=3, n_probe=4).collect()
    }
    exact_ids = {
        r["id"]
        for r in SIM.topk_bruteforce(vectors, queries, k=3).collect()
    }
    assert union_ids == exact_ids


def test_ivf_append_rejects_mixed_dim_batch(vectors, tmp_path, spark):
    """The append dim guard must aggregate over the WHOLE batch: a
    batch whose FIRST row has the right dimension but whose tail does
    not (the case a head() probe waves through) is rejected, and the
    assignment table is untouched. NULL vectors are rejected too."""
    import pytest
    from pyspark.sql import functions as F

    path = str(tmp_path / "ivf_dim")
    SIM.build_ivf_index(
        vectors.filter("vec_id % 2 = 0"), num_centroids=4,
        storage_path=path,
    )
    n0 = SIM.load_ivf_index(spark, path).assignments.count()
    good = vectors.filter("vec_id % 2 = 1")
    # first row keeps the index dim, later rows are truncated
    mixed = good.select(
        "vec_id",
        F.when(
            F.col("vec_id") <= 1, F.col("embedding")
        ).otherwise(F.slice("embedding", 1, 3)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="dimension"):
        SIM.append_ivf_index(mixed, path)
    with_null = good.select(
        "vec_id",
        F.when(F.col("vec_id") > 1, F.col("embedding")).alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="dimension"):
        SIM.append_ivf_index(with_null, path)
    assert SIM.load_ivf_index(spark, path).assignments.count() == n0


def _make_bmp(w: int, h: int) -> bytes:
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    data = b"\x00" * (row * h)
    header = (
        b"BM"
        + (54 + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    return header + data


def _make_wav(ms: int, rate: int = 8000) -> bytes:
    n = rate * ms // 1000  # mono 8-bit
    data = b"\x80" * n
    return (
        b"RIFF"
        + (36 + n).to_bytes(4, "little")
        + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")      # PCM
        + (1).to_bytes(2, "little")      # mono
        + rate.to_bytes(4, "little")
        + rate.to_bytes(4, "little")     # byte rate (8-bit mono)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + b"data"
        + n.to_bytes(4, "little")
        + data
    )


def _make_png(w: int, h: int) -> bytes:
    import struct
    import zlib

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(b"\x00" + b"\x7f" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_header_decode_real_formats(spark):
    """header_decode parses REAL container headers (valid BMP/WAV/PNG
    bytes generated here) through the same mapInPandas plumbing."""
    # 128 kbps / 44.1 kHz MPEG-1 Layer III: frame length
    # 144*128000//44100 = 417 bytes; ten frames = 4170 bytes ->
    # 4170*8/128 = 260 ms. The second variant hides the sync behind a
    # 100-byte ID3v2 tag (syncsafe size). The sniff validates the
    # WHOLE first frame + the next frame boundary, so a bare sync
    # followed by garbage must stay None (weak-signature guard).
    mp3_frame = b"\xff\xfb\x90\x00" + b"\x00" * 413
    mp3 = mp3_frame * 10
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100
    rows = [
        (0, "image", _make_bmp(17, 9)),
        (1, "image", _make_png(33, 21)),
        (2, "audio", _make_wav(2500)),
        (3, "image", b"GIF89a" + (7).to_bytes(2, "little")
            + (5).to_bytes(2, "little") + b"\x00" * 8),
        (4, "image", b"not a real format"),
        (5, "image", None),
        (6, "audio", mp3),
        (7, "audio", id3 + mp3),
        (8, "audio", b"\xff\xfb" + b"\x00"),  # truncated: None, no crash
        (9, "audio", b"\xff\xfb\x92\x17" + b"garbage" * 40),  # fake sync
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r["media_id"]: r
        for r in M.extract_media_features(
            df, decoder=M.header_decode
        ).collect()
    }
    assert (got[0]["width"], got[0]["height"]) == (17, 9)
    assert (got[1]["width"], got[1]["height"]) == (33, 21)
    assert got[2]["duration_ms"] == 2500
    assert (got[3]["width"], got[3]["height"]) == (7, 5)
    assert got[4]["width"] is None and got[5]["width"] is None
    # MP3 CBR estimate: 4170 bytes at 128 kbps = 260 ms, with and
    # without a leading syncsafe ID3v2 tag; a truncated sync and a
    # sync-prefixed garbage blob both stay None
    assert got[6]["duration_ms"] == 260
    assert got[7]["duration_ms"] == 260
    assert got[8]["duration_ms"] is None
    assert got[9]["duration_ms"] is None
    # stdlib can fully validate the PNG we generated
    import zlib as _z

    png = rows[1][2]
    assert _z.decompress(png[8 + 25 + 8 : -12 - 4]) is not None


def test_content_decode_pixel_and_pcm_stats(spark):
    """content_decode parses REAL BMP pixels, zlib-inflated PNG
    scanlines, and WAV PCM samples through the mapInPandas plumbing;
    stats match the closed-form generators (numpy truth recomputed
    here — image ids alternate BMP/PNG containers over the SAME pixel
    ramps, so one truth covers both), top-down BMPs give identical
    orientation-invariant stats, and undecodable payloads yield Nones
    — never crashes."""
    import numpy as np
    import struct as _s

    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    media = M.attach_synth_media(ids, "doc_id")
    got = {
        r["media_id"]: r
        for r in M.extract_media_features(
            media, decoder=M.content_decode
        ).collect()
    }
    for mid in range(0, 12, 3):  # images
        w, h = 4 + mid % 5, 3 + mid % 4
        x = np.arange(w).reshape(1, w)
        y = np.arange(h).reshape(h, 1)
        b = (mid + 7 * x + 13 * y) % 256
        g = (3 * mid + 11 * x + 5 * y) % 256
        rr = (5 * mid + 3 * x + 17 * y) % 256
        lum = 0.299 * rr + 0.587 * g + 0.114 * b
        r = got[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["lum_mean"] - lum.mean()) < 1e-9
        assert abs(r["lum_std"] - lum.std()) < 1e-9
        ch = np.stack([b, g, rr])
        assert abs(r["clip_frac"] - ((ch == 0) | (ch == 255)).mean()) < 1e-9
        assert r["rms"] is None
    for mid in range(1, 12, 3):  # audio
        n = 200 + mid % 100
        s = ((31 * mid + 997 * np.arange(n)) % 65536 - 32768).astype(float)
        norm = s / 32768.0
        r = got[mid]
        assert r["duration_ms"] == n * 2 * 1000 // 16000
        assert abs(r["rms"] - np.sqrt((norm * norm).mean())) < 1e-9
        assert abs(r["peak"] - np.abs(norm).max()) < 1e-9
        assert abs(r["clip_frac"] - (np.abs(s) >= 32767).mean()) < 1e-9
        assert r["lum_mean"] is None
    for mid in range(2, 12, 3):  # opaque video blobs
        r = got[mid]
        assert r["lum_mean"] is None and r["rms"] is None
        assert r["byte_length"] > 0

    # top-down (negative height) BMP: same stats, orientation-free
    p = bytearray(M.synth_bmp(6))
    p[22:26] = _s.pack("<i", -(3 + 6 % 4))
    up = M.content_decode(M.synth_bmp(6), "image")
    down = M.content_decode(bytes(p), "image")
    assert abs(up["lum_mean"] - down["lum_mean"]) < 1e-9
    assert abs(up["clip_frac"] - down["clip_frac"]) < 1e-9
    # truncated / garbage bodies -> stats None, no crash
    assert M.content_decode(M.synth_bmp(3)[:40], "image")["lum_mean"] is None
    assert M.content_decode(b"BMgarbage", "image")["lum_mean"] is None
    assert M.content_decode(M.synth_wav(4)[:43], "audio")["rms"] is None


def test_png_content_decode_zero_dep():
    """The stdlib-zlib PNG pixel decoder: synth_png payloads (scanline
    filters cycling 0..4) produce stats BIT-IDENTICAL to the BMP twin
    of the same id — same closed-form ramps, different container — so
    an inflate, unfilter, or RGB-vs-BGR bug cannot hide; grayscale and
    RGBA color types decode (alpha excluded from clip_frac, matching
    the BMP channel-byte semantics); palette/16-bit/interlaced/
    truncated/corrupt-IDAT payloads yield Nones, never exceptions."""
    import struct as _s
    import zlib as _z

    import numpy as np

    def chunk(tag, body):
        return (
            _s.pack(">I", len(body)) + tag + body
            + _s.pack(">I", _z.crc32(tag + body))
        )

    def png_of(w, h, color_type, rows):
        ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rows)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b"")
        )

    # container parity: every image id 0..60 (heights 3..6 cover all
    # five filter types via y % 5, widths 4..8 vary the scanline size)
    for mid in range(0, 60, 3):
        png = M.content_decode(M.synth_png(mid), "image")
        bmp = M.content_decode(M.synth_bmp(mid), "image")
        for k in ("lum_mean", "lum_std", "clip_frac"):
            assert abs(png[k] - bmp[k]) < 1e-12, (mid, k, png[k], bmp[k])
        hd = M.header_decode(M.synth_png(mid), "image")
        assert (hd["width"], hd["height"]) == (4 + mid % 5, 3 + mid % 4)

    # grayscale: luminance IS the sample; rail values clip
    g = M.content_decode(png_of(5, 4, 0, [bytes([200]) * 5] * 4), "image")
    assert (g["lum_mean"], g["lum_std"], g["clip_frac"]) == (200.0, 0.0, 0.0)
    assert M.content_decode(
        png_of(5, 4, 0, [bytes([255]) * 5] * 4), "image"
    )["clip_frac"] == 1.0

    # RGBA: opaque alpha (255) must NOT count toward clip_frac
    row = bytes([10, 20, 30, 255]) * 4
    r = M.content_decode(png_of(4, 3, 6, [row] * 3), "image")
    want_lum = 0.299 * 10 + 0.587 * 20 + 0.114 * 30
    assert abs(r["lum_mean"] - want_lum) < 1e-9
    assert r["clip_frac"] == 0.0

    # gray+alpha (color type 4)
    ga = M.content_decode(
        png_of(3, 2, 4, [bytes([100, 255]) * 3] * 2), "image"
    )
    assert (ga["lum_mean"], ga["clip_frac"]) == (100.0, 0.0)

    # undecodable variants -> header metadata only, stats None
    base = M.synth_png(3)

    def mutated(idx, val):
        b = bytearray(base)
        b[idx] = val
        return bytes(b)

    ihdr_off = 8 + 8  # sig + len/tag of IHDR
    assert M.content_decode(base[:30], "image")["lum_mean"] is None
    assert (
        M.content_decode(mutated(ihdr_off + 12, 1), "image")["lum_mean"]
        is None
    )  # interlace=Adam7
    assert (
        M.content_decode(mutated(ihdr_off + 8, 16), "image")["lum_mean"]
        is None
    )  # 16-bit depth
    assert (
        M.content_decode(mutated(ihdr_off + 9, 3), "image")["lum_mean"]
        is None
    )  # palette color type
    corrupt = mutated(len(base) // 2, (base[len(base) // 2] ^ 0xFF))
    assert M.content_decode(corrupt, "image")["lum_mean"] is None
    # ... and a PNG whose IDAT inflates short of h*(stride+1)
    short = png_of(4, 3, 2, [b"\x00" * 12] * 2)  # 2 rows, header says 3
    assert M.content_decode(short, "image")["lum_mean"] is None

    # the synth fixture really alternates containers on image ids
    assert M.synth_png(3)[:8] == b"\x89PNG\r\n\x1a\n"
    assert M.synth_bmp(6)[:2] == b"BM"
    # numpy truth for one PNG id, independent of the BMP twin
    mid, w, h = 9, 4 + 9 % 5, 3 + 9 % 4
    x, y = np.arange(w).reshape(1, w), np.arange(h).reshape(h, 1)
    b_, g_, r_ = (
        (mid + 7 * x + 13 * y) % 256,
        (3 * mid + 11 * x + 5 * y) % 256,
        (5 * mid + 3 * x + 17 * y) % 256,
    )
    lum = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    got = M.content_decode(M.synth_png(mid), "image")
    assert abs(got["lum_mean"] - lum.mean()) < 1e-9
    assert abs(got["lum_std"] - lum.std()) < 1e-9


def test_minhash_prefilter_equivalence_and_liveness(docs):
    """The signature-agreement pre-filter must not change results on a
    corpus whose true pairs sit well above the bar (margin 0.15 keeps
    est-jaccard slack), and must actually prune when the bar is raised
    to 1.0 (negative margin): only the all-components-match exact dup
    survives, proving the filter is in the plan, not dead code."""
    def pairset(**kw):
        df = D.near_duplicates_minhash(docs, threshold=0.5, k_shingle=2, **kw)
        out = {(r["id_a"], r["id_b"]) for r in df.collect()}
        D.release_cache(df)
        return out

    # margin 0.15 must not change results (default is now None — off)
    assert pairset(prefilter_margin=0.15) == pairset()
    # bar = 0.5 - (-0.5) = 1.0 -> only signature-identical pairs pass
    assert pairset(prefilter_margin=-0.5) == {(0, 1)}


def test_minhash_shingle_mode_equivalence(spark, docs, tmp_path):
    """shingle_mode='hash' (default) and 'text' must be byte-identical
    end to end: both feed xxhash64(text-shingle) into the signature
    components (hash mode pre-hashes in the shingler, text mode hashes
    at sketch time), so the parquet-materialized signature tables and
    the verified (pair, jaccard) sets must agree exactly. Pins the
    documented mode-equivalence so a future edit to either _bh branch
    fails loudly instead of silently diverging the crawl-scale form
    from the engine-portable oracle form."""
    out = {}
    for mode in ("hash", "text"):
        root = str(tmp_path / mode)
        df = D.near_duplicates_minhash(
            docs, threshold=0.5, k_shingle=2,
            shingle_mode=mode, storage_path=root,
        )
        out[mode] = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in df.collect()
        }
        sig = spark.read.parquet(f"{root}/signatures")
        out[mode + "_sig"] = sorted(
            tuple(r) for r in sig.orderBy("id").collect()
        )
    assert out["hash"] == out["text"] and (0, 1) in out["hash"]
    assert out["hash_sig"] == out["text_sig"]


def test_minhash_oph_small_fixture(docs):
    """One-permutation hashing on the small fixture: the exact dup
    (identical shingle sets -> identical binned signature) always
    survives banding, every reported pair carries the EXACT verify-join
    jaccard (so values agree with the classic run wherever both report
    a pair), and unrelated/short docs stay out."""
    def pairs(**kw):
        out = D.near_duplicates_minhash(docs, threshold=0.5, k_shingle=2, **kw)
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
        D.release_cache(out)
        return got

    base = pairs()
    oph = pairs(one_permutation=True)
    assert oph[(0, 1)] == 1.0
    for k in set(oph) & set(base):
        assert oph[k] == base[k]
    assert all(3 not in p and 4 not in p and 5 not in p for p in oph)


def test_minhash_oph_recall_gate(spark):
    """OPH is a different estimator of the same Jaccard: gate its
    banding recall against exact all-pairs truth on a planted corpus
    of realistic-length docs (~120 tokens; the regime OPH is for).
    Precision needs no gate — the exact verify join back-stops every
    candidate — but assert it anyway from the same truth."""
    import random

    rnd = random.Random(7)
    rows, shingles = [], {}
    for i in range(50):
        toks = [f"t{rnd.randrange(4000)}" for _ in range(120)]
        mut = list(toks)
        for j in rnd.sample(range(120), 5):
            mut[j] = f"m{rnd.randrange(4000)}"
        for did, tk in ((2 * i, toks), (2 * i + 1, mut)):
            rows.append((did, " ".join(tk)))
            shingles[did] = {
                " ".join(tk[p : p + 3]) for p in range(len(tk) - 2)
            }
    # exact truth (same 3-shingle definition as the operator), kept
    # comfortably above the bar so banding miss-rate is the only slack
    truth = set()
    for i in range(50):
        a, b = shingles[2 * i], shingles[2 * i + 1]
        if len(a & b) / len(a | b) >= 0.75:
            truth.add((2 * i, 2 * i + 1))
    assert len(truth) >= 40  # the plant actually produced near-dups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.near_duplicates_minhash(df, threshold=0.7, one_permutation=True)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    D.release_cache(out)
    assert len(got & truth) / len(truth) >= 0.9  # recall
    for a, b in got:  # precision: every pair is >= threshold in truth
        sa, sb = shingles[a], shingles[b]
        assert len(sa & sb) / len(sa | sb) >= 0.7


def test_pipeline_near_dedup_oph_config(spark):
    """PipelineConfig(near_dedup_oph=True) threads through to the
    sketcher and yields the same near-dup losers on a corpus whose dup
    pairs are unambiguous."""
    from data_quality_checker_spark.plans.pipeline import (
        PipelineConfig,
        score_pages,
        with_near_dup_verdict,
    )
    from data_quality_checker_spark.plans import synth

    pages = synth.pages_df(spark, 300, seed=11)
    scored = score_pages(pages)

    def losers(oph):
        cfg = PipelineConfig(
            near_dedup=True, near_dedup_threshold=0.7, near_dedup_oph=oph
        )
        out = with_near_dup_verdict(scored, cfg)
        return {
            r["url"]: r["near_dup_of"]
            for r in out.filter("near_dup_of is not null").collect()
        }

    assert losers(True) == losers(False)


def test_duplicate_clusters_releases_all_storage(spark):
    """Superseded per-round checkpoints are freed inside the loop and
    release_cache frees the final one — a clustering call must leave
    ZERO extra entries in executor storage (a sustained run once left
    13 resident checkpoints)."""
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)] + [(100, 101), (200, 201)],
        "id_a long, id_b long",
    )
    out = D.duplicate_clusters(pairs)
    labs = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert labs[50] == 0 and labs[101] == 100 and labs[201] == 200
    D.release_cache(out)
    assert len(sc._jsc.sc().getRDDStorageInfo()) == before


def test_duplicate_clusters_chain_convergence(spark):
    """Pointer jumping gives O(log diameter) rounds: a 600-node chain
    (diameter 599 — the shape that blew the old O(diameter) budget at
    a live semantic-dedup run) must converge within the default
    max_iter=20, and an impossible budget must still fail loudly
    (wrong labels would silently split the cluster otherwise)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(599)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.duplicate_clusters(chain, max_iter=1)
    labs = {r["id"]: r["cluster_id"]
            for r in D.duplicate_clusters(chain).collect()}
    assert set(labs.values()) == {0} and len(labs) == 600


def test_spelling_suggestions_symspell_join(spark):
    """SymSpell delete-neighborhood as an equi-join: injected typos
    resolve to their edit-distance-1 vocabulary neighbors, clean and
    distant tokens are untouched."""
    from data_quality_checker_spark.operators import spelling as SP

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(10)]
    rows.append((10, base + " teh quik zzzzz xylophone"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["token"]: r
        for r in SP.spelling_suggestions(df, min_freq=5).collect()
    }
    assert got["teh"]["suggestion"] == "the"
    assert got["quik"]["suggestion"] == "quick"
    # 'zzzzz' has no edit-1 vocab neighbor -> absent
    assert "zzzzz" not in got
    # vocabulary words are never suspects
    assert "the" not in got and "quick" not in got
    # suggestion ranks by vocab frequency: 'the' (freq 22) beats any
    # lower-frequency neighbor
    assert got["teh"]["suggestion_freq"] >= 20


def test_word2vec_doc_similarity(spark):
    """Spark ML Word2Vec doc similarity: identical docs are mutual
    rank-1 neighbors with cosine ~1."""
    a = ("spark query engines shuffle data across partitions for joins "
         "and aggregations every day") * 2
    rows = [
        (0, a),
        (1, a),  # identical -> cosine 1
        (2, "completely different words about cooking pasta dinner "
            "tomato basil garlic sauce recipe kitchen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["query_id"], r["rank"]): r
        for r in N.word2vec_doc_similarity(
            df, top_k=2, min_count=1
        ).collect()
    }
    assert got[(0, 1)]["id"] == 1 and got[(0, 1)]["cosine"] > 0.999
    assert got[(1, 1)]["id"] == 0 and got[(1, 1)]["cosine"] > 0.999
    assert got[(2, 1)]["cosine"] < 0.999


def test_duplicate_spans_planted_offset_recall(spark):
    """The exact-substring fidelity probe (VERDICT r04 item 7): plant
    shared spans at offsets whose difference is NEVER a multiple of
    stride, then measure token-coverage recall per span length.

    Pins the honest trade quantitatively:
    - position mode: cross-doc windows only match when offsets agree
      mod stride -> recall 0.0 on every misaligned pair (this is why
      content anchors are the crawl-scale default recommendation);
    - content mode (winnowing/CDC md5 anchors): alignment-free ->
      measured mean coverage 0.81/0.85/0.89 at span lengths
      75/128/200 (floors pinned below with slack); spans at exactly
      window length need an anchor on token 0 (~1/stride chance), so
      no floor is claimed there.
    """
    import numpy as np

    from data_quality_checker_spark.operators import dedup as DD

    rows, planted = [], {}
    pair = 0
    for L in (75, 128, 200):
        for k in range(6):
            span = [f"dup{pair}w{j}" for j in range(L)]
            o1 = 13 + 7 * k
            o2 = o1 + 3 + k  # difference 3..8: never a stride multiple
            assert (o2 - o1) % 10 != 0
            for side, off in ((0, o1), (1, o2)):
                did = 1000 * pair + side
                toks = (
                    [f"bg{did}x{i}" for i in range(off)]
                    + span
                    + [f"bg{did}y{i}" for i in range(400 - off)]
                )
                rows.append((did, " ".join(toks)))
                planted[did] = L
            pair += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def recalls(mode):
        out = {
            r["doc_id"]: r
            for r in DD.duplicate_spans(
                df, window=50, stride=10, anchor_mode=mode
            ).collect()
        }
        per = {}
        for did, L in planted.items():
            r = out.get(did)
            cov = r["dup_token_frac"] * r["n_tokens"] if r else 0.0
            per.setdefault(L, []).append(min(1.0, cov / L))
        return {L: float(np.mean(v)) for L, v in per.items()}

    pos = recalls("position")
    assert all(v == 0.0 for v in pos.values()), pos
    cdc = recalls("content")
    assert cdc[75] >= 0.6 and cdc[128] >= 0.7 and cdc[200] >= 0.75, cdc
    # content mode keeps the per-doc contract even for docs with no
    # anchored window at all
    tiny = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    r = DD.duplicate_spans(
        tiny, window=50, stride=10, anchor_mode="content"
    ).collect()
    assert len(r) == 1 and r[0]["dup_windows"] == 0
    with pytest.raises(ValueError, match="anchor_mode"):
        DD.duplicate_spans(tiny, anchor_mode="nope")
