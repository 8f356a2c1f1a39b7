"""Zero-dep Huffman JPEG codec (operators/jpeg.py): solid-color
streams round-trip EXACTLY (DC-only blocks — the property the
multimodal_jpeg analytic oracle leans on); solid RGB matches an
independent numpy twin of the JFIF YCbCr round-trip at 4:4:4 AND
4:2:0 (subsampled constant chroma stays constant); textured images
round-trip within IDCT rounding tolerance at quant=1; non-8-multiple
dims crop correctly; malformed/truncated streams return None, never
raise; header_decode walks JPEG markers for dims; the full path runs
through extract_media_features' mapInPandas plumbing. PROGRESSIVE
(SOF2) streams decode bit-identically to the baseline encoding of
the same quantized coefficients through all four scan kinds (DC
first/refine, AC first/refine with EOB runs), with and without
restart markers; non-flat quantization tables pin the zigzag-domain
dequantization against an exact reference reconstruction. Decoder
generality beyond the fixture encoders: tables arrive via DHT
(stream-defined, not Annex K), sampling factors are read from SOF."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_checker_spark.operators import jpeg as J
from data_quality_checker_spark.operators import multimodal as M


def _ycc_roundtrip(rgb):
    """Independent twin of encoder fwd + decoder inverse color math
    (both sides use banker's rounding via np.round/python round)."""
    r, g, b = rgb
    y = round(0.299 * r + 0.587 * g + 0.114 * b)
    cb = round(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
    cr = round(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
    def clip(x):
        return min(255, max(0, round(x)))
    return (
        clip(y + 1.402 * (cr - 128)),
        clip(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        clip(y + 1.772 * (cb - 128)),
    )


def test_solid_gray_exact_roundtrip():
    for v in (0, 7, 127, 200, 255):
        img = np.full((24, 16), v, np.uint8)
        back = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img))
        assert back is not None and back.shape == (24, 16)
        assert (back == v).all(), (v, np.unique(back))


def test_solid_rgb_444_and_420_match_color_twin():
    for rgb in [(10, 200, 60), (255, 0, 0), (0, 0, 0),
                (255, 255, 255), (123, 45, 67)]:
        img = np.zeros((16, 16, 3), np.uint8)
        img[:, :] = rgb
        want = _ycc_roundtrip(rgb)
        for sub in (False, True):
            back = J.decode_baseline_jpeg(
                J.encode_baseline_jpeg(img, subsample=sub)
            )
            assert back is not None, (rgb, sub)
            got = tuple(int(x) for x in back[5, 5])
            assert got == want, (rgb, sub, got, want)
            # solid frame: every pixel identical
            assert (back == back[0, 0]).all()


def test_textured_roundtrip_tolerance_and_odd_dims():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 56, 3)).astype(np.uint8)
    back = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img))
    err = np.abs(back.astype(int) - img.astype(int))
    # quant=1 is near-lossless: error is IDCT/color rounding only
    assert err.max() <= 12 and err.mean() < 2.0, (err.max(), err.mean())
    # gray, dims not multiples of 8: crop back to exact (h, w)
    img = rng.randint(0, 256, (19, 23)).astype(np.uint8)
    back = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img))
    assert back.shape == (19, 23)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 6


def test_malformed_and_unsupported_return_none():
    assert J.decode_baseline_jpeg(b"not jpeg") is None
    assert J.decode_baseline_jpeg(b"\xff\xd8garbage") is None
    good = J.encode_baseline_jpeg(np.full((8, 8), 9, np.uint8))
    assert J.decode_baseline_jpeg(good[:40]) is None
    # flip SOF0 -> SOF2: a FULL-BAND scan is illegal in progressive
    # (a DC scan must have Se=0), so this still fails closed
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    assert i > 0
    prog[i + 1] = 0xC2
    assert J.decode_baseline_jpeg(bytes(prog)) is None
    # lossless SOF3 stays unsupported
    lossless = bytearray(good)
    lossless[i + 1] = 0xC3
    assert J.decode_baseline_jpeg(bytes(lossless)) is None
    # corrupt a byte mid-entropy-stream: decode NEVER raises — it
    # either fails closed (None) or yields a best-effort frame
    corrupt = bytearray(good)
    corrupt[-6] ^= 0xFF
    out = J.decode_baseline_jpeg(bytes(corrupt))
    assert out is None or isinstance(out, np.ndarray)


def test_restart_markers_decode_identically():
    """DRI + RSTn resync (the machinery camera JPEGs emit): encoding
    with restart intervals 1 and 3 must decode byte-identically to the
    restart-free stream — DC predictor resets and byte-aligned marker
    skips exercised on both gray and interleaved RGB MCUs."""
    rng = np.random.RandomState(5)
    for shape in [(40, 56), (32, 24, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = J.decode_baseline_jpeg(J.encode_baseline_jpeg(img))
        for ri in (1, 3):
            data = J.encode_baseline_jpeg(img, restart_interval=ri)
            assert b"\xff\xdd" in data  # DRI segment present
            back = J.decode_baseline_jpeg(data)
            assert back is not None and (back == base).all(), (shape, ri)


def test_progressive_matches_baseline_exactly():
    """The progressive scan script (DC first Al=1 -> per-comp AC first
    -> per-comp AC refine Ah=1->Al=0 -> DC refine) carries the SAME
    quantized coefficients as the baseline encoding, so the decoded
    frames must be bit-identical — any drift in the four progressive
    scan decoders (EOB-run accounting, correction-bit ordering, ZRL
    spans, point transforms) breaks the equality."""
    rng = np.random.RandomState(11)
    for shape in [(16, 16), (24, 40), (21, 34), (32, 24, 3), (19, 23, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = J.decode_jpeg(J.encode_baseline_jpeg(img))
        prog = J.decode_jpeg(J.encode_progressive_jpeg(img))
        assert prog is not None and base is not None, shape
        assert prog.shape == base.shape == img.shape
        assert (prog == base).all(), shape
    # solid color: exact end to end (the oracle's contract)
    solid = np.full((24, 24, 3), 77, np.uint8)
    assert (J.decode_jpeg(J.encode_progressive_jpeg(solid)) == solid).all()
    solid_g = np.full((16, 8), 201, np.uint8)
    assert (
        J.decode_jpeg(J.encode_progressive_jpeg(solid_g)) == solid_g
    ).all()


def test_progressive_420_subsampled_matches_baseline():
    """4:2:0 progressive: the decoder's interleaved sv/sh>1 DC block
    expansion and the non-interleaved component-grid geometry
    (_comp_blocks ceil math) — real crawl JPEGs are predominantly
    progressive 4:2:0, so these paths need their own fixture, with
    and without restarts."""
    rng = np.random.RandomState(19)
    img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    base = J.decode_jpeg(J.encode_baseline_jpeg(img, subsample=True))
    prog = J.decode_jpeg(J.encode_progressive_jpeg(img, subsample=True))
    assert prog is not None and (prog == base).all()
    pr = J.decode_jpeg(
        J.encode_progressive_jpeg(img, subsample=True, restart_interval=2)
    )
    assert pr is not None and (pr == base).all()
    # solid 4:2:0: exact end to end (constant chroma survives the
    # subsample mean)
    solid = np.full((16, 32, 3), 133, np.uint8)
    want = J.decode_jpeg(J.encode_baseline_jpeg(solid, subsample=True))
    got = J.decode_jpeg(J.encode_progressive_jpeg(solid, subsample=True))
    assert (got == want).all() and (got == got[0, 0]).all()


def test_progressive_restart_markers():
    """DRI/RSTn inside a progressive DC scan (predictor reset +
    byte-aligned resync), then DRI 0 disabling restarts for the AC
    scans — decode must equal the restart-free stream."""
    rng = np.random.RandomState(13)
    for shape in [(40, 56), (32, 24, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        base = J.decode_jpeg(J.encode_baseline_jpeg(img))
        for ri in (1, 3):
            data = J.encode_progressive_jpeg(img, restart_interval=ri)
            assert b"\xff\xdd" in data
            back = J.decode_jpeg(data)
            assert back is not None and (back == base).all(), (shape, ri)


def test_nonflat_quant_dequantizes_in_zigzag_order():
    """A non-flat quantization table pins the dequant domain: the
    stream carries tables in ZIGZAG order and the coefficient grids
    are zigzag-ordered, so dequantization must multiply BEFORE the
    de-zigzag scatter. The old natural-order remap paired quants with
    the wrong coefficients for every non-flat table (all real camera
    JPEGs) — flat fixtures couldn't see it. The expected frame is an
    exact independent reconstruction from the encoder's own quantized
    coefficients."""
    rng = np.random.RandomState(17)
    q = ((np.arange(64) % 13) + 1).astype(np.int32)  # natural order
    img = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_baseline_jpeg(img, quant=q))
    assert dec is not None
    # independent reference: quantize exactly as the encoder does,
    # dequantize in natural order, IDCT with the same basis
    plane = img.astype(np.float64) - 128.0
    coefs = np.round(
        np.einsum(
            "ij,abjk,lk->abil",
            J._C,
            plane.reshape(2, 8, 3, 8).transpose(0, 2, 1, 3),
            J._C,
        )
    ).astype(np.int64) // q.reshape(8, 8)
    deq = (coefs * q.reshape(8, 8)).astype(np.float64)
    spat = np.einsum("ji,abjk,kl->abil", J._C, deq, J._C) + 128.0
    want = np.clip(
        np.round(spat.transpose(0, 2, 1, 3).reshape(16, 24)), 0, 255
    ).astype(np.uint8)
    assert (dec == want).all()
    # the progressive path shares the dequant: same equality there
    decp = J.decode_jpeg(J.encode_progressive_jpeg(img, quant=q))
    assert decp is not None and (decp == want).all()


def test_content_decode_progressive_payload():
    """content_decode reaches the progressive path: a solid-gray
    progressive stream yields exact luminance stats (same closed form
    as the baseline fixture)."""
    img = np.full((12, 20), 93, np.uint8)
    out = M.content_decode(J.encode_progressive_jpeg(img), "image")
    assert (out["width"], out["height"]) == (20, 12)
    assert out["lum_mean"] == 93.0 and out["lum_std"] == 0.0


def test_header_decode_jpeg_dims():
    img = np.full((21, 34), 80, np.uint8)
    hd = M.header_decode(J.encode_baseline_jpeg(img), "image")
    assert (hd["width"], hd["height"]) == (34, 21)
    # truncated header: Nones, no crash
    assert (
        M.header_decode(J.encode_baseline_jpeg(img)[:6], "image")["width"]
        is None
    )
    # T.81-legal fill bytes (0xFF padding) before markers: the walk
    # must resync, not parse the next marker byte as a length
    # (round-6 review: the old walk misread or skipped the SOF)
    data = J.encode_baseline_jpeg(img)
    stuffed = data[:2] + b"\xff\xff\xff" + data[2:]
    hd2 = M.header_decode(stuffed, "image")
    assert (hd2["width"], hd2["height"]) == (34, 21)
    # standalone TEM marker (no length field) mid-stream
    tem = data[:2] + b"\xff\x01" + data[2:]
    hd3 = M.header_decode(tem, "image")
    assert (hd3["width"], hd3["height"]) == (34, 21)


def test_content_decode_jpeg_stats_and_spark_plumbing(spark):
    """synth_jpeg_gray payloads through extract_media_features: decoded
    stats equal the closed-form solid-color truth (the multimodal_jpeg
    oracle's contract), via the same Arrow mapInPandas path as every
    other format."""
    from pyspark.sql import functions as F

    ids = spark.range(0, 24).select(F.col("id").alias("media_id"))

    def _build(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "payload": [
                        M.synth_jpeg_gray(int(i))
                        for i in pdf["media_id"]
                    ],
                }
            )

    media = ids.mapInPandas(
        _build, schema="media_id long, kind string, payload binary"
    )
    got = {
        r["media_id"]: r
        for r in M.extract_media_features(
            media, decoder=M.content_decode
        ).collect()
    }
    for mid in range(24):
        v = (37 * mid + 11) % 256
        r = got[mid]
        assert (r["width"], r["height"]) == (4 + mid % 5, 3 + mid % 4)
        assert r["lum_mean"] == float(v), (mid, r["lum_mean"], v)
        assert r["lum_std"] == 0.0
        assert r["clip_frac"] == (1.0 if v in (0, 255) else 0.0)


def test_rgb_textured_content_stats_match_decoded_truth():
    """content_decode's JPEG RGB branch: stats equal a direct numpy
    recompute over the decoder's own output (pins the Rec.601 +
    clip_frac wiring, independent of codec loss)."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    payload = J.encode_baseline_jpeg(img)
    px = J.decode_baseline_jpeg(payload)
    a = px.astype(np.float64)
    lum = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    out = M.content_decode(payload, "image")
    assert abs(out["lum_mean"] - lum.mean()) < 1e-9
    assert abs(out["lum_std"] - lum.std()) < 1e-9
    assert abs(
        out["clip_frac"] - ((px == 0) | (px == 255)).mean()
    ) < 1e-9


def test_bitreader_accumulator_stays_bounded():
    """round-7 perf regression pin: the entropy bit-reader must DISCARD
    consumed bits as it refills — without the mask its accumulator
    grows into a stream-length bigint and every read walks it, which
    measured as QUADRATIC decode time on single-scan baseline streams
    (16.1 s for one 256x256 image; linear after the fix). Reading a
    ~10 KB stream to exhaustion must never hold more than two live
    bytes in the accumulator."""
    br = J._BitReader(bytes(range(1, 200)) * 50)
    max_bits = 0
    while br.read_bit() is not None:
        max_bits = max(max_bits, br._acc.bit_length())
    assert max_bits <= 16
