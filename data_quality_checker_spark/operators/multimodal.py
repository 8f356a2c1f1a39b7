"""Multimodal columns: image/audio/video as opaque binary + typed
metadata. The Spark-side plumbing (schema, partitioning, mapInPandas
batch shape, Arrow transfer of binary) is real and tested; the actual
codec step is STUBBED — this container has no image/audio libraries —
behind `decoder=` hooks that default to a deterministic fake and raise
NotImplementedError when a real decode is requested.

Design for 100 TB: binary payloads ride in their own column so column
pruning keeps them out of every non-media plan (same discipline as the
pipeline's `html`); feature extraction streams Arrow record batches
through mapInPandas with bounded batch size, never collect()."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "extract_media_features",
    "header_decode",
    "sample_video_frames",
]

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test helper: wrap a text column into a deterministic binary
    payload with typed metadata (the shape a WARC media extractor would
    produce)."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        (
            F.when(F.col(id_col) % 3 == 0, F.lit("image"))
            .when(F.col(id_col) % 3 == 1, F.lit("audio"))
            .otherwise(F.lit("video"))
        ).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo
    dimensions/duration from the payload hash. Swap for PIL/ffmpeg by
    passing a real `decoder` to extract_media_features."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 16 + h[0] % 240 if kind == "image" else None,
        "height": 16 + h[1] % 240 if kind == "image" else None,
        "duration_ms": 1000 + int.from_bytes(h[2:4], "big")
        if kind in ("audio", "video")
        else None,
    }


def header_decode(payload: bytes, kind: str) -> dict:
    """REAL, dependency-free metadata decode for the container formats
    whose headers are trivially parseable — PNG, BMP, GIF (width/
    height) and canonical RIFF/WAVE (duration from byte rate + data
    size). Full pixel/sample decode still needs PIL/ffmpeg (the
    NotImplementedError hook below); unknown formats yield Nones
    rather than fake values. Pass as ``decoder=header_decode``."""
    p = payload or b""
    out: dict = {"width": None, "height": None, "duration_ms": None}
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
            out["width"] = int.from_bytes(p[16:20], "big")
            out["height"] = int.from_bytes(p[20:24], "big")
        elif p[:2] == b"BM" and len(p) >= 26:
            out["width"] = int.from_bytes(p[18:22], "little", signed=True)
            out["height"] = abs(
                int.from_bytes(p[22:26], "little", signed=True)
            )
        elif p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
            out["width"] = int.from_bytes(p[6:8], "little")
            out["height"] = int.from_bytes(p[8:10], "little")
        elif (
            p[:4] == b"RIFF"
            and p[8:12] == b"WAVE"
            and p[12:16] == b"fmt "
            and len(p) >= 44
            and p[36:40] == b"data"
        ):
            byte_rate = int.from_bytes(p[28:32], "little")
            data_size = int.from_bytes(p[40:44], "little")
            if byte_rate:
                out["duration_ms"] = int(data_size * 1000 / byte_rate)
    except Exception:  # malformed header -> metadata unknown, not a crash
        pass
    return out


def _real_decode(payload: bytes, kind: str) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "full pixel/sample decoding needs PIL/torchaudio/ffmpeg — not "
        "present in this environment; header_decode covers PNG/BMP/GIF/"
        "WAV metadata, _fake_decode gives deterministic stand-ins"
    )


FEATURE_SCHEMA = (
    "media_id long, kind string, byte_length long, sha256 string, "
    "width int, height int, duration_ms int"
)


def extract_media_features(
    media: DataFrame, decoder=None, batch_hint: int | None = None
) -> DataFrame:
    """Per-media features via mapInPandas: Arrow batches of
    (media_id, kind, payload) -> (sizes, digest, decoded dims).

    `decoder(payload, kind) -> dict` defaults to the deterministic
    fake; pass a real codec in production."""
    decode = decoder or _fake_decode

    def _extract(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode(p if p is not None else b"", k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_length": [
                        len(p) if p is not None else 0
                        for p in pdf["payload"]
                    ],
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "duration_ms": [d["duration_ms"] for d in decoded],
                }
            )

    cols = media.select("media_id", "kind", "payload")
    return cols.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame_sha256 string"


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.
    The frame grab is stubbed (hash-derived); the row-explosion shape,
    schema and batching are the real contract an ffmpeg-backed decoder
    would fill in."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                h = hashlib.sha256(payload or b"").digest()
                duration = 1000 + int.from_bytes(h[2:4], "big")
                n = min(max_frames, max(1, duration // every_ms))
                for i in range(int(n)):
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(
                        hashlib.sha256((payload or b"") + bytes([i])).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha256": digests}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )
