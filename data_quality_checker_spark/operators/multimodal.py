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


def _real_decode(payload: bytes, kind: str) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "real media decoding needs PIL/torchaudio/ffmpeg — not present "
        "in this environment; pass decoder=_fake_decode or your own"
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
