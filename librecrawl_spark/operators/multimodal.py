"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed through Arrow-batched
``mapInPandas`` UDFs.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubbed: ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded by content hash) produces stable feature rows.
Everything Spark-side — schema, partitioning, UDF signatures, batch
shapes — is real and tested; swapping in a real codec is a one-function
change inside the UDF.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, n_bytes long, "
    "phash string, mean_luma double"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, ts_ms int, frame_phash string"


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: derives stable 'pixels' from the
    content hash. Stands in for PIL.Image.open until codecs exist."""
    h = hashlib.sha256(payload or b"").digest()
    return {
        "width": 16 + h[0],
        "height": 16 + h[1],
        "mean_luma": round(h[2] / 255.0, 6),
        "phash": h[:8].hex(),
    }


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract images: Arrow-batched mapInPandas, one
    Python invocation per ~10k rows. Partitioning: payload-bearing rows
    are repartitioned by media_id hash upstream so batch byte-sizes stay
    bounded (binary columns dominate memory)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError(
                        "real image decode requires PIL/libvips — not in this container"
                    )
                d = _fake_decode(bytes(r.payload) if r.payload is not None else b"")
                rows.append({
                    "media_id": r.media_id,
                    "width": d["width"], "height": d["height"],
                    "n_bytes": len(r.payload or b""),
                    "phash": d["phash"], "mean_luma": d["mean_luma"],
                })
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "width", "height", "n_bytes", "phash", "mean_luma"]
            )

    return (
        media.filter(F.col("kind") == "image")
        .repartition(F.xxhash64("media_id"))
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Frame sampling for video: expands each video row into one row per
    sampled frame (flatMap shape via mapInPandas)."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError("real frame decode requires ffmpeg")
                dur = (r.meta["duration_ms"] or 0) if r.meta is not None else 0
                payload = bytes(r.payload) if r.payload is not None else b""
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    h = hashlib.sha256(payload + ts.to_bytes(4, "big")).hexdigest()[:16]
                    rows.append({"media_id": r.media_id, "frame_idx": i,
                                 "ts_ms": ts, "frame_phash": h})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "frame_idx", "ts_ms", "frame_phash"]
            )

    return (
        media.filter(F.col("kind") == "video")
        .repartition(F.xxhash64("media_id"))
        .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media fixture (images + videos) for tests."""
    rows = []
    for i in range(n):
        kind = "image" if i % 3 else "video"
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        rows.append((
            f"m{i}", kind, bytearray(payload),
            ("image/png" if kind == "image" else "video/mp4",
             64, 48, 0 if kind == "image" else 3000 + i * 100),
        ))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
