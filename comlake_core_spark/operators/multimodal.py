"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas.

Model: a multimodal table is ``(id, content BINARY, meta STRUCT<mime,
n_bytes, ...>)``. Content never leaves the executors; every transform is a
mapInPandas over binary batches, so the 100 TB story is the same scan-
partitioned map-only story as text. Loading uses Spark's binaryFile source
(one row per object, parallelized over files).

Decode is STUBBED in this environment (no image/audio libraries in the
container): each decode function has a real, tested Spark-side pipeline —
schema, batching, partitioning, UDF signature — and a ``codec`` switch:
``fake`` (deterministic bytes-derived values, used by tests) or ``real``
(raises NotImplementedError with the library it would use). Swapping in
PIL/ffmpeg later changes ONLY the inner per-batch function.

The reference stores multimedia content as opaque IPFS blobs and left
'multimedia metadata' as a TODO (reference
src/comlake/core/extract/metadata.clj:74 'TODO: multimedia metadata');
this module is that extension done Spark-first.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "id string, mime string, n_bytes long, width int, height int, features array<float>"
)
FRAME_SCHEMA = "id string, frame_idx int, frame_bytes binary, pts_sec double"
RESIZED_SCHEMA = "id string, width int, height int, pixels binary"
AUDIO_STATS_SCHEMA = "id string, n_samples long, duration_sec double, rms double"


def load_binary_dir(spark: SparkSession, path: str, pattern: str | None = None) -> DataFrame:
    """Directory of blobs → (id, content, meta) rows via the binaryFile
    source (file-parallel; at scale, one task per file/block)."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    raw = reader.load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("id"),
        F.col("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length("content").alias("n_bytes"),
            F.col("modificationTime").alias("modified"),
        ).alias("meta"),
    )


def _fake_image_decode(data: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: dimensions and an 8-dim
    feature vector derived from the content digest."""
    digest = hashlib.sha256(data or b"").digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    features = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, features


def decode_images(df: DataFrame, codec: str = "fake") -> DataFrame:
    """(id, content, meta) → (id, mime, n_bytes, width, height, features).

    mapInPandas: each Arrow batch of binaries is decoded in one Python call;
    output schema is fixed so downstream plans don't depend on the codec."""
    if codec == "real":
        raise NotImplementedError(
            "real image decode needs PIL/opencv (not in this container); "
            "use codec='fake' for the plumbing path"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = {"id": [], "mime": [], "n_bytes": [], "width": [], "height": [], "features": []}
            for _, row in pdf.iterrows():
                data = bytes(row["content"] or b"")
                w, h, feats = _fake_image_decode(data)
                out["id"].append(row["id"])
                out["mime"].append(row["meta"]["mime"] if row["meta"] is not None else None)
                out["n_bytes"].append(len(data))
                out["width"].append(w)
                out["height"].append(h)
                out["features"].append(feats)
            import pandas as pd

            yield pd.DataFrame(out)

    return df.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int = 224, height: int = 224, codec: str = "fake") -> DataFrame:
    """Image resize to a fixed (width, height) — the preprocessing step in
    front of any vision model. Output is a raw pixel buffer of exactly
    width*height bytes (grayscale), so downstream batch shapes are static.

    Fake codec: nearest-neighbor resample over the content bytes treated as
    a square image — numpy-vectorized per batch, index math identical to a
    real nearest-neighbor resize; a real backend (PIL.Image.resize) changes
    only the inner per-batch function. Scale design: map-only over the scan
    (no shuffle), output size is constant per row regardless of input size,
    so executor memory per batch is bounded by batch_size * width * height."""
    if codec == "real":
        raise NotImplementedError("real resize needs PIL/opencv; use codec='fake'")
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"id": [], "width": [], "height": [], "pixels": []}
            for _, row in pdf.iterrows():
                data = np.frombuffer(bytes(row["content"] or b"\x00"), dtype=np.uint8)
                side = max(int(len(data) ** 0.5), 1)
                src = data[: side * side].reshape(side, side)
                ys = (np.arange(height) * side) // height
                xs = (np.arange(width) * side) // width
                resized = src[np.ix_(ys, xs)]
                out["id"].append(row["id"])
                out["width"].append(width)
                out["height"].append(height)
                out["pixels"].append(resized.tobytes())
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, frame_size: int = 256, every_n: int = 2, codec: str = "fake") -> DataFrame:
    """Video frame sampling: one input row fans out to one row per sampled
    frame — the mapInPandas shape for demux-style operators (row fanout
    with binary payloads). Fake codec: fixed-size byte windows as
    'frames' at 30 fps."""
    if codec == "real":
        raise NotImplementedError("real demux needs ffmpeg; use codec='fake'")

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row["content"] or b"")
                n_frames = max(len(data) // frame_size, 1)
                for idx in range(0, n_frames, every_n):
                    chunk = data[idx * frame_size : (idx + 1) * frame_size]
                    rows.append(
                        {
                            "id": row["id"],
                            "frame_idx": idx,
                            "frame_bytes": chunk,
                            "pts_sec": idx / 30.0,
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_bytes", "pts_sec"])

    return df.mapInPandas(batches, FRAME_SCHEMA)


def audio_stats(df: DataFrame, sample_rate: int = 16000, codec: str = "fake") -> DataFrame:
    """Audio feature extraction: bytes → (n_samples, duration, rms).
    Fake codec treats content as signed 8-bit PCM — numpy-vectorized per
    batch, the same shape a real soundfile/librosa decode would take."""
    if codec == "real":
        raise NotImplementedError("real audio decode needs soundfile/librosa; use codec='fake'")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"id": [], "n_samples": [], "duration_sec": [], "rms": []}
            for _, row in pdf.iterrows():
                data = np.frombuffer(bytes(row["content"] or b""), dtype=np.int8).astype("float64")
                out["id"].append(row["id"])
                out["n_samples"].append(len(data))
                out["duration_sec"].append(len(data) / sample_rate)
                out["rms"].append(float(np.sqrt((data**2).mean())) if len(data) else 0.0)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, AUDIO_STATS_SCHEMA)
