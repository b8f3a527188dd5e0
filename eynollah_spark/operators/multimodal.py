"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (this container ships no image/audio
libraries — see the NotImplementedError / deterministic-fake switch),
but everything Spark-side is real and tested: schemas, Arrow batch
shapes, mapInPandas signatures, partition-size control. On a real
cluster you'd drop cv2/PIL/torchaudio calls into `_decode_one` and
nothing else changes — that is the point of the seam.

Design mirrors the extraction kernel: decode/feature-extract is a
NARROW mapInPandas over the scan (no shuffle), metadata filtering is
pushed down before any binary byte moves, and frame sampling fans out
rows like a UDTF (one asset -> many frames).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)

FEATURE_DIM = 16


def _decode_one(payload: bytes, modality: str, fake: bool) -> np.ndarray:
    """The library seam. Real implementation would be:
        image -> cv2.imdecode(np.frombuffer(payload), cv2.IMREAD_COLOR)
        audio -> soundfile.read(io.BytesIO(payload))
    Neither library exists in this container."""
    if not fake:
        raise NotImplementedError(
            "binary decode requires cv2/PIL/soundfile — not present in this "
            "environment; pass fake_decode=True for the deterministic stub"
        )
    # deterministic fake: feature = byte histogram folded to FEATURE_DIM
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
    total = hist.sum()
    return hist / total if total else hist


def extract_features(
    assets: DataFrame, fake_decode: bool = True, batch_size_hint: int = 64
) -> DataFrame:
    """Narrow decode/feature stage: binary in, fixed-dim feature out.
    Metadata columns ride along so downstream filters never re-decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(p, m, fake_decode).tolist()
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    pruned = assets.select("asset_id", "modality", "payload")
    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """UDTF-style fan-out: one video asset -> N frame rows, sampled on a
    fixed time grid. The stub emits deterministic byte slices standing
    in for encoded frames; schema/partitioning are production-shaped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for aid, dur, payload in zip(
                pdf["asset_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if not fake_decode:
                    raise NotImplementedError("video decode requires ffmpeg/cv2")
                dur = int(dur or 0)
                n = max(1, dur // every_ms)
                pl = payload or b"\x00"
                for i in range(n):
                    lo = (i * len(pl)) // n
                    hi = ((i + 1) * len(pl)) // n
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(bytes(pl[lo:hi]))
            yield pd.DataFrame(out)

    pruned = assets.filter(F.col("modality") == "video").select(
        "asset_id", "duration_ms", "payload"
    )
    return pruned.mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_assets(spark, n: int = 32, seed: int = 0) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""
    import hashlib

    rows = []
    for i in range(n):
        h = hashlib.md5(f"{seed}:{i}".encode()).digest()
        modality = ["image", "audio", "video"][i % 3]
        payload = (h * (4 + i % 7))[: 64 + (i * 13) % 256]
        rows.append(
            (
                f"asset{i:05d}",
                modality,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                64 + i % 512,
                48 + i % 256,
                (i % 10 + 1) * 1000,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)
