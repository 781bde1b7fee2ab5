"""Multimodal columns: images/audio/video as opaque binary + metadata.

Not in the reference (postgresml is text+tabular); required for a
100 TB training-data pipeline. Design:

- an asset is a row: (asset_id, kind, data BINARY, meta STRUCT) —
  the parquet-native layout for blobs; large assets would move to
  object-store URIs with the same schema minus `data`.
- decode / feature-extract / resize / frame-sample run as
  `mapInPandas` (Arrow batch iterator — the only sane shape for
  per-blob Python work at scale: no per-row pickling, bounded memory
  via maxRecordsPerBatch).
- the actual codecs (PIL/av/soundfile) are NOT in this image: each
  operator takes a `decoder` callable; `fake_decoder` is the
  deterministic stand-in (documented), and `strict_decoder` raises
  NotImplementedError to mark the integration point.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)


def fake_decoder(data: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo-pixel array of the
    declared (height, width) via seeded hashing. Keeps every downstream
    shape real (dtype, dims) without image libs."""
    h = int(meta.get("height") or 8)
    w = int(meta.get("width") or 8)
    seed = int.from_bytes(hashlib.md5(data or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def strict_decoder(data: bytes, meta: dict) -> np.ndarray:
    raise NotImplementedError(
        "real image/audio decode requires PIL/av/soundfile — not in this "
        "image; pass decoder=fake_decoder for deterministic testing"
    )


def extract_features(
    assets: DataFrame,
    decoder: Callable[[bytes, dict], np.ndarray] = strict_decoder,
    n_features: int = 8,
) -> DataFrame:
    """Decode + per-asset feature vector (mean/std/quantiles of the
    decoded array) via mapInPandas. Output:
    (asset_id, features array<double>)."""

    out_schema = "asset_id long, features array<double>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for _, row in pdf.iterrows():
                arr = decoder(row["data"], dict(row["meta"]) if row["meta"] is not None else {})
                a = arr.astype("float64").ravel()
                qs = np.quantile(a, [0.1, 0.25, 0.5, 0.75, 0.9]) if a.size else np.zeros(5)
                feats.append(
                    [float(a.mean() if a.size else 0), float(a.std() if a.size else 0),
                     float(a.size)] + [float(x) for x in qs]
                )
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return assets.mapInPandas(op, schema=out_schema)


def resize(
    assets: DataFrame,
    height: int,
    width: int,
    decoder: Callable[[bytes, dict], np.ndarray] = strict_decoder,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode as raw bytes.
    Output: (asset_id, data binary, meta struct) with updated dims."""

    out_schema = (
        "asset_id long, data binary, "
        "meta struct<width:int, height:int, duration_ms:int, format:string>"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                arr = decoder(row["data"], dict(row["meta"]) if row["meta"] is not None else {})
                ys = (np.arange(height) * arr.shape[0] // height).clip(0, arr.shape[0] - 1)
                xs = (np.arange(width) * arr.shape[1] // width).clip(0, arr.shape[1] - 1)
                small = arr[np.ix_(ys, xs)]
                rows.append(
                    {
                        "asset_id": row["asset_id"],
                        "data": small.tobytes(),
                        "meta": {"width": width, "height": height,
                                 "duration_ms": None, "format": "raw"},
                    }
                )
            yield pd.DataFrame(rows)

    return assets.mapInPandas(op, schema=out_schema)


def frame_sample(
    assets: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame sampling plan: one output row per sampled timestamp
    (decode stubbed — the row fan-out, which is the Spark-side cost, is
    real). Output: (asset_id, frame_ts_ms)."""
    n_frames = (
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / F.lit(every_ms)
    ).cast("int")
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
        .drop("frame_idx")
    )
