"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract /
resize / frame-sample as Arrow-batched kernels over mapInPandas.

The container has no image/audio libraries, so the DECODE step is
stubbed (NotImplementedError behind an import-try, with a
deterministic fake used by default) — the Spark-side plumbing (schema,
partitioning, UDF signatures, batch shapes) is real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
])

FEATURE_SCHEMA = ("url string, media_type string, feature array<float>, "
                  "n_bytes int")


def try_real_decoder():
    """Return a real image decoder if PIL is available (it is not in
    this container) — the plumbing degrades to the deterministic fake."""
    try:
        from PIL import Image  # noqa: F401
    except Exception:
        return None
    raise NotImplementedError(
        "real decode path: wire PIL.Image.open over io.BytesIO here")


def fake_decode_features(blob: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode+embed: a dim-vector of byte
    histogram statistics. Real byte-level work, no media lib needed."""
    arr = np.frombuffer(blob or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_media_features(df: DataFrame, blob_col: str = "html",
                           url_col: str = "url", dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction over binary blobs: the real
    Arrow-batch shape a decode stage would use (one batch in, one
    typed batch out; no per-row Python round trips to the JVM)."""
    decoder = try_real_decoder()  # None in this container

    def run(batches):
        for pdf in batches:
            blobs = pdf[blob_col]
            feats = [fake_decode_features(b, dim).tolist() for b in blobs]
            yield pd.DataFrame({
                "url": pdf[url_col].astype(object),
                "media_type": pd.Series(["image"] * len(pdf), dtype=object),
                "feature": pd.Series(feats, dtype=object),
                "n_bytes": pd.Series([len(b or b"") for b in blobs], dtype="int32"),
            })

    _ = decoder
    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for video rows: emits (url, frame_ts_ms)
    rows JVM-side from metadata; the decode of each frame would slot
    into extract_media_features. Demonstrates the explode-then-decode
    partitioning shape."""
    return (df
            .withColumn("duration_ms", F.coalesce(F.col("meta.duration_ms"), F.lit(0)))
            .withColumn("frame_ts_ms",
                        F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                                             F.lit(every_ms))))
            .select("url", "frame_ts_ms"))
