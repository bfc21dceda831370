"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extraction / resize / frame-sampling are
Arrow-batched ``mapInPandas`` stages. The image/audio codec libraries
are NOT in this environment, so the byte→pixels step is STUBBED: with
``deterministic_fake=True`` it derives stable pseudo-features from
the bytes (md5-seeded), otherwise it raises NotImplementedError. The
Spark-side plumbing — schemas, batch iteration, partitioning, UDF
signatures — is real and tested; swapping the stub for PIL/ffmpeg is
a one-function change.

Scale design: media rows are big (MBs); the decode stage is
``mapInPandas`` so each task streams batches instead of materializing
a partition, and a ``repartition(n)`` before decode spreads hot media
evenly. Feature vectors come out as ``array<float>`` ready for the
similarity operators.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def documents_as_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministically wrap a text table as a media table (binary
    payload + typed metadata) so the multimodal pipeline is testable
    with the driver's synthetic data."""
    payload = F.unhex(F.concat(F.md5("text"), F.md5(F.concat(F.lit("2|"), "text"))))
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("media"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            ((F.col("n_chars") % 7) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: md5-seeded uniform
    floats. REPLACE with PIL/torchaudio/ffmpeg when available."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(n).astype(np.float32)


def extract_features(
    media: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    feature_dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Decode + featurize each media blob → (id, features
    array<float>, n_bytes). Real Arrow batch plumbing; stubbed codec.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media codecs are not available in this environment; "
                    "pass deterministic_fake=True or plug in a decoder here"
                )
            feats = [
                _fake_decode(bytes(b), feature_dim).tolist()
                for b in pdf[media_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "features": feats,
                    "n_bytes": [len(bytes(b)) for b in pdf[media_col]],
                }
            )

    return media.select(id_col, media_col).mapInPandas(run, out_schema)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-style frame sampling: one row per sampled frame index —
    pure built-in sequence/explode, no decode needed for the index
    plan (decode happens per-frame downstream)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize PLANNING (the aspect-preserving target geometry) as pure
    column math; the pixel resample itself lives behind the decode
    stub."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h))
    return media.withColumn(
        "resize_target",
        F.struct(
            F.ceil(w * scale).cast("int").alias("width"),
            F.ceil(h * scale).cast("int").alias("height"),
        ),
    )
