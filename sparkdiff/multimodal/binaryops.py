"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
operators.

The container has no image/audio libraries, so the *decode math* is
stubbed (deterministic fake, or ``NotImplementedError`` for real codec
paths) — but everything Spark-side is real and tested: schemas, batch
iteration, partitioning behavior, and output shapes.  Swapping the fake
for PIL/libav is a one-function change per operator.

Scale notes: binary payloads ride the Arrow channel in batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory);
operators are stateless per-batch maps, so they parallelize over
partitions with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal asset schema: opaque bytes + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = (
    "asset_id long, mime string, n_bytes long, sha256 string, "
    "width int, height int"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"asset_id long, features array<float>"

FRAMES_SCHEMA = "asset_id long, frame_idx int, frame_sha256 string"


def synthesize_assets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake assets from a text column (testbed stand-in for
    a real object-store scan): bytes = utf-8 text, dims derived from
    length."""
    n = F.length(F.col(text_col))
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.when(F.col(id_col) % 2 == 0, "image/png")
        .otherwise("video/mp4")
        .alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            (n % 640).cast("int").alias("width"),
            (n % 480).cast("int").alias("height"),
            (n % 24 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, str]:
    return len(content or b""), hashlib.sha256(content or b"").hexdigest()


def decode_assets(assets: DataFrame, real_codec: bool = False) -> DataFrame:
    """Decode pass over binary assets via ``mapInPandas`` (Arrow batches).

    ``real_codec=True`` marks where PIL/libav would be invoked — not
    available in this container, so it raises ``NotImplementedError``.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_codec:
            raise NotImplementedError(
                "real image/audio decoding needs PIL/libav (not installed); "
                "the deterministic fake below pins the operator contract"
            )
        for pdf in batches:
            decoded = pdf["content"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "n_bytes": decoded.map(lambda t: t[0]),
                    "sha256": decoded.map(lambda t: t[1]),
                    "width": pdf["meta"].map(lambda m: m["width"]),
                    "height": pdf["meta"].map(lambda m: m["height"]),
                }
            )

    return assets.mapInPandas(op, schema=DECODED_SCHEMA)


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature-extraction pass: fixed-dim float vector per asset
    (hash-derived fake embedding; a real model would run here, batched)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [
                    (int.from_bytes(
                        hashlib.sha256((c or b"") + bytes([i])).digest()[:4],
                        "big",
                    ) % 10_000) / 10_000.0
                    for i in range(FEATURE_DIM)
                ]
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "features": feats}
            )

    return assets.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling pass for video assets: emit one row per sampled
    frame index (fan-out inside the batch iterator — no explode shuffle)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "frame_sha256": []}
            for _, r in pdf.iterrows():
                n_frames = int(r["meta"]["n_frames"] or 0)
                for idx in range(0, n_frames, every_n):
                    rows["asset_id"].append(r["asset_id"])
                    rows["frame_idx"].append(idx)
                    rows["frame_sha256"].append(
                        hashlib.sha256(
                            (r["content"] or b"") + idx.to_bytes(4, "big")
                        ).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return assets.filter(F.col("mime").startswith("video/")).mapInPandas(
        op, schema=FRAMES_SCHEMA
    )
