"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Large-scale training pipelines carry images/audio/video as ``binary``
columns with typed metadata structs.  This module implements the
Spark-side plumbing — schema, Arrow-batched ``mapInPandas`` decode
stage, partitioning — for real.  The actual codec calls are STUBBED
(this container has no image/audio libraries): ``decode_meta`` computes a
deterministic fake decode from the payload bytes, and ``decode_pixels``
raises ``NotImplementedError`` with the integration point documented.

The mapInPandas stage is the honest shape of a 100 TB decode job:
Arrow-batched transfer, per-batch vectorized work in pandas, output
schema declared up front, no driver involvement.  Swapping the fake
arithmetic for ``PIL.Image.open(io.BytesIO(payload))`` is a one-line
change inside the same plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def to_binary_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: utf-8 payload bytes + media-type tag."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("fake/image").alias("media_type"),
    )


def decode_meta(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched "decode" extracting typed metadata per payload.

    The fake decode is pure arithmetic on payload length (deterministic,
    reproduced by the SQL oracle): a real deployment replaces the body of
    ``_decode_batch`` with the codec call and keeps everything else.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blen = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "byte_len": blen,
                    "width": (16 * (1 + blen % 64)).astype("int32"),
                    "height": (16 * (1 + blen % 48)).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "n_frames": (1 + blen % 7).astype("int32"),
                }
            )

    return binary_df.mapInPandas(_decode_batch, DECODED_META_SCHEMA)


def decode_pixels(binary_df: DataFrame) -> DataFrame:
    """Real pixel decode — requires an image codec library.

    Integration point: mapInPandas with schema
    (doc_id long, height int, width int, pixels array<array<int>>);
    body would be ``PIL.Image.open(io.BytesIO(p))``.
    """
    raise NotImplementedError(
        "no image codec in this environment; use decode_meta for the "
        "metadata path — the mapInPandas plumbing is identical"
    )


def frame_sample_plan(
    decoded_meta: DataFrame, every_k: int = 2
) -> DataFrame:
    """Plan frame extraction for "video" payloads: one row per sampled
    frame index (explode of a sequence — the fan-out shape of a real
    frame sampler)."""
    return decoded_meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_idx"),
    )
