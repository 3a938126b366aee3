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


def frame_sample_udtf(spark, decoded_meta: DataFrame, every_k: int = 2):
    """Python-UDTF twin of :func:`frame_sample_plan` — completes the
    UDF/UDAF/UDTF surface (SURVEY.md §2.9: the reference has none; we
    carry pandas UDFs, a grouped-agg UDAF, and this table function).

    A UDTF is the right tool when per-row fan-out needs imperative
    logic a ``sequence``/``explode`` can't express (e.g. codec-driven
    keyframe selection where the output rows depend on parsing the
    payload).  Here the logic IS expressible — frame_sample_plan is the
    production path and this twin exists to pin the UDTF plumbing
    (registration, lateral join shape, row-yield semantics) against it.

    UDTFs run row-at-a-time in Python workers — the slow path.  The
    eval ships only (doc_id, n_frames), never the binary payload, so
    the Arrow transfer stays metadata-thin regardless of blob size.
    """
    import uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, frame_idx: int")
    class FrameSampler:
        def eval(self, doc_id: int, n_frames: int, k: int):
            for i in range(0, n_frames, k):
                yield doc_id, i

    spark.udtf.register("frame_sampler", FrameSampler)
    view = f"__frame_meta_{uuid.uuid4().hex[:8]}"
    decoded_meta.select("doc_id", "n_frames").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT f.doc_id, f.frame_idx FROM {view}, "
        f"LATERAL frame_sampler(doc_id, n_frames, {int(every_k)}) f"
    )
