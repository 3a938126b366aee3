"""r16 hardening of the r15 similarity kernels (ADVICE r15).

- query-side collect caps on the top-k kernels (silent driver OOM ->
  clear AllPairsScaleError);
- semantic_dedup per-cluster row cap with a results-identical self-join
  fallback for oversized clusters;
- quantize_int8 NaN semantics pinned against the exact expression form
  the kernel replaced (NaN absmax -> scale_micro 0L, not NULL).
"""

import math

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.operators import similarity as sim


def _vectors(spark, n=12, d=4):
    rows = [
        (i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(d)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_topk_kernels_refuse_oversized_query_collect(spark):
    corpus = _vectors(spark, n=10)
    queries = _vectors(spark, n=6)
    with pytest.raises(sim.AllPairsScaleError, match="brute_force_topk"):
        sim.brute_force_topk(corpus, queries, k=2, max_query_rows=3)
    anchors = [([1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0])]
    with pytest.raises(sim.AllPairsScaleError, match="lsh_topk"):
        sim.lsh_topk(corpus, queries, anchors, k=2, max_query_rows=3)
    cb = [[[0, 0], [1000000, 1000000]], [[0, 0], [1000000, 1000000]]]
    with pytest.raises(sim.AllPairsScaleError, match="pq_topk"):
        sim.pq_topk(corpus, queries, cb, k=2, max_query_rows=3)
    # at the cap boundary the kernels still run
    out = sim.brute_force_topk(corpus, queries, k=2, max_query_rows=6)
    assert out.count() > 0


def test_kernels_reject_non_bigint_ids_and_null_embeddings(spark):
    # string ids used to die deep in the kernel with an Arrow schema
    # mismatch; now a clear TypeError at plan time (ADVICE r15)
    sids = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id string, embedding array<double>",
    )
    with pytest.raises(TypeError, match="BIGINT id"):
        sim.brute_force_topk(sids, sids, k=1)
    with pytest.raises(TypeError, match="BIGINT id"):
        sim.semantic_dedup(
            sids,
            spark.createDataFrame(
                [(0, [1.0, 0.0])], "cluster_id long, embedding array<double>"
            ),
            900000,
        )
    # NULL embeddings: a clear kernel error instead of a reshape crash
    nulls = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    ok = spark.createDataFrame(
        [(7, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="NULL ids/embeddings"):
        sim.brute_force_topk(nulls, ok, k=1).collect()


def test_semantic_dedup_cluster_cap_fallback_matches_kernel(spark):
    # two clusters, one of which exceeds the cap -> that cluster must
    # route through the self-join form and produce IDENTICAL survivors
    vecs = spark.createDataFrame(
        [
            # cluster around (1, 0): ids 0-5, with near-duplicates
            (0, [1.0, 0.01]),
            (1, [1.0, 0.011]),
            (2, [0.9, 0.2]),
            (3, [1.0, 0.0105]),
            (4, [0.95, 0.1]),
            (5, [0.92, 0.18]),
            # cluster around (0, 1): ids 10-12
            (10, [0.01, 1.0]),
            (11, [0.011, 1.0]),
            (12, [0.2, 0.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cluster_id long, embedding array<double>",
    )
    thr = 999_000
    base = sorted(
        tuple(r)
        for r in sim.semantic_dedup(
            vecs, cents, thr, max_cluster_rows=None
        ).collect()
    )
    capped = sorted(
        tuple(r)
        for r in sim.semantic_dedup(
            vecs, cents, thr, max_cluster_rows=4
        ).collect()
    )
    assert base == capped
    assert len(base) < 9, "the near-duplicates must actually dedup"
    # cap below EVERY cluster: the kernel path sees nothing, the join
    # fallback decides everything — still identical
    all_join = sorted(
        tuple(r)
        for r in sim.semantic_dedup(
            vecs, cents, thr, max_cluster_rows=1
        ).collect()
    )
    assert base == all_join


def test_quantize_int8_nan_matches_replaced_expression(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, float("nan"), -3.0]),
            (2, [0.0, 0.0, 0.0]),
            (3, [2.0, -4.0, 1.0]),
            (4, [float("inf"), 1.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    # the EXACT expression form the r15 kernel replaced (pre-125c280)
    staged = (
        df.select(
            "vec_id", sim.as_double(F.col("embedding")).alias("__v")
        )
        .select(
            "vec_id",
            "__v",
            F.aggregate(
                F.col("__v"),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            ).alias("__absmax"),
        )
        .select(
            "vec_id",
            "__v",
            "__absmax",
            F.when(
                F.col("__absmax") > 0, F.lit(127.0) / F.col("__absmax")
            ).alias("__scale"),
        )
    )
    absmax, scale = F.col("__absmax"), F.col("__scale")
    old = staged.select(
        "vec_id",
        F.floor(scale * 1000000).cast("long").alias("scale_micro"),
        F.transform(
            F.col("__v"),
            lambda x: F.when(absmax > 0, F.floor(x * scale))
            .otherwise(F.lit(0))
            .cast("long"),
        ).alias("q"),
    )
    old_rows = {r["vec_id"]: (r["scale_micro"], r["q"]) for r in old.collect()}
    new_rows = {
        r["vec_id"]: (r["scale_micro"], r["q"])
        for r in sim.quantize_int8(df).collect()
    }
    assert old_rows == new_rows
    # the NaN row: Spark's NaN-is-largest `> 0` passes, floor(NaN) casts
    # to 0L — NOT NULL (the r15 kernel's divergence, fixed r16)
    assert old_rows[1][0] == 0 and new_rows[1][0] == 0
    assert new_rows[2][0] is None, "all-zero keeps its NULL scale"
    assert not any(
        v is not None and math.isnan(v)
        for pair in new_rows.values()
        for v in pair[1]
    )
