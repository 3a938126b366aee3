"""Build an N-times scaled replica of a testdata dir for throughput
validation (VERDICT r4 item 9: show the sf0.1 bench is overhead-
dominated, not throughput-bound).

Each replica shifts every id by ``replica * stride`` and perturbs
content so replicas are NOT near-duplicates of each other (a naive
10x copy turns every doc into a 10-way duplicate group, which changes
the workload instead of scaling it):

- documents: ~30% of tokens get a replica-specific suffix, driving
  cross-replica 3-gram Jaccard far below any dedup threshold;
- embeddings: a deterministic per-(replica, dim) offset in [-0.05, 0.05]
  decorrelates vectors across replicas;
- lineitem: id shift only (TPC-H queries aggregate, they don't dedup).

Everything runs as Spark jobs writing parquet — no driver-side
materialization, so the same script scales the fixture to any factor.

Usage: python tools/scale_fixture.py [factor] [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

ID_STRIDE = 1_000_000_000


def scale_documents(spark, src: str, dst: str, factor: int) -> None:
    base = spark.read.parquet(f"{src}/documents.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * ID_STRIDE)
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.when(
                            F.pmod(F.xxhash64(t, F.col("rep")), 10) < 3,
                            F.concat(t, F.lit("_r"), F.col("rep")),
                        ).otherwise(t),
                    ),
                    " ",
                )
            ),
        )
        .drop("rep")
    )
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")


def scale_embeddings(spark, src: str, dst: str, factor: int) -> None:
    base = spark.read.parquet(f"{src}/embeddings.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * ID_STRIDE)
        .withColumn(
            "embedding",
            # rotate components by `rep` positions: preserves the norm and
            # the per-component distribution exactly, while rotated copies
            # are near-orthogonal to the original in expectation — so the
            # scaled corpus has the same density statistics as the base
            # one instead of per-replica self-similarity artifacts
            F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.slice(
                        F.col("embedding"),
                        F.col("rep") + 1,
                        F.size("embedding") - F.col("rep"),
                    ),
                    F.slice(F.col("embedding"), F.lit(1), F.col("rep")),
                )
            ),
        )
        .drop("rep")
    )
    out.write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")


def scale_lineitem(spark, src: str, dst: str, factor: int) -> None:
    base = spark.read.parquet(f"{src}/lineitem.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * ID_STRIDE)
        .drop("rep")
    )
    out.write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")


def scale_orders(spark, src: str, dst: str, factor: int) -> None:
    # o_orderkey shifts by the SAME stride as lineitem's l_orderkey so
    # the order-revenue join keeps exactly one match per replica pair;
    # o_custkey shifts too so customer-side joins stay per-replica
    base = spark.read.parquet(f"{src}/orders.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * ID_STRIDE)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("rep") * ID_STRIDE)
        .drop("rep")
    )
    out.write.mode("overwrite").parquet(f"{dst}/orders.parquet")


def scale_events(spark, src: str, dst: str, factor: int) -> None:
    # user/event ids shift per replica (each replica is a disjoint user
    # population — sessionization/funnel state stays per-user-sized);
    # timestamps keep their range so window/watermark shapes are
    # unchanged, the event RATE per window grows by the factor — which
    # is exactly how a bigger deployment looks
    base = spark.read.parquet(f"{src}/events.parquet")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    out = (
        base.crossJoin(F.broadcast(reps))
        .withColumn("event_id", F.col("event_id") + F.col("rep") * ID_STRIDE)
        .withColumn("user_id", F.col("user_id") + F.col("rep") * ID_STRIDE)
        .drop("rep")
    )
    out.write.mode("overwrite").parquet(f"{dst}/events.parquet")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/scale_x{factor}"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    os.makedirs(dst, exist_ok=True)
    scale_documents(spark, src, dst, factor)
    scale_embeddings(spark, src, dst, factor)
    scale_lineitem(spark, src, dst, factor)
    scale_orders(spark, src, dst, factor)
    scale_events(spark, src, dst, factor)
    # small dims pass through unscaled (genuine dimension tables: a 10x
    # fact load does not imply 10x regions/nations; supplier/part/
    # customer joins stay broadcast-sized exactly as they would at scale)
    import shutil

    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
    ]:
        s = f"{src}/{t}.parquet"
        d = f"{dst}/{t}.parquet"
        if os.path.isfile(s) and not os.path.exists(d):
            shutil.copyfile(s, d)
    print(f"wrote x{factor} fixture to {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
