"""Same-session interleaved A/B for the r16 span-coverage window rewrite.

Old arm = span_dup_coverage as of a721a24 (dup set via a second groupBy
over `g` joined back — Catalyst re-evaluates the corpus lineage per
consumer).  New arm = current operator (window over the reduced set).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_span_dup_coverage(df, text_col="text", id_col="doc_id", k=8):
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), toks.alias("__t"))
        .where(F.size("__t") >= k)
        .select(
            F.col(id_col),
            F.size("__t").alias("__n"),
            F.transform("__t", lambda x: F.xxhash64(x)).alias("__th"),
        )
    )
    idx = F.when(
        F.col("__n") >= k, F.sequence(F.lit(0), F.col("__n") - k)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(
        idx, lambda i: F.xxhash64(F.slice(F.col("__th"), i + 1, k))
    )
    sh = base.select(F.col(id_col), F.explode(shingles).alias("h"))
    g = sh.groupBy("h", id_col).agg(F.count(F.lit(1)).alias("__c"))
    dup = (
        g.groupBy("h")
        .agg(F.min(id_col).alias("__lo"), F.max(id_col).alias("__hi"))
        .where(F.col("__lo") != F.col("__hi"))
        .select("h")
    )
    tot = base.select(
        F.col(id_col),
        (F.col("__n") - k + 1).cast("long").alias("total_shingles"),
    )
    d = g.join(dup, "h").groupBy(id_col).agg(
        F.sum("__c").alias("dup_shingles")
    )
    return tot.join(d, id_col, "left").select(
        F.col(id_col),
        F.col("total_shingles").cast("long").alias("total_shingles"),
        F.coalesce(F.col("dup_shingles"), F.lit(0))
        .cast("long")
        .alias("dup_shingles"),
        F.floor(
            1e6
            * F.coalesce(F.col("dup_shingles"), F.lit(0))
            / F.col("total_shingles")
        )
        .cast("long")
        .alias("dup_ppm"),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "5"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_compaction_spark import registry

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    from iceberg_compaction_spark.registry import _SPAN_K

    arms = {
        "span_old": lambda: noop(old_span_dup_coverage(docs, k=_SPAN_K)),
        "span_new": lambda: noop(
            registry.QUERIES["dedup_span_coverage"](spark, sf_dir)
        ),
    }
    results = {k: [] for k in arms}
    results["canary"] = []
    for r in range(reps):
        t0 = time.monotonic()
        noop(registry.QUERIES["mor_full"](spark, sf_dir))
        results["canary"].append(round(time.monotonic() - t0, 2))
        for name, fn in arms.items():
            t0 = time.monotonic()
            fn()
            results[name].append(round(time.monotonic() - t0, 2))
        print(
            f"rep {r}: "
            + " ".join(f"{k}={v[-1]}" for k, v in results.items()),
            flush=True,
        )
    print("MEDIANS/MINS:")
    for k, v in results.items():
        s = sorted(v)
        print(f"  {k:10s} min={s[0]:6.2f} med={s[len(s)//2]:6.2f} all={v}")
    spark.stop()


if __name__ == "__main__":
    main()


