"""Same-session interleaved A/B: minhash signature stage formulations.

OLD (r16 session-2 tree): md5 staged once as an array column, 8
interpreted-HOF affine folds + array_min per signature — zero shuffle.
NEW (candidate): explode the persisted shingle sets, compute the md5
as a regular codegen column, fold the 8 signatures as min() aggregates
— partial aggregation collapses the exploded stream back to one row
per doc before the exchange, so the shuffle carries |docs| rows of 8
longs while every md5/affine evaluation runs in whole-stage codegen
instead of the interpreted HOF evaluator.

Both arms read from the SAME persisted sets (the production shape in
minhash_lsh_dedup_pairs).  Equality of the full signature matrix is
asserted in-script before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_sigs(sets, dd):
    hashed = sets.select(
        F.col("doc_id"),
        F.transform(F.col("shs"), dd.md5_hash64).alias("__hs"),
    )

    def _sig(a, b):
        return F.array_min(
            F.transform(
                F.col("__hs"),
                lambda h: (F.lit(a) * h + F.lit(b)) % dd.MERSENNE_P,
            )
        )

    cols = [
        _sig(a, b).alias(f"sig_{i}")
        for i, (a, b) in enumerate(dd.hash_params(dd.DEFAULT_NUM_HASHES))
    ]
    return hashed.select(F.col("doc_id"), *cols)


def new_sigs(sets, dd):
    h = sets.select(
        F.col("doc_id"), F.explode("shs").alias("__s")
    ).select(F.col("doc_id"), dd.md5_hash64(F.col("__s")).alias("__h"))
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % dd.MERSENNE_P).alias(
            f"sig_{i}"
        )
        for i, (a, b) in enumerate(dd.hash_params(dd.DEFAULT_NUM_HASHES))
    ]
    return h.groupBy("doc_id").agg(*aggs)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_compaction_spark import registry
    from iceberg_compaction_spark.operators import dedup as dd

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sets = dd.shingle_sets(docs).persist()
    sets.count()

    # equality gate before timing
    a = sorted(map(tuple, old_sigs(sets, dd).collect()))
    b = sorted(map(tuple, new_sigs(sets, dd).collect()))
    assert a == b, "signature matrices differ"
    print(f"equality: OK over {len(a)} docs", flush=True)

    reps = int(os.environ.get("REPS", "5"))
    for rep in range(reps):
        t0 = time.monotonic()
        noop(registry.QUERIES["mor_full"](spark, sf_dir))
        can = time.monotonic() - t0
        t0 = time.monotonic()
        noop(old_sigs(sets, dd))
        told = time.monotonic() - t0
        t0 = time.monotonic()
        noop(new_sigs(sets, dd))
        tnew = time.monotonic() - t0
        print(
            f"rep {rep}: canary {can:5.2f}  old {told:6.2f}  new {tnew:6.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
