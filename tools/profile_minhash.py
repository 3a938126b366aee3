"""Stage-level breakdown of the minhash-LSH dedup path (r16, guide §1).

Times each stage of minhash_lsh_dedup_pairs + connected_components in
isolation with the noop sink, on the bench session, so we optimize the
stage that actually dominates rather than the one that looks guilty.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label:45s} {dt:7.2f} s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_compaction_spark import registry
    from iceberg_compaction_spark.operators import dedup as dd

    # bench-style warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    for rep in range(int(os.environ.get("REPS", "2"))):
        print(f"--- rep {rep} ---", flush=True)
        spark.catalog.clearCache()
        # canary first
        t("canary mor_full", lambda: noop(registry.QUERIES["mor_full"](spark, sf_dir)))

        sets = dd.shingle_sets(docs)
        t("shingle_sets (no persist, noop)", lambda: noop(sets))
        sets_p = sets.persist()
        t("shingle_sets persist materialize", lambda: sets_p.count())
        sigs = dd.minhash_signatures(docs, sets=sets_p)
        t("minhash_signatures (from persisted sets)", lambda: noop(sigs))
        sigs_p = sigs.persist()
        t("sigs persist materialize", lambda: sigs_p.count())
        cands = dd.lsh_candidate_pairs(sigs_p)
        t("lsh_candidate_pairs (band join+dedup)", lambda: noop(cands))
        pairs = dd.minhash_lsh_dedup_pairs(docs, threshold_ppm=600000)
        t("FULL minhash_lsh_dedup_pairs", lambda: noop(pairs))
        spark.catalog.clearCache()
        t("FULL dedup_minhash_lsh (registry, cold)", lambda: noop(
            registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir)))
        t("FULL pipeline_curation_full (registry)", lambda: noop(
            registry.QUERIES["pipeline_curation_full"](spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
