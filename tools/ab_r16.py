"""Same-session interleaved A/Bs for the r16 formulation changes.

The old formulations are reproduced inline (verbatim from the r15 tree)
so both arms run in ONE session, alternating rep-by-rep — the only
methodology this host's 2-3x load tides permit (see BASELINE.md).
Arms: minhash signature staging, winnow pair bucketing, unigram total
window, and the curation flagship end-to-end (old arm = old sigs + old
CC edge build via a monkeypatch-free inline pipeline).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- old formulations (r15 tree, verbatim shapes) -------------------------

def old_minhash_pairs(docs, threshold_ppm):
    from iceberg_compaction_spark.operators import dedup as dd

    sets = dd.shingle_sets(docs).persist()
    sh = sets.select(F.col("doc_id"), F.explode("shs").alias("shingle"))

    def _sig(a, b):
        return F.array_min(
            F.transform(
                F.col("shs"),
                lambda s: (F.lit(a) * dd.md5_hash64(s) + F.lit(b))
                % dd.MERSENNE_P,
            )
        )

    cols = [
        _sig(a, b).alias(f"sig_{i}")
        for i, (a, b) in enumerate(dd.hash_params(dd.DEFAULT_NUM_HASHES))
    ]
    sigs = sets.select(F.col("doc_id"), *cols).persist()
    cands = dd.lsh_candidate_pairs(sigs, "doc_id")
    sizes = sets.select(F.col("doc_id"), "sz")
    sh_a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sh_b = sh.select(
        F.col("doc_id").alias("__b_id"), F.col("shingle").alias("__b_shingle")
    )
    inter = (
        cands.join(sh_a, on="id_a")
        .join(
            sh_b,
            (F.col("id_b") == F.col("__b_id"))
            & (F.col("shingle") == F.col("__b_shingle")),
            "inner",
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard_ppm",
            F.floor(
                F.col("inter") * 1000000.0
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).cast("long"),
        )
        .where(F.col("jaccard_ppm") >= threshold_ppm)
        .select("id_a", "id_b", "jaccard_ppm")
    )


def old_winnow_pairs(docs):
    from iceberg_compaction_spark.operators.text import winnow_fingerprints

    e = winnow_fingerprints(docs, k=5, w=4)
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    return (
        pairs.groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )


def old_unigram(docs):
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != ""
            )
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__n"))
    total = counts.agg(F.sum("__n").alias("__t"))
    freqs = counts.crossJoin(F.broadcast(total)).select(
        "token", (F.col("__n") / F.col("__t")).alias("p")
    )
    scored = toks.join(freqs, "token", "left").withColumn(
        "p", F.coalesce(F.col("p"), F.lit(1e-9))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.avg(F.log2("p"))).alias("logprob"),
    )



def old_cc(pairs):
    # r15 connected_components edge build + fast path, verbatim
    from iceberg_compaction_spark.operators.dedup import (
        CC_DRIVER_MAX_EDGES,
        _union_find_components,
    )

    half_edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint()
    edges = (
        half_edges.union(
            half_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    n_edges = edges.count()
    assert 0 < n_edges <= CC_DRIVER_MAX_EDGES
    half = [
        (r["src"], r["dst"])
        for r in edges.where(F.col("src") < F.col("dst")).collect()
    ]
    comp = _union_find_components(half)
    spark = pairs.sparkSession
    return spark.createDataFrame(
        sorted(comp.items()), schema="doc_id long, component_id long"
    )


def old_curation(spark, docs, sf_dir):
    from iceberg_compaction_spark.operators import text as tx

    pairs = old_minhash_pairs(docs, 600000)
    cc = old_cc(pairs)
    demoted = cc.where(F.col("component_id") != F.col("doc_id")).select("doc_id")
    kept = docs.join(demoted, "doc_id", "left_anti")
    q = tx.with_quality(kept).select("doc_id", "n_tokens", "stopword_ppm")
    return q.where(
        (F.col("n_tokens") >= 40) & (F.col("stopword_ppm") >= 50000)
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "4"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_compaction_spark import registry

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    from iceberg_compaction_spark.operators import synthetic as syn

    syn.position_delete_table(spark, sf_dir).count()
    syn.equality_delete_table(spark, sf_dir).count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    arms = {
        "minhash_old": lambda: noop(old_minhash_pairs(docs, 600000)),
        "minhash_new": lambda: noop(
            registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir)
        ),
        "curation_old": lambda: noop(old_curation(spark, docs, sf_dir)),
        "curation_new": lambda: noop(
            registry.QUERIES["pipeline_curation_full"](spark, sf_dir)
        ),
        "winnow_old": lambda: noop(old_winnow_pairs(docs)),
        "winnow_new": lambda: noop(
            registry.QUERIES["dedup_winnow_pairs"](spark, sf_dir)
        ),
        "unigram_old": lambda: noop(old_unigram(docs)),
        "unigram_new": lambda: noop(
            registry.QUERIES["text_unigram_logprob"](spark, sf_dir)
        ),
    }
    results = {k: [] for k in arms}
    results["canary"] = []
    for r in range(reps):
        t0 = time.monotonic()
        noop(registry.QUERIES["mor_full"](spark, sf_dir))
        results["canary"].append(round(time.monotonic() - t0, 2))
        for name, fn in arms.items():
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn()
            results[name].append(round(time.monotonic() - t0, 2))
        print(f"rep {r}: " + " ".join(f"{k}={v[-1]}" for k, v in results.items()), flush=True)
    print("MEDIANS/MINS:")
    for k, v in results.items():
        s = sorted(v)
        print(f"  {k:14s} min={s[0]:6.2f} med={s[len(s)//2]:6.2f} all={v}")
    spark.stop()


if __name__ == "__main__":
    main()
