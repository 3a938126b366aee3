"""Same-session interleaved A/B: token-array staging in with_quality /
with_language_id (r16 s3).

OLD arms reproduce the pre-staging forms verbatim (tokenize expression
embedded under every HOF filter); NEW arms are the shipped operators.
Canary (mor_full) carried per rep, per BASELINE.md discipline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_quality(docs, tx):
    c = F.col("text")
    n = F.length(c)
    n_safe = F.greatest(n, F.lit(1))
    _ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    alpha = n - F.length(F.translate(c, _ALPHA, ""))
    digit = n - F.length(F.translate(c, "0123456789", ""))
    space = n - F.length(F.translate(c, " ", ""))
    toks = tx._tokens(c)
    n_toks = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(toks))
    n_toks_safe = F.greatest(n_toks, F.lit(1))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*tx.ENGLISH_STOPWORDS))
    )
    avg = (alpha + digit) / n_toks_safe
    score = F.least(
        F.greatest(
            alpha / n_safe
            + F.least(stop_hits / n_toks_safe, F.lit(0.2))
            + F.least(space / n_safe, F.lit(0.25))
            - digit / n_safe,
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    P = lambda x: F.floor(x * 1000000).cast("long")
    return (
        docs.withColumn("n_chars_c", n.cast("int"))
        .withColumn("n_tokens", n_toks.cast("int"))
        .withColumn("alpha_ppm", P(alpha / n_safe))
        .withColumn("digit_ppm", P(digit / n_safe))
        .withColumn("space_ppm", P(space / n_safe))
        .withColumn("stopword_ppm", P(stop_hits / n_toks_safe))
        .withColumn("avg_token_len_ppm", P(avg))
        .withColumn("quality_ppm", P(score))
    )


def old_lang(docs, tx):
    c = F.col("text")

    def _hits(words):
        toks = tx._tokens(c)
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    out = docs
    for (nm, words) in tx.LANG_PROFILES:
        out = out.withColumn(f"score_{nm}", _hits(words).cast("int"))
    bn = F.lit(tx.LANG_PROFILES[0][0])
    bs = F.col(f"score_{tx.LANG_PROFILES[0][0]}")
    for nm, _ in tx.LANG_PROFILES[1:]:
        sc = F.col(f"score_{nm}")
        bn = F.when(sc > bs, F.lit(nm)).otherwise(bn)
        bs = F.when(sc > bs, sc).otherwise(bs)
    return out.withColumn("pred_lang", bn).withColumn(
        "pred_score", bs.cast("int")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_compaction_spark import registry
    from iceberg_compaction_spark.operators import text as tx

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    reps = int(os.environ.get("REPS", "5"))
    for rep in range(reps):
        t0 = time.monotonic()
        noop(registry.QUERIES["mor_full"](spark, sf_dir))
        can = time.monotonic() - t0
        t0 = time.monotonic()
        noop(old_quality(docs, tx))
        oq = time.monotonic() - t0
        t0 = time.monotonic()
        noop(tx.with_quality(docs))
        nq = time.monotonic() - t0
        t0 = time.monotonic()
        noop(old_lang(docs, tx))
        ol = time.monotonic() - t0
        t0 = time.monotonic()
        noop(tx.with_language_id(docs))
        nl = time.monotonic() - t0
        print(
            f"rep {rep}: canary {can:5.2f}  quality old {oq:5.2f} new {nq:5.2f}"
            f"  lang old {ol:5.2f} new {nl:5.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
