"""Same-session interleaved A/B for the r16 cdc pre-emission filter.

Old arm = row_changes_single_scan verbatim as of commit a721a24 (emit
both signed variants for EVERY base row; carried rows cancel in the
partial aggregate but still cross the exchange as zero-delta groups).
New arm = the current registry entry (carried rows pre-filtered out of
the emission entirely).  Arms alternate rep-by-rep in one session per
the BASELINE.md host-tide discipline; a mor_full canary brackets reps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_single_scan(base, new_keep, new_overrides):
    from iceberg_compaction_spark.sources.changes import (
        _expand_signed_delta,
    )

    cols = base.columns
    old_struct = F.struct(
        *[F.col(c).alias(c) for c in cols],
        F.lit(-1).cast("long").alias("__side"),
    )
    new_struct = F.struct(
        *[
            new_overrides[c].alias(c)
            if c in new_overrides
            else F.col(c).alias(c)
            for c in cols
        ],
        F.lit(1).cast("long").alias("__side"),
    )
    tagged = (
        base.select(
            F.explode(
                F.array(old_struct, F.when(new_keep, new_struct))
            ).alias("__v")
        )
        .where(F.col("__v").isNotNull())
        .select("__v.*")
    )
    return _expand_signed_delta(tagged, cols)


def old_cdc_changelog(spark, sf_dir):
    from iceberg_compaction_spark.operators import synthetic as syn

    base = syn.output_select(
        spark.read.parquet(syn.lineitem_path(sf_dir)).where(
            ~F.expr(syn.POS_RULE_SQL)
        )
    )
    touched = F.col("l_orderkey") % 17 == 0
    return old_single_scan(
        base,
        new_keep=~touched | (F.col("l_linenumber") == 1),
        new_overrides={
            "l_quantity": F.when(
                touched, F.col("l_quantity") + 1000
            ).otherwise(F.col("l_quantity"))
        },
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

    arms = {
        "cdc_old": lambda: noop(old_cdc_changelog(spark, sf_dir)),
        "cdc_new": lambda: noop(
            registry.QUERIES["cdc_changelog"](spark, sf_dir)
        ),
        "cdc_img_new": lambda: noop(
            registry.QUERIES["cdc_update_images"](spark, sf_dir)
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
        print(f"  {k:12s} min={s[0]:6.2f} med={s[len(s)//2]:6.2f} all={v}")
    spark.stop()


if __name__ == "__main__":
    main()
