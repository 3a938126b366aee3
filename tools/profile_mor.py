"""MOR-path breakdown (r16, guide §1): mor_full / mor_pos_delete /
datasource_mor_read phase timings at sf0.1 and on the perturbed 10x
fixture of sf0.01, plus job counts around the datasource read so the
plan-phase Python-worker cost is measured, not guessed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"{label:52s} {dt:7.2f} s", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_compaction_spark import registry
    from iceberg_compaction_spark.operators import synthetic as syn

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    syn.position_delete_table(spark, sf_dir).count()
    syn.equality_delete_table(spark, sf_dir).count()

    for rep in range(int(os.environ.get("REPS", "3"))):
        print(f"--- rep {rep} (sf_dir={sf_dir}) ---", flush=True)
        t("canary mor_full", lambda: noop(registry.QUERIES["mor_full"](spark, sf_dir)))
        t("mor_pos_delete", lambda: noop(registry.QUERIES["mor_pos_delete"](spark, sf_dir)))
        t("mor_eq_delete", lambda: noop(registry.QUERIES["mor_eq_delete"](spark, sf_dir)))
        # datasource_mor_read phases
        from iceberg_compaction_spark.sources.datasource import register as _reg

        wh = t("  ds: warehouse fixture (cached after first)", lambda: syn.datasource_warehouse(spark, sf_dir))
        _reg(spark)
        df = t("  ds: load() [lookup+create+schema workers]", lambda: (
            spark.read.format("iceberg-table")
            .option("warehouse", wh)
            .option("table", "lineitem_mor")
            .load()
        ))
        t("  ds: action [plan worker + executor read]", lambda: noop(syn.output_select(df)))
        t("datasource_mor_read (whole registry fn)", lambda: noop(
            registry.QUERIES["datasource_mor_read"](spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
