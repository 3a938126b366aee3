"""Table statistics: the ANALYZE surface (Iceberg's
``compute_table_stats`` procedure / ``ANALYZE TABLE ... COMPUTE
STATISTICS FOR COLUMNS``).

Per-column NDV, null count, and min/max over a table's current
snapshot, computed as ONE distributed aggregation, plus
:func:`analyze_table`, which commits the scalars into table properties
(``stats.<col>.ndv`` etc.) stamped with the analyzed snapshot id — the
feed a cost-based optimizer or a maintenance planner reads without
scanning data.

Iceberg stores NDV as apache-datasketches theta blobs in a puffin
StatisticsFile; that codec is not available in this container, so the
property channel carries the scalar values instead (documented
divergence — the COMPUTATION is the same, and the puffin writer seam
exists in sources/puffin.py if the codec lands).

Scale shape: ``approx=True`` (the default for :func:`analyze_table`)
uses HyperLogLog++ (``approx_count_distinct``) — one pass, mergeable
sketches, no expand; the exact form uses count-distinct over an expand
operator (the classic multi-distinct plan), right at oracle scale and
for exactness-critical columns.  Either way the stats never leave the
JVM until the final one-row collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Long-format per-column profile: one row per column with
    ``(column, n_rows, n_nulls, ndv, min_value, max_value)`` —
    min/max cast to string so heterogeneous column types share one
    schema (how ``DESCRIBE EXTENDED`` renders them).

    ONE aggregation over the input (all columns' stats in a single
    pass), then a JVM-side ``stack`` to long format — no Python in the
    row path, no per-column jobs."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"__nulls_{c}"
            )
        )
        aggs.append(
            (
                F.approx_count_distinct(c)
                if approx
                else F.countDistinct(c)
            ).alias(f"__ndv_{c}")
        )
        aggs.append(F.min(c).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __ndv_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_nulls, ndv, min_value, max_value)",
        "__n as n_rows",
    ).select("column", "n_rows", "n_nulls", "ndv", "min_value", "max_value")


STATS_SNAPSHOT_PROP = "stats.snapshot-id"


def analyze_table(
    spark: SparkSession,
    catalog,
    name: str,
    columns: list[str] | None = None,
    approx: bool = True,
    to_branch: str | None = None,
):
    """Compute column stats over the table's current snapshot and
    COMMIT them as table properties —
    ``stats.<col>.{ndv,nulls,min,max}`` plus ``stats.n-rows`` and
    ``stats.snapshot-id`` (the snapshot the stats describe, so a
    reader can tell stale stats from fresh).  The commit is a
    properties-only ``replace`` snapshot (row-preserving by contract:
    streaming consumers correctly skip it) through the standard CAS
    retry loop.  Returns the committed Manifest."""
    from iceberg_compaction_spark.commit import CommitManager
    from iceberg_compaction_spark.sources.ingest import (
        _commit,
        _load_head,
        read_table_mor,
    )
    from iceberg_compaction_spark.sources.manifest import Manifest

    current = _load_head(catalog, table_name=name, to_branch=to_branch)
    analyzed_sid = current.snapshot_id
    rows = column_stats(
        read_table_mor(spark, current), columns, approx=approx
    ).collect()  # one row per column: metadata-sized by definition

    def attempt() -> Manifest:
        cur = _load_head(catalog, table_name=name, to_branch=to_branch)
        new = Manifest.from_dict(cur.to_dict())
        new.snapshot_id = cur.next_snapshot()
        new.sequence_number = cur.sequence_number  # rows unchanged
        new.operation = "replace"
        props = dict(new.properties or {})
        props["stats.snapshot-id"] = str(analyzed_sid)
        if rows:
            props["stats.n-rows"] = str(rows[0]["n_rows"])
        for r in rows:
            c = r["column"]
            props[f"stats.{c}.ndv"] = str(r["ndv"])
            props[f"stats.{c}.nulls"] = str(r["n_nulls"])
            if r["min_value"] is not None:
                props[f"stats.{c}.min"] = r["min_value"]
            if r["max_value"] is not None:
                props[f"stats.{c}.max"] = r["max_value"]
        new.properties = props
        return _commit(catalog, name, cur, new, to_branch)

    return CommitManager().commit_with_retry(attempt)
