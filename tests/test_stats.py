"""ANALYZE surface (operators/stats.py): per-column profile in one
aggregation + the property-committing analyze_table procedure."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.operators.stats import (
    analyze_table,
    column_stats,
)
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def cat(tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "val": ["a", "b", "b", None],
            }
        ),
        os.path.join(root, "d.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    return cat


def test_column_stats_exact_profile(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, None)], ["id", "val"]
    )
    got = {r["column"]: r for r in column_stats(df).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["ndv"] == 4
    assert got["id"]["min_value"] == "1" and got["id"]["max_value"] == "4"
    assert got["val"]["n_nulls"] == 1 and got["val"]["ndv"] == 2
    assert got["val"]["min_value"] == "a" and got["val"]["max_value"] == "b"
    # column subset + approx mode still one row per requested column
    sub = column_stats(df, ["val"], approx=True).collect()
    assert len(sub) == 1 and sub[0]["column"] == "val"
    assert sub[0]["ndv"] >= 1  # HLL estimate, sanity only


def test_analyze_table_commits_stats_properties(spark, cat):
    base = cat.load_table("t")
    m = analyze_table(spark, cat, "t", approx=False)
    assert m.snapshot_id == base.snapshot_id + 1
    assert m.operation == "replace"  # row-preserving: streams skip it
    assert m.sequence_number == base.sequence_number
    p = m.properties
    assert p["stats.snapshot-id"] == str(base.snapshot_id)
    assert p["stats.n-rows"] == "4"
    assert p["stats.id.ndv"] == "4" and p["stats.val.ndv"] == "2"
    assert p["stats.val.nulls"] == "1"
    assert p["stats.id.min"] == "1" and p["stats.id.max"] == "4"
    # rows unchanged (MOR invariance of a stats commit)
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    got = {
        r["id"]: r["val"]
        for r in read_table_mor(spark, cat.load_table("t")).collect()
    }
    assert got == {1: "a", 2: "b", 3: "b", 4: None}
    # re-analyze stamps the NEW snapshot (stats freshness signal)
    m2 = analyze_table(spark, cat, "t", approx=False)
    assert m2.properties["stats.snapshot-id"] == str(m.snapshot_id)


def test_analyze_table_on_branch_keeps_main_untouched(spark, cat):
    cat.create_branch("t", "audit")
    analyze_table(spark, cat, "t", approx=False, to_branch="audit")
    assert "stats.n-rows" not in (cat.load_table("t").properties or {})
    assert (
        cat.load_table_ref("t", "audit").properties["stats.n-rows"] == "4"
    )
