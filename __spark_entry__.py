"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship merge-on-read query at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus LLM-pipeline extensions); ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.operators import synthetic as syn
from iceberg_compaction_spark.operators.mor import (
    EqualityDeleteTable,
    apply_equality_deletes,
    apply_position_deletes,
)

SF0001 = "/root/testdata/sf0.001"

EQ_KEYS = ["l_orderkey", "l_linenumber"]


# ---------------------------------------------------------------------------
# MOR queries (S1/S8/S9, J1, J2, P1)
# ---------------------------------------------------------------------------


def q_mor_no_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: plain projection scan — identity columns only."""
    df = spark.read.parquet(syn.lineitem_path(sf_dir))
    return syn.output_select(df)


def q_mor_pos_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: anti-join on (sys_hidden_file_path, sys_hidden_pos)."""
    data = syn.read_lineitem_with_hidden(spark, sf_dir)
    pos = syn.position_delete_table(spark, sf_dir)
    return syn.output_select(apply_position_deletes(data, pos, broadcast=True))


def q_mor_eq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: anti-join on equality keys + strict seq residual."""
    data = syn.read_lineitem_with_hidden(spark, sf_dir)
    eq = EqualityDeleteTable(
        df=syn.equality_delete_table(spark, sf_dir), equality_keys=EQ_KEYS
    )
    return syn.output_select(apply_equality_deletes(data, eq, broadcast=True))


def q_mor_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the full MOR rewrite query (J1 innermost, then J2, then
    the hidden-column-stripping projection, J3 fixed order)."""
    data = syn.read_lineitem_with_hidden(spark, sf_dir)
    pos = syn.position_delete_table(spark, sf_dir)
    eq = EqualityDeleteTable(
        df=syn.equality_delete_table(spark, sf_dir), equality_keys=EQ_KEYS
    )
    out = apply_position_deletes(data, pos, broadcast=True)
    out = apply_equality_deletes(out, eq, broadcast=True)
    return syn.output_select(out)


def q_validate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: row-count validation — input vs MOR-surviving counts."""
    input_rows = spark.read.parquet(syn.lineitem_path(sf_dir)).agg(
        F.count(F.lit(1)).alias("input_rows")
    )
    survivors = q_mor_full(spark, sf_dir).agg(F.count(F.lit(1)).alias("output_rows"))
    return input_rows.crossJoin(survivors)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_mor_full(spark, SF0001)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mor_no_deletes": q_mor_no_deletes,
        "mor_pos_delete": q_mor_pos_delete,
        "mor_eq_delete": q_mor_eq_delete,
        "mor_full": q_mor_full,
        "validate_counts": q_validate_counts,
    }


def oracle_sql() -> dict[str, str]:
    cols = syn.OUTPUT_COLS_SQL
    pos = syn.POS_RULE_SQL
    eq_keys = syn.EQ_KEY_RULE_SQL
    seq = syn.SEQ_RULE_SQL
    dseq = syn.EQ_DELETE_SEQ

    mor_eq_where = f"""NOT EXISTS (
        SELECT 1 FROM (
            SELECT DISTINCT l_orderkey AS k1, l_linenumber AS k2
            FROM lineitem WHERE {eq_keys}
        ) e
        WHERE e.k1 = d.l_orderkey AND e.k2 = d.l_linenumber AND d.seq < {dseq}
    )"""

    mor_full = f"""
        WITH d AS (SELECT *, {seq} AS seq FROM lineitem)
        SELECT {cols} FROM d
        WHERE NOT {pos} AND {mor_eq_where}
    """

    return {
        "mor_no_deletes": f"SELECT {cols} FROM lineitem",
        "mor_pos_delete": f"SELECT {cols} FROM lineitem WHERE NOT {pos}",
        "mor_eq_delete": f"""
            WITH d AS (SELECT *, {seq} AS seq FROM lineitem)
            SELECT {cols} FROM d WHERE {mor_eq_where}
        """,
        "mor_full": mor_full,
        "validate_counts": f"""
            SELECT (SELECT COUNT(*) FROM lineitem) AS input_rows,
                   (SELECT COUNT(*) FROM ({mor_full}) s) AS output_rows
        """,
    }
