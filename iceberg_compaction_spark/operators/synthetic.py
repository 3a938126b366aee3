"""Deterministic synthetic MOR workload over the driver's testdata.

The reference generates randomized delete workloads in its integration
harness (integration-tests/src/test_utils/generator.rs:520-600).  For the
DuckDB-oracle correctness gate we need the same workload expressible in
BOTH Spark and ANSI SQL, so deletes are derived from the data by pure
arithmetic rules (seed-free, engine-agnostic):

- data sequence number: even ``l_orderkey`` -> 1, odd -> 9 (covers both
  sides of the strict ``<`` residual, FIXTURES.md F8);
- position deletes: rows with ``l_orderkey % 13 = 0 AND l_linenumber % 2 = 1``,
  materialized as real ``(file_path, row_index)`` pairs so the Spark side
  genuinely exercises the J1 (file,pos) anti-join machinery;
- equality deletes: keys ``(l_orderkey, l_linenumber)`` where
  ``l_orderkey % 17 = 0``, delete sequence number 5 — even orderkeys
  (seq 1 < 5) are deleted, odd ones (seq 9) survive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.sources.scan import (
    HIDDEN_FILE_PATH,
    HIDDEN_POS,
    HIDDEN_SEQ,
)

# lineitem output columns; l_shipdate is projected as DATE so value hashes
# are timezone-proof across engines.
LINEITEM_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
]

EQ_DELETE_SEQ = 5
POS_RULE_SQL = "(l_orderkey % 13 = 0 AND l_linenumber % 2 = 1)"
SEQ_RULE_SQL = "CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 9 END"
EQ_KEY_RULE_SQL = "l_orderkey % 17 = 0"


def _seq_col():
    return (
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1)).otherwise(F.lit(9)).cast("long")
    )


def _pos_rule():
    return (F.col("l_orderkey") % 13 == 0) & (F.col("l_linenumber") % 2 == 1)


def lineitem_path(sf_dir: str) -> str:
    return f"{sf_dir}/lineitem.parquet"


def read_lineitem_with_hidden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-file scan with all three hidden columns (S8/S9) — file path and
    row position come from Spark's file-source metadata (zero-cost, no
    shuffle), the sequence number from the deterministic rule.

    Deliberately NOT repartitioned (unlike the documents/embeddings
    readers in registry.py): the MOR downstream is broadcast-hash-join
    probes, cheaper per row than exchanging the wide lineitem rows —
    measured 2-3x slower with a spread at sf0.1.  The engine-level rule
    generalizes: never shuffle the data side of a MOR rewrite."""
    df = spark.read.parquet(lineitem_path(sf_dir))
    return (
        df.withColumn(
            HIDDEN_FILE_PATH,
            F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/"),
        )
        .withColumn(HIDDEN_POS, F.col("_metadata.row_index"))
        .withColumn(HIDDEN_SEQ, _seq_col())
    )


def _delete_file_cache(spark: SparkSession, sf_dir: str, name: str, build) -> str:
    """Materialize a derived delete table as a real parquet delete FILE
    (one-time per sf_dir, atomic dir rename) — the MOR queries then scan
    delete files exactly like the reference engine does, instead of
    re-deriving the deletes from the data on every run.  The derivation
    is deterministic, so the cache never goes stale for a given sf_dir."""
    import hashlib
    import os
    import tempfile
    import uuid

    src = lineitem_path(sf_dir)
    st = os.stat(src)
    # key on source identity AND content version (size+mtime) so a
    # regenerated testdata file can never serve stale cached deletes
    key = hashlib.md5(
        f"{src}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"icspark-synth-{key}")
    path = os.path.join(root, name)
    if not os.path.isdir(path):
        os.makedirs(root, exist_ok=True)
        tmp = f"{path}.{uuid.uuid4().hex[:8]}.tmp"
        build().coalesce(1).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)  # atomic; loser of a race cleans up
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return path


def position_delete_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: (sys_hidden_file_path, sys_hidden_pos) pairs, served from a
    materialized position-delete file (like reading a real delete file)."""

    def build() -> DataFrame:
        df = spark.read.parquet(lineitem_path(sf_dir))
        return (
            df.withColumn(
                HIDDEN_FILE_PATH,
                F.regexp_replace(F.col("_metadata.file_path"), "^file:/*", "/"),
            )
            .withColumn(HIDDEN_POS, F.col("_metadata.row_index"))
            .filter(_pos_rule())
            .select(HIDDEN_FILE_PATH, HIDDEN_POS)
        )

    return spark.read.parquet(
        _delete_file_cache(spark, sf_dir, "pos_deletes.parquet", build)
    )


def equality_delete_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: distinct (l_orderkey, l_linenumber) keys + delete seq, served
    from a materialized equality-delete file."""

    def build() -> DataFrame:
        df = spark.read.parquet(lineitem_path(sf_dir))
        return (
            df.filter(F.col("l_orderkey") % 17 == 0)
            .select("l_orderkey", "l_linenumber")
            .dropDuplicates()
            .withColumn(HIDDEN_SEQ, F.lit(EQ_DELETE_SEQ).cast("long"))
        )

    return spark.read.parquet(
        _delete_file_cache(spark, sf_dir, "eq_deletes.parquet", build)
    )


def output_select(df: DataFrame) -> DataFrame:
    return df.select(
        *[F.col(c) for c in LINEITEM_COLS],
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
    )


OUTPUT_COLS_SQL = (
    ", ".join(LINEITEM_COLS) + ", CAST(l_shipdate AS DATE) AS l_shipdate"
)
