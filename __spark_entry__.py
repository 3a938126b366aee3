"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship merge-on-read query at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for the correctness gate.  The actual
registry lives in ``iceberg_compaction_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_compaction_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["mor_full"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
