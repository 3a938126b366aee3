"""Preloading PySpark worker daemon (optimization r15, guide §4.5).

Identical to :mod:`pyspark.daemon` — it IS pyspark.daemon's manager —
except that the heavy Python-worker dependency stack is imported ONCE
in the daemon process before any worker is forked, so every forked
worker inherits the already-initialized modules through fork
copy-on-write instead of re-importing them.

Why this matters: Spark terminates a Python worker whenever a task
ends without cleanly draining it (limits, short-circuit joins, AQE
stage cancellation) and, in newer releases, reaps idle pooled workers.
Every replacement worker then pays the import of pandas + pyarrow +
numpy before its first batch — measured 1-2 s per worker on a loaded
box, and a cold pool on a wide executor re-imports on EVERY core at
once (a 32-core executor measured 17 s wall for the first
Arrow-batched query after a pool flush vs 1.3 s with a warm pool; the
process count recovered within 2 s — the remaining 15 s was purely
the parallel import storm).  Preloading moves that cost to one daemon
startup per executor, amortized to zero on any long-lived service.

Activate with ``spark.python.daemon.module=iceberg_compaction_spark.pydaemon``
(the package must be importable by the executor's Python, which any
job using this engine's UDFs already requires).  No behavior changes:
the manager loop, fork protocol, and worker main are pyspark's own.
"""

# The import order mirrors what a pandas_udf / mapInArrow worker pulls
# lazily on its first task; pyspark.worker itself is already imported
# by pyspark.daemon's module prologue.
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401  (Arrow UDF serde stack)
import pyspark.sql.pandas.types  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
