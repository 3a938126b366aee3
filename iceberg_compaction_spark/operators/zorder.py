"""Z-order (Morton) clustering for multi-dimensional data skipping.

The reference compacts sorted tables only along a single identity sort
order (core/src/executor/datafusion/datafusion_processor.rs:193-213).
Z-ordering is the standard extension for MULTI-column clustering: rows
are sorted by the bit-interleaved Morton code of several key columns, so
consecutive output files cover small hyper-rectangles of the key space
and parquet/Iceberg min-max stats prune scans on ANY of the interleaved
dimensions — not just the leading sort column.

All math is integer expressions built from shifts/masks (whole-stage
codegen; no UDFs), generated identically for Spark SQL and the DuckDB
oracle:

- :func:`minmax_scale_expr` maps an integer column to ``[0, 2^bits)``
  with pure integer arithmetic (global min/max come from one tiny
  aggregate — a broadcast-scale metadata lookup, not a shuffle of the
  data).
- :func:`zorder_code_expr` interleaves the scaled dimensions bit by bit.

Usage with the compaction writer: pass
``df.sortWithinPartitions(F.expr(zorder_code_expr([...], bits)))`` —
`sortWithinPartitions` accepts expressions, so z-order clustering needs
no writer changes.  For global file clustering, ``orderBy`` the code
(range shuffle; Spark's range partitioner samples, so skew-safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_scale_expr(
    col: str, vmin: int, vmax: int, bits: int, idiv: str = "div"
) -> str:
    """SQL expression scaling integer ``col`` from [vmin, vmax] to
    ``[0, 2^bits)`` with integer-only math (engine-exact).

    ``idiv`` is the integer-division spelling — ``div`` for Spark SQL,
    ``//`` for DuckDB; everything else is identical in both dialects.
    """
    span = max(vmax - vmin, 1)
    top = (1 << bits) - 1
    return f"((({col}) - {vmin}) * {top} {idiv} {span})"


def zorder_code_expr(scaled_cols: list[str], bits: int) -> str:
    """SQL expression interleaving the low ``bits`` bits of each already
    scaled (non-negative) integer expression into a Morton code.

    Bit ``j`` of dimension ``d`` lands at position ``j * ndims + d`` —
    the standard interleave; identical string works in Spark SQL and
    DuckDB (both support ``>>``, ``&`` on BIGINT; multiplication by a
    power of two replaces ``<<`` for DuckDB operator-precedence safety).
    """
    ndims = len(scaled_cols)
    terms = [
        f"((({c}) >> {j}) & 1) * {1 << (j * ndims + d)}"
        for j in range(bits)
        for d, c in enumerate(scaled_cols)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_code(
    df: DataFrame, cols: list[str], bits: int = 8
) -> tuple[DataFrame, Column | None]:
    """Attach a Morton code over ``cols`` (integer columns), scaled by
    their global min/max.

    Returns ``(df, code_column)`` — the df is unchanged; the column can
    be used in ``orderBy`` / ``sortWithinPartitions`` and never needs to
    be materialized into the output schema.  The min/max aggregate is
    one job over stats-prunable columns (at 100 TB: seconds, and with
    Iceberg metadata it's a manifest read, not a scan).

    When the input is empty or a z-order column is entirely NULL the
    min/max aggregates return NULL and no meaningful code exists; the
    code column is ``None`` so callers fall back to the plain
    (unclustered) path instead of failing the whole rewrite — a
    compaction of a fully-deleted file group must still write its
    (empty) output.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    bounds = []
    for c in cols:
        vmin, vmax = row[f"__min_{c}"], row[f"__max_{c}"]
        if vmin is None or vmax is None:
            return df, None
        bounds.append((int(vmin), int(vmax)))
    scaled = [
        minmax_scale_expr(c, vmin, vmax, bits)
        for c, (vmin, vmax) in zip(cols, bounds)
    ]
    return df, F.expr(zorder_code_expr(scaled, bits))


def cluster_by_zorder(
    df: DataFrame, cols: list[str], bits: int = 8
) -> DataFrame:
    """Globally order ``df`` by the Morton code of ``cols`` (range
    shuffle).  Downstream size-rolled writes then produce files whose
    min-max envelopes are tight on EVERY interleaved dimension."""
    df, code = zorder_code(df, cols, bits)
    if code is None:
        return df
    return df.orderBy(code)
