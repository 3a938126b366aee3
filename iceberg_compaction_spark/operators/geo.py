"""Iceberg v3 GEOMETRY columns (minimal spatial tier).

The v3 spec adds ``geometry`` / ``geography`` types whose physical
representation is **WKB** (ISO well-known binary) in a binary column.
This module supplies the engine's geometry tier: the type mapping
(``"geometry"`` in ``schema_fields`` -> binary, see
``sources/schema_evo.py``), a vectorized WKB codec for the POINT
subset, and the predicates a table scan actually pushes — bounding-box
containment, the primitive under every spatial partition-prune.

Scope is deliberately the spec's storage contract plus the operations
a 100 TB pipeline runs at scan time (encode on ingest, coordinate
extraction, bbox filter); full computational geometry (intersections,
buffering, projections) belongs to a dedicated library (Sedona/JTS on
a JVM cluster) reading the same WKB bytes — which is exactly why the
on-disk format here is standard WKB and nothing engine-private.

Scale shape: the codec is numpy over fixed-width WKB points —
``frombuffer`` with a structured dtype decodes a whole Arrow batch in
ONE numpy call (no per-row Python), and encode builds the batch's
buffer the same way.  Extraction and bbox filters therefore cost a
memcpy per batch, and the bbox predicate composes with Catalyst
(it is an ordinary boolean column — usable in ``where`` before joins
and aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "st_point",
    "st_x",
    "st_y",
    "st_within_bbox",
    "st_haversine_m",
    "tile_id_expr",
    "st_tile_id",
]

# WKB little-endian POINT layout: byteOrder(1)=1, type(4)=1, x(8), y(8).
# The layout constants are INLINED inside each UDF body (not referenced
# from this module) so the pickled closures are self-contained — an
# executor must not need this package importable to run them.
_POINT_LEN = 21


def st_point(
    df: DataFrame, x_col: str, y_col: str, out_col: str = "geom"
) -> DataFrame:
    """Encode ``(x, y)`` double columns as WKB POINT binary (the v3
    geometry storage form).  NULL in either coordinate -> NULL geometry."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _enc(pdf):
        import numpy as np
        import pandas as pd

        dt = np.dtype(
            [("bo", "u1"), ("t", "<u4"), ("x", "<f8"), ("y", "<f8")]
        )
        xs = pdf.iloc[:, 0].to_numpy(dtype=np.float64, na_value=np.nan)
        ys = pdf.iloc[:, 1].to_numpy(dtype=np.float64, na_value=np.nan)
        buf = np.zeros(len(xs), dtype=dt)
        buf["bo"] = 1
        buf["t"] = 1
        buf["x"] = xs
        buf["y"] = ys
        raw = buf.tobytes()
        nulls = pdf.iloc[:, 0].isna() | pdf.iloc[:, 1].isna()
        out = [
            None if nulls.iat[i] else raw[i * 21 : (i + 1) * 21]
            for i in range(len(xs))
        ]
        return pd.Series(out)

    return df.withColumn(
        out_col, _enc(F.struct(F.col(x_col), F.col(y_col)))
    )


def _decode_coord(field: str):
    """pandas_udf factory: WKB POINT -> one coordinate, decoded with a
    single structured-dtype frombuffer per batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def _dec(s):
        import numpy as np
        import pandas as pd

        dt = np.dtype(
            [("bo", "u1"), ("t", "<u4"), ("x", "<f8"), ("y", "<f8")]
        )
        vals = []
        present = []
        for b in s:
            if b is None or len(b) != 21:
                present.append(False)
            else:
                present.append(True)
                vals.append(bytes(b))
        if vals:
            arr = np.frombuffer(b"".join(vals), dtype=dt)
            coords = iter(arr[field].tolist())
        else:
            coords = iter(())
        return pd.Series(
            [next(coords) if p else None for p in present],
            dtype="float64",
        )

    return _dec


def st_x(df: DataFrame, geom_col: str, out_col: str = "x") -> DataFrame:
    return df.withColumn(out_col, _decode_coord("x")(F.col(geom_col)))


def st_y(df: DataFrame, geom_col: str, out_col: str = "y") -> DataFrame:
    return df.withColumn(out_col, _decode_coord("y")(F.col(geom_col)))


def st_within_bbox(
    df: DataFrame,
    geom_col: str,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    out_col: str = "in_bbox",
) -> DataFrame:
    """Boolean bbox-containment column (xmin <= x <= xmax AND
    ymin <= y <= ymax) — the primitive behind spatial partition
    pruning.  NULL geometry -> false (a filter must never keep an
    undecodable row)."""
    out = st_x(df, geom_col, "__bx")
    out = st_y(out, geom_col, "__by")
    pred = (
        (F.col("__bx") >= float(xmin))
        & (F.col("__bx") <= float(xmax))
        & (F.col("__by") >= float(ymin))
        & (F.col("__by") <= float(ymax))
    )
    return out.withColumn(
        out_col, F.coalesce(pred, F.lit(False))
    ).drop("__bx", "__by")


def st_haversine_m(
    df: DataFrame,
    lon1: str,
    lat1: str,
    lon2: str,
    lat2: str,
    out_col: str = "dist_m",
) -> DataFrame:
    """Great-circle distance in metres between two (lon, lat) degree
    pairs (haversine over the IUGG mean Earth radius) — entirely
    JVM-side trig expressions, no UDF, so it composes with codegen and
    runs at scan speed.  This is the geography-tier distance; for
    oracle-exact cross-engine comparisons use planar/integer forms
    (libm trig differs by ulps across engines, which is measurement
    noise, not error — ~centimetres at Earth scale)."""
    r2 = F.lit(2.0 * 6371008.8)
    rl1, rl2 = F.radians(F.col(lat1)), F.radians(F.col(lat2))
    dlat = F.radians(F.col(lat2) - F.col(lat1)) / 2.0
    dlon = F.radians(F.col(lon2) - F.col(lon1)) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return df.withColumn(out_col, r2 * F.asin(F.sqrt(a)))


def tile_id_expr(
    x_expr: str,
    y_expr: str,
    x_range: tuple,
    y_range: tuple,
    bits: int = 6,
    idiv: str = "div",
) -> str:
    """SQL expression for a fixed-bounds Morton TILE id of an (x, y)
    pair: each coordinate quantizes into ``2^bits`` cells over its
    declared range (clamped at the edges), and the cells interleave
    into one integer — the geohash-style spatial bucketing key under
    distributed spatial joins and tile rollups.  Identical string
    semantics in Spark SQL (``idiv='div'``) and DuckDB (``'//'``);
    quantization is FLOOR over one multiply and one divide, so both
    engines compute bit-identical cells (no reassociation, no libm).

    Fixed bounds (vs zorder_code's data-driven min/max) are the
    spatial case: geographic ranges are known constants, so the tile
    of a point never depends on what else is in the batch — the
    property an incremental pipeline needs for tiles to be stable
    across ingests."""
    from iceberg_compaction_spark.operators.zorder import zorder_code_expr

    top = (1 << bits) - 1
    cells = []
    for expr, (lo, hi) in ((x_expr, x_range), (y_expr, y_range)):
        span = float(hi) - float(lo)
        if span <= 0:
            raise ValueError(f"empty coordinate range ({lo}, {hi})")
        q = (
            f"CAST(FLOOR((({expr}) - {float(lo)}) * {top} / {span}) "
            f"AS BIGINT)"
        )
        cells.append(f"LEAST(GREATEST({q}, 0), {top})")
    return zorder_code_expr(cells, bits)


def st_tile_id(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple,
    y_range: tuple,
    bits: int = 6,
    out_col: str = "tile_id",
) -> DataFrame:
    """Attach the fixed-bounds Morton tile id of ``(x_col, y_col)`` —
    pure JVM integer expressions, whole-stage codegen, no UDF."""
    return df.withColumn(
        out_col,
        F.expr(
            tile_id_expr(x_col, y_col, x_range, y_range, bits, idiv="div")
        ).cast("long"),
    )
