"""Iceberg v3 GEOMETRY tier (operators/geo.py): standard-WKB storage,
vectorized point codec, bbox predicate, and the schema mapping that
lets a ``geometry`` field in ``schema_fields`` read as binary."""

import os
import struct

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.geo import (
    st_point,
    st_within_bbox,
    st_x,
    st_y,
)


def test_wkb_point_layout_is_standard(spark):
    """The bytes are ISO WKB little-endian POINT — decodable by any
    spatial library (shapely/JTS/PostGIS), nothing engine-private."""
    df = spark.createDataFrame([(2.5, -3.5)], "x double, y double")
    [row] = st_point(df, "x", "y").collect()
    bo, typ, x, y = struct.unpack("<BIdd", bytes(row["geom"]))
    assert (bo, typ, x, y) == (1, 1, 2.5, -3.5)


def test_point_roundtrip_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2.5, -3.5), (2, None, 1.0), (3, -180.0, 90.0), (4, 0.0, 0.0)],
        "id long, x double, y double",
    )
    g = st_point(df, "x", "y")
    back = st_y(st_x(g, "geom", "rx"), "geom", "ry")
    got = {
        r["id"]: (r["rx"], r["ry"])
        for r in back.select("id", "rx", "ry").collect()
    }
    assert got == {
        1: (2.5, -3.5),
        2: (None, None),  # null coordinate -> null geometry
        3: (-180.0, 90.0),
        4: (0.0, 0.0),
    }


def test_bbox_predicate_and_null_safety(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 50.0, 5.0), (3, None, 5.0)],
        "id long, x double, y double",
    )
    g = st_point(df, "x", "y")
    out = {
        r["id"]: r["in_bbox"]
        for r in st_within_bbox(g, "geom", 0, 0, 10, 10).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_geometry_schema_field_reads_as_binary(spark, tmp_path):
    """A ``geometry`` (and parameterized ``geometry(srid)``) field in
    the declared Iceberg schema maps to binary on both type resolvers
    and round-trips through the engine scan."""
    from iceberg_compaction_spark.plans.datamodel import FileScanTask
    from iceberg_compaction_spark.sources import schema_evo as se
    from iceberg_compaction_spark.sources.ingest import read_table_mor
    from iceberg_compaction_spark.sources.manifest import Manifest

    assert se.iceberg_type_to_spark("geometry").typeName() == "binary"
    assert se.iceberg_type_to_spark("geometry(4326)").typeName() == "binary"
    assert se.iceberg_type_to_arrow("geography") == pa.binary()

    root = str(tmp_path / "gt")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(5)],
        "id long, x double, y double",
    )
    pdf = st_point(df, "x", "y").select("id", "geom").toPandas()
    schema = se.arrow_schema_with_ids(
        pa.schema([pa.field("id", pa.int64()), pa.field("geom", pa.binary())]),
        {"id": 1, "geom": 2},
    )
    path = os.path.join(root, "a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), path)
    m = Manifest(
        table_root=root,
        snapshot_id=1,
        sequence_number=1,
        schema_fields=[
            {"id": 1, "name": "id", "type": "long", "required": True},
            {"id": 2, "name": "geom", "type": "geometry", "required": False},
        ],
        data_files=[
            FileScanTask(
                data_file_path=path,
                length=os.path.getsize(path),
                file_size_in_bytes=os.path.getsize(path),
                record_count=5,
                sequence_number=1,
            )
        ],
    )
    out = read_table_mor(spark, m)
    assert dict(out.dtypes)["geom"] == "binary"
    xs = {r["id"]: r["x2"] for r in st_x(out, "geom", "x2").collect()}
    assert xs == {i: float(i) for i in range(5)}


def test_shredded_coordinates_drive_file_pruning(spark, tmp_path):
    """The spatial-prune claim, concretely: geometry coordinates
    shredded into plain double columns at write time participate in
    the planner's min/max file pruning — a bbox predicate on the
    shredded x column eliminates files whose coordinate range cannot
    match, before any data is read."""
    from iceberg_compaction_spark.plans.pruning import (
        ColumnPredicate,
        prune_tasks,
    )
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "tiles")
    os.makedirs(root)
    # three "tiles": x in [0,10), [100,110), [200,210)
    for i, base in enumerate((0.0, 100.0, 200.0)):
        df = spark.createDataFrame(
            [(j, base + j, 1.0) for j in range(10)],
            "id long, x double, y double",
        )
        g = st_point(df, "x", "y").select("id", "geom", "x", "y")
        g.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, f"stage{i}")
        )
        import glob
        import shutil

        [part] = glob.glob(os.path.join(root, f"stage{i}", "*.parquet"))
        shutil.move(part, os.path.join(root, f"tile{i}.parquet"))
        shutil.rmtree(os.path.join(root, f"stage{i}"))

    m = Manifest.from_parquet_dir(root, sequence_number=1)
    assert len(m.data_files) == 3
    # bbox xmin=100 xmax=150 -> only the middle tile can match
    kept = prune_tasks(
        m.data_files,
        [
            ColumnPredicate(col="x", op="ge", value=100.0),
            ColumnPredicate(col="x", op="le", value=150.0),
        ],
    )
    assert [os.path.basename(t.data_file_path) for t in kept] == [
        "tile1.parquet"
    ]


def test_haversine_matches_reference_and_stays_jvm(spark):
    """st_haversine_m against a pure-Python reference (<1e-6 relative)
    on known city pairs, and the plan carries no Python eval node."""
    import math

    def ref(lon1, lat1, lon2, lat2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        dlat = math.radians(lat2 - lat1) / 2
        dlon = math.radians(lon2 - lon1) / 2
        a = (
            math.sin(dlat) ** 2
            + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
        )
        return 2 * 6371008.8 * math.asin(math.sqrt(a))

    pairs = [
        # (lon1, lat1, lon2, lat2): Paris->Berlin, equator span, poles
        (2.35, 48.86, 13.40, 52.52),
        (0.0, 0.0, 90.0, 0.0),
        (0.0, 90.0, 0.0, -90.0),
        (5.0, 5.0, 5.0, 5.0),
    ]
    from iceberg_compaction_spark.operators.geo import st_haversine_m

    df = spark.createDataFrame(
        pairs, "lon1 double, lat1 double, lon2 double, lat2 double"
    )
    out = st_haversine_m(df, "lon1", "lat1", "lon2", "lat2")
    got = [r["dist_m"] for r in out.collect()]
    for g, p in zip(got, pairs):
        want = ref(*p)
        assert abs(g - want) <= max(1e-6 * want, 1e-6), (p, g, want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_tile_id_fixed_bounds_and_stability(spark):
    """Tile ids are stable (fixed bounds: a point's tile never depends
    on the batch), clamp at the range edges, and interleave correctly
    on a hand-checked case."""
    from iceberg_compaction_spark.operators.geo import st_tile_id

    df = spark.createDataFrame(
        [
            (1, 0.0, 0.0),       # corner -> cell (0,0) -> tile 0
            (2, 200.0, 50.0),    # far corner -> (63,63) -> all bits set
            (3, -5.0, 60.0),     # out of range: clamps to (0, 63)
            (4, 100.0, 25.0),    # centre-ish, stable value
        ],
        "id long, x double, y double",
    )
    got = {
        r["id"]: r["tile_id"]
        for r in st_tile_id(
            df, "x", "y", (0.0, 200.0), (0.0, 50.0), bits=6
        ).collect()
    }
    assert got[1] == 0
    assert got[2] == (1 << 12) - 1  # 12 interleaved bits all set
    # clamped x=0 cell, y=63 cell -> odd (y) bits of 63 set
    assert got[3] == sum(1 << (2 * j + 1) for j in range(6))
    # stability: a singleton batch yields the same tile
    solo = st_tile_id(
        spark.createDataFrame([(100.0, 25.0)], "x double, y double"),
        "x", "y", (0.0, 200.0), (0.0, 50.0), bits=6,
    ).collect()[0]["tile_id"]
    assert solo == got[4]
    # degenerate range is loud
    import pytest as _pytest

    from iceberg_compaction_spark.operators.geo import tile_id_expr

    with _pytest.raises(ValueError):
        tile_id_expr("x", "y", (1.0, 1.0), (0.0, 1.0))
