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


def test_decode_validates_wkb_header(spark):
    """ADVICE r13: a big-endian (JTS-default) WKB POINT is also 21
    bytes — the codec must decode it correctly via the byte-order
    byte, and must NULL (not garbage-decode) buffers whose header is
    not a valid plain POINT."""
    from iceberg_compaction_spark.operators.geo import wkb_point

    rows = [
        (1, wkb_point(2.5, -3.5)),                 # little-endian
        (2, wkb_point(2.5, -3.5, big_endian=True)),  # big-endian (JTS)
        (3, bytes([1, 9, 0, 0, 0]) + b"\x00" * 16),  # unknown type code
        (4, bytes([7]) + b"\x00" * 20),              # invalid endian byte
        (5, b"\x01\x01\x00\x00"),                    # truncated
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    got = {
        r["id"]: (r["gx"], r["gy"])
        for r in st_y(st_x(df, "geom", "gx"), "geom", "gy").collect()
    }
    assert got[1] == (2.5, -3.5)
    assert got[2] == (2.5, -3.5)
    assert got[3] == (None, None)
    assert got[4] == (None, None)
    assert got[5] == (None, None)
    assert got[6] == (None, None)


def test_geom_type_and_num_points_mixed_batch(spark):
    from iceberg_compaction_spark.operators.geo import (
        st_geom_type,
        st_num_points,
        wkb_linestring,
        wkb_point,
        wkb_polygon,
    )

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    rows = [
        (1, wkb_point(1.0, 2.0)),
        (2, wkb_linestring([(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)])),
        (3, wkb_polygon([sq, hole])),
        (4, wkb_linestring([(5.0, 5.0), (6.0, 6.0)], big_endian=True)),
        (5, b"\x01\x63\x00\x00\x00"),  # type 99
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    out = st_num_points(st_geom_type(df, "geom"), "geom")
    got = {
        r["id"]: (r["geom_type"], r["num_points"]) for r in out.collect()
    }
    assert got == {
        1: ("POINT", 1),
        2: ("LINESTRING", 3),
        3: ("POLYGON", 10),
        4: ("LINESTRING", 2),
        5: (None, None),
        6: (None, None),
    }


def test_envelope_mixed_geometries_and_bbox(spark):
    """Envelope over a mixed POINT/LINESTRING/POLYGON batch (both byte
    orders), and the generalized bbox predicates built on it."""
    from iceberg_compaction_spark.operators.geo import (
        st_envelope,
        st_intersects_bbox,
        wkb_linestring,
        wkb_point,
        wkb_polygon,
    )

    sq = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0), (2.0, 2.0)]
    rows = [
        (1, wkb_point(5.0, 5.0)),
        (2, wkb_linestring([(1.0, 1.0), (9.0, 3.0), (4.0, 7.0)])),
        (3, wkb_polygon([sq])),
        (4, wkb_point(50.0, 50.0, big_endian=True)),
        (5, wkb_polygon([sq], big_endian=True)),
        (6, b"\xff" * 30),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    env = {
        r["id"]: (
            None
            if r["envelope"] is None
            else (
                r["envelope"]["xmin"],
                r["envelope"]["ymin"],
                r["envelope"]["xmax"],
                r["envelope"]["ymax"],
            )
        )
        for r in st_envelope(df, "geom").collect()
    }
    assert env[1] == (5.0, 5.0, 5.0, 5.0)
    assert env[2] == (1.0, 1.0, 9.0, 7.0)
    assert env[3] == (2.0, 2.0, 8.0, 8.0)
    assert env[4] == (50.0, 50.0, 50.0, 50.0)
    assert env[5] == (2.0, 2.0, 8.0, 8.0)
    assert env[6] is None
    assert env[7] is None

    within = {
        r["id"]: r["in_bbox"]
        for r in st_within_bbox(df, "geom", 0, 0, 10, 10).collect()
    }
    assert within == {
        1: True, 2: True, 3: True, 4: False, 5: True, 6: False, 7: False,
    }
    hits = {
        r["id"]: r["hits_bbox"]
        for r in st_intersects_bbox(df, "geom", 7, 7, 60, 60).collect()
    }
    # polygon (2..8)^2 overlaps [7,60]^2; the far point is inside it
    assert hits == {
        1: False, 2: True, 3: True, 4: True, 5: True, 6: False, 7: False,
    }


def test_tile_bbox_join_matches_naive_and_avoids_cartesian(spark):
    """The distributed spatial join: tile-bucketed equi-join + exact
    residual == the naive cross predicate join, each matching pair
    exactly once, and the physical plan contains no cartesian /
    nested-loop."""
    import random

    from iceberg_compaction_spark.operators.geo import st_tile_bbox_join

    rng = random.Random(14)
    pts = [
        (i, rng.uniform(-10.0, 210.0), rng.uniform(-5.0, 55.0))
        for i in range(400)
    ]
    points = spark.createDataFrame(pts, "pid long, px double, py double")
    regs = [
        ("a", 0.0, 0.0, 60.0, 25.0),
        ("b", 50.0, 10.0, 150.0, 40.0),   # overlaps a and d
        ("c", 140.0, 0.0, 205.0, 52.0),   # extends past the tile range
        ("d", 90.0, 20.0, 110.0, 30.0),
    ]
    regions = spark.createDataFrame(
        regs,
        "region_name string, xmin double, ymin double, "
        "xmax double, ymax double",
    )
    joined = st_tile_bbox_join(
        points, "px", "py", regions, (0.0, 200.0), (0.0, 50.0), bits=5
    )
    got = sorted(
        (r["pid"], r["region_name"])
        for r in joined.select("pid", "region_name").collect()
    )
    want = sorted(
        (pid, name)
        for pid, x, y in pts
        for name, x0, y0, x1, y1 in regs
        if x0 <= x <= x1 and y0 <= y <= y1
    )
    assert got == want  # exactly-once per matching pair, none missed
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tile_knn_join_matches_naive_and_avoids_cartesian(spark):
    """Radius-bounded kNN on the tile tier == the naive cross-product
    formulation (any radius, including radius spanning many tiles and
    radius smaller than one tile), with no cartesian in the plan."""
    import random

    from iceberg_compaction_spark.operators.geo import st_tile_knn_join

    rng = random.Random(41)
    pts = [
        (i, rng.uniform(0.0, 200.0), rng.uniform(0.0, 50.0))
        for i in range(500)
    ]
    points = spark.createDataFrame(pts, "pid long, px double, py double")
    qs = [(1, 20.0, 10.0), (2, 100.0, 25.0), (3, 195.0, 48.0)]
    queries = spark.createDataFrame(qs, "qid long, qx double, qy double")

    for radius, k in ((8.0, 5), (60.0, 3)):
        j = st_tile_knn_join(
            points, "px", "py", queries, "qid", "qx", "qy",
            k=k, radius=radius, x_range=(0.0, 200.0),
            y_range=(0.0, 50.0), bits=5, tiebreak_cols=("pid",),
        )
        got = sorted(
            (r["qid"], r["knn_rank"], r["pid"])
            for r in j.select("qid", "knn_rank", "pid").collect()
        )
        want = []
        for qid, qx, qy in qs:
            cand = sorted(
                ((px - qx) ** 2 + (py - qy) ** 2, pid)
                for pid, px, py in pts
                if (px - qx) ** 2 + (py - qy) ** 2 <= radius * radius
            )
            want += [
                (qid, rank + 1, pid)
                for rank, (_, pid) in enumerate(cand[:k])
            ]
        assert got == sorted(want), (radius, k)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    # degenerate radius is loud
    import pytest as _pytest

    with _pytest.raises(ValueError):
        st_tile_knn_join(
            points, "px", "py", queries, "qid", "qx", "qy",
            k=1, radius=0, x_range=(0.0, 200.0), y_range=(0.0, 50.0),
        )


def test_tile_envelope_join_matches_naive_exactly_once(spark):
    """Rectangle x rectangle join: tile expansion + interval-overlap
    residual + PBSM reference-point dedup == the naive cross join,
    each overlapping pair EXACTLY once (both sides span multiple
    tiles — without the reference-point rule pairs would duplicate),
    and no cartesian in the plan."""
    import random

    from iceberg_compaction_spark.operators.geo import (
        st_tile_envelope_join,
    )

    rng = random.Random(7)
    lrows = []
    for i in range(300):
        cx, cy = rng.uniform(0, 200), rng.uniform(0, 50)
        w, h = rng.uniform(0.1, 25), rng.uniform(0.1, 12)
        lrows.append((i, cx - w, cy - h, cx + w, cy + h))
    rrows = []
    for i in range(12):
        cx, cy = rng.uniform(-10, 210), rng.uniform(-5, 55)
        w, h = rng.uniform(1, 40), rng.uniform(1, 15)
        rrows.append((i, cx - w, cy - h, cx + w, cy + h))
    left = spark.createDataFrame(
        lrows, "lid long, lxmin double, lymin double, lxmax double, lymax double"
    )
    right = spark.createDataFrame(
        rrows, "rid long, rxmin double, rymin double, rxmax double, rymax double"
    )
    j = st_tile_envelope_join(
        left,
        ("lxmin", "lymin", "lxmax", "lymax"),
        right,
        ("rxmin", "rymin", "rxmax", "rymax"),
        (0.0, 200.0),
        (0.0, 50.0),
        bits=4,
    )
    got = sorted(
        (r["lid"], r["rid"]) for r in j.select("lid", "rid").collect()
    )
    want = sorted(
        (li, ri)
        for li, lx0, ly0, lx1, ly1 in lrows
        for ri, rx0, ry0, rx1, ry1 in rrows
        if lx0 <= rx1 and lx1 >= rx0 and ly0 <= ry1 and ly1 >= ry0
    )
    assert got == want  # complete AND duplicate-free
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # colliding bbox names are loud
    import pytest as _pytest

    with _pytest.raises(ValueError):
        st_tile_envelope_join(
            left, ("lxmin", "lymin", "lxmax", "lymax"),
            right.withColumnRenamed("rxmin", "lxmin"),
            ("lxmin", "rymin", "rxmax", "rymax"),
            (0.0, 200.0), (0.0, 50.0),
        )


def test_area_and_length_mixed_geometries(spark):
    """Shoelace area (exterior minus holes) and path length against
    hand-computed values, both byte orders, invalid -> NULL."""
    from iceberg_compaction_spark.operators.geo import (
        st_area,
        st_length,
        wkb_linestring,
        wkb_point,
        wkb_polygon,
    )

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    rows = [
        (1, wkb_polygon([sq])),            # area 16, perimeter 16
        (2, wkb_polygon([sq, hole])),      # area 15, perimeter 20
        (3, wkb_linestring([(0.0, 0.0), (3.0, 4.0), (3.0, 0.0)])),  # len 9
        (4, wkb_point(5.0, 5.0)),          # 0 / 0
        (5, wkb_polygon([sq], big_endian=True)),
        (6, b"\xff" * 25),                 # invalid
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    out = st_length(st_area(df, "geom"), "geom")
    got = {r["id"]: (r["area"], r["length"]) for r in out.collect()}
    assert got[1] == (16.0, 16.0)
    assert got[2] == (15.0, 20.0)
    assert got[3] == (0.0, 9.0)
    assert got[4] == (0.0, 0.0)
    assert got[5] == (16.0, 16.0)
    assert got[6] == (None, None)
    assert got[7] == (None, None)


def test_wkb_parser_properties():
    """Property test (no Spark): for random linestrings/polygons in
    either byte order, the parser's envelope equals the true
    coordinate min/max, the vertex count is exact, and area/length
    match pure-Python references."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_compaction_spark.operators.geo import (
        _parse_envelope,
        _parse_length,
        _parse_num_points,
        wkb_linestring,
        wkb_polygon,
    )

    coord = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
    pt = st.tuples(coord, coord)

    @settings(max_examples=200, deadline=None)
    @given(
        pts=st.lists(pt, min_size=1, max_size=40),
        big=st.booleans(),
        as_polygon=st.booleans(),
        srid=st.one_of(st.none(), st.integers(0, 10**6)),
    )
    def check(pts, big, as_polygon, srid):
        if as_polygon:
            ring = pts + [pts[0]]  # closed per spec
            b = wkb_polygon([ring], big_endian=big, srid=srid)
            n_expected = len(ring)
        else:
            b = wkb_linestring(pts, big_endian=big, srid=srid)
            ring = pts
            n_expected = len(pts)
        assert _parse_num_points(b) == n_expected
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        env = _parse_envelope(b)
        assert env == (min(xs), min(ys), max(xs), max(ys))
        want_len = sum(
            math.dist(a, c) for a, c in zip(ring, ring[1:])
        )
        got_len = _parse_length(b)
        assert abs(got_len - want_len) <= 1e-9 * max(1.0, want_len)

    check()

    # truncation fuzz: every prefix of a valid buffer is NULL, never
    # garbage or an exception
    b = wkb_polygon([[(0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 0.0)]])
    for cut in range(len(b)):
        assert _parse_envelope(b[:cut]) is None
        assert _parse_num_points(b[:cut]) is None


def test_truncated_multiring_polygon_reads_null_everywhere(spark):
    """Code-review r14: a polygon whose INTERIOR ring is truncated
    must be invalid in EVERY accessor — the envelope used to validate
    only the exterior ring, so the same cell read valid in
    st_within_bbox and NULL in st_area."""
    from iceberg_compaction_spark.operators.geo import (
        _parse_envelope,
        _parse_num_points,
        _rings,
        st_geom_type,
        st_num_points,
        wkb_polygon,
    )

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    full = wkb_polygon([sq, hole])
    cut = full[:100]  # exterior intact, hole truncated
    assert _parse_envelope(cut) is None
    assert _parse_num_points(cut) is None
    assert _rings(cut) is None
    # zero-vertex geometries are invalid consistently too
    import struct as _struct

    empty_ls = _struct.pack("<BII", 1, 2, 0)
    assert _parse_num_points(empty_ls) is None
    assert _parse_envelope(empty_ls) is None
    # geom_type length guard: a bare 5-byte POINT header is not a POINT
    rows = [(1, bytes([1, 1, 0, 0, 0])), (2, cut), (3, empty_ls)]
    df = spark.createDataFrame(rows, "id long, geom binary")
    got = {
        r["id"]: (r["geom_type"], r["num_points"])
        for r in st_num_points(st_geom_type(df, "geom"), "geom").collect()
    }
    assert got[1] == (None, None)
    # header-tier check CAN still name the truncated polygon (documented;
    # the structural accessors are the full validation)
    assert got[2][1] is None and got[3] == (None, None)


def test_knn_join_rejects_bbox_column_collision(spark):
    """Code-review r14: a queries frame already carrying xmin/... must
    be rejected loudly instead of silently clobbered and dropped."""
    import pytest as _pytest

    from iceberg_compaction_spark.operators.geo import st_tile_knn_join

    points = spark.createDataFrame(
        [(1, 1.0, 1.0)], "pid long, px double, py double"
    )
    queries = spark.createDataFrame(
        [(1, 1.0, 1.0, 99.0)], "qid long, qx double, qy double, xmin double"
    )
    with _pytest.raises(ValueError, match="xmin"):
        st_tile_knn_join(
            points, "px", "py", queries, "qid", "qx", "qy",
            k=1, radius=1.0, x_range=(0.0, 10.0), y_range=(0.0, 10.0),
        )


def test_ewkb_srid_interop(spark):
    """PostGIS EWKB (SRID flag set, 4-byte SRID in the header) decodes
    in every accessor, both byte orders; Z/M flag bits stay NULL."""
    import struct as _struct

    from iceberg_compaction_spark.operators.geo import (
        _parse_envelope,
        _parse_num_points,
        st_geom_type,
        st_num_points,
        wkb_linestring,
        wkb_point,
        wkb_polygon,
    )

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    rows = [
        (1, wkb_point(2.5, -3.5, srid=4326)),
        (2, wkb_point(2.5, -3.5, big_endian=True, srid=4326)),
        (3, wkb_linestring([(0.0, 0.0), (3.0, 4.0)], srid=3857)),
        (4, wkb_polygon([sq], srid=4326)),
        # Z flag (0x80000000): different vertex width -> invalid
        (5, _struct.pack("<BIdd", 1, 0x80000001, 1.0, 2.0)),
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    xy = {
        r["id"]: (r["gx"], r["gy"])
        for r in st_y(st_x(df, "geom", "gx"), "geom", "gy").collect()
    }
    assert xy[1] == (2.5, -3.5) and xy[2] == (2.5, -3.5)
    assert xy[5] == (None, None)
    out = st_num_points(st_geom_type(df, "geom"), "geom")
    got = {
        r["id"]: (r["geom_type"], r["num_points"]) for r in out.collect()
    }
    assert got[1] == ("POINT", 1) and got[2] == ("POINT", 1)
    assert got[3] == ("LINESTRING", 2)
    assert got[4] == ("POLYGON", 5)
    assert got[5] == (None, None)
    env = _parse_envelope(wkb_polygon([sq], srid=4326, big_endian=True))
    assert env == (0.0, 0.0, 4.0, 4.0)
    assert _parse_num_points(wkb_point(1.0, 1.0, srid=1)) == 1
    # bbox predicate over EWKB points
    hit = {
        r["id"]: r["in_bbox"]
        for r in st_within_bbox(df, "geom", 0, -10, 10, 10).collect()
    }
    assert hit[1] is True and hit[2] is True and hit[5] is False


# ---------------------------------------------------------------------------
# round 15: multi-geometry WKB (codes 4-7), batch-vectorized parsers,
# antimeridian boxes, join guards
# ---------------------------------------------------------------------------


def test_multi_geometry_codec_mixed_batch(spark):
    """MULTIPOINT / MULTILINESTRING / MULTIPOLYGON /
    GEOMETRYCOLLECTION decode in every accessor (VERDICT r14 #2) —
    both byte orders, EWKB SRID, mixed-endian children, invalid and
    empty containers NULL."""
    from iceberg_compaction_spark.operators.geo import (
        st_area,
        st_envelope,
        st_geom_type,
        st_length,
        st_num_points,
        wkb_collection,
        wkb_linestring,
        wkb_multilinestring,
        wkb_multipoint,
        wkb_multipolygon,
        wkb_point,
        wkb_polygon,
    )

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    sq2 = [(10.0, 10.0), (12.0, 10.0), (12.0, 12.0), (10.0, 12.0),
           (10.0, 10.0)]
    rows = [
        (1, wkb_multipoint([(1.0, 1.0), (5.0, -2.0), (3.0, 9.0)])),
        (2, wkb_multilinestring([[(0.0, 0.0), (0.0, 5.0)],
                                 [(1.0, 1.0), (4.0, 5.0)]])),
        (3, wkb_multipolygon([[sq, hole], [sq2]])),
        (4, wkb_collection([wkb_point(7.0, 7.0), wkb_polygon([sq]),
                            wkb_multipoint([(0.0, -9.0)])])),
        (5, wkb_multipolygon([[sq]], big_endian=True, srid=4326)),
        # mixed-endian children inside one collection (spec-legal)
        (6, wkb_collection([wkb_point(1.0, 1.0, big_endian=True),
                            wkb_linestring([(2.0, 2.0), (3.0, 3.0)])])),
        (7, wkb_multipoint([])),              # zero children: invalid
        # MULTIPOLYGON whose child is a point: type-violating, invalid
        (8, wkb_collection([wkb_point(0.0, 0.0)], code=6)),
        (9, wkb_multipolygon([[sq]])[:-8]),   # truncated child body
        (10, None),
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    out = st_length(st_area(st_num_points(st_geom_type(
        st_envelope(df, "geom"), "geom"), "geom"), "geom"), "geom")
    got = {
        r["id"]: (
            r["geom_type"],
            r["num_points"],
            None if r["envelope"] is None else tuple(r["envelope"]),
            r["area"],
            r["length"],
        )
        for r in out.collect()
    }
    assert got[1] == ("MULTIPOINT", 3, (1.0, -2.0, 5.0, 9.0), 0.0, 0.0)
    assert got[2] == (
        "MULTILINESTRING", 4, (0.0, 0.0, 4.0, 5.0), 0.0, 10.0)
    assert got[3] == (
        "MULTIPOLYGON", 15, (0.0, 0.0, 12.0, 12.0), 19.0, 28.0)
    assert got[4] == (
        "GEOMETRYCOLLECTION", 7, (0.0, -9.0, 7.0, 7.0), 16.0, 16.0)
    assert got[5] == ("MULTIPOLYGON", 5, (0.0, 0.0, 4.0, 4.0), 16.0, 16.0)
    assert got[6] == (
        "GEOMETRYCOLLECTION", 3, (1.0, 1.0, 3.0, 3.0), 0.0,
        2.0 ** 0.5)
    for bad in (7, 8, 9, 10):
        assert got[bad][1] is None and got[bad][2] is None, bad
        assert got[bad][3] is None and got[bad][4] is None, bad
    # header-tier names may legitimately resolve for 8/9 (body-tier
    # damage); the structural accessors above are the validation
    assert got[7][0] is None or got[7][0] == "MULTIPOINT"


def test_area_clamps_invalid_hole_to_zero(spark):
    """ADVICE r14: a polygon whose hole ring outgrows its shell reads
    area 0, never negative — per PART in a multipolygon, so valid
    sibling parts still count."""
    from iceberg_compaction_spark.operators.geo import (
        st_area,
        wkb_multipolygon,
        wkb_polygon,
    )

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    big = [(-9.0, -9.0), (9.0, -9.0), (9.0, 9.0), (-9.0, 9.0),
           (-9.0, -9.0)]
    rows = [
        (1, wkb_polygon([sq, big])),                 # hole > shell -> 0
        (2, wkb_multipolygon([[sq, big], [sq]])),    # 0 + 16
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    got = {r["id"]: r["area"] for r in st_area(df, "geom").collect()}
    assert got[1] == 0.0
    assert got[2] == 16.0


def test_multi_geometry_parser_properties():
    """Property fuzz extended to codes 4-7 (VERDICT r14 #2): for
    random multi-geometries in random byte orders / SRIDs, the per-row
    reference parsers agree with hand-computed stats, the BATCH parser
    agrees with the per-row reference bit-for-bit on envelopes and
    counts (and to 1e-9 on area/length), and every truncation is NULL."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_compaction_spark.operators.geo import (
        _batch_stats,
        _parse_envelope,
        _parse_length,
        _parse_num_points,
        wkb_collection,
        wkb_multilinestring,
        wkb_multipoint,
        wkb_multipolygon,
        wkb_point,
    )

    coord = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
    pt = st.tuples(coord, coord)
    line = st.lists(pt, min_size=1, max_size=8)

    @settings(max_examples=120, deadline=None)
    @given(
        kind=st.integers(4, 7),
        pts=st.lists(pt, min_size=1, max_size=6),
        lines=st.lists(line, min_size=1, max_size=4),
        big=st.booleans(),
        srid=st.one_of(st.none(), st.integers(0, 10**6)),
    )
    def check(kind, pts, lines, big, srid):
        flat = []
        if kind == 4:
            b = wkb_multipoint(pts, big_endian=big, srid=srid)
            flat = list(pts)
            n_expected = len(pts)
        elif kind == 5:
            b = wkb_multilinestring(lines, big_endian=big, srid=srid)
            flat = [p for ln in lines for p in ln]
            n_expected = len(flat)
        elif kind == 6:
            rings = [ln + [ln[0]] for ln in lines]
            b = wkb_multipolygon([[r] for r in rings],
                                 big_endian=big, srid=srid)
            flat = [p for r in rings for p in r]
            n_expected = len(flat)
        else:
            children = [wkb_point(x, y, big_endian=not big)
                        for x, y in pts]
            children.append(wkb_multipoint(pts, big_endian=big))
            b = wkb_collection(children, big_endian=big, srid=srid)
            flat = list(pts) + list(pts)
            n_expected = 2 * len(pts)
        assert _parse_num_points(b) == n_expected
        xs = [p[0] for p in flat]
        ys = [p[1] for p in flat]
        assert _parse_envelope(b) == (min(xs), min(ys), max(xs), max(ys))
        if kind == 5:
            want = sum(
                math.dist(a, c)
                for ln in lines
                for a, c in zip(ln, ln[1:])
            )
            got = _parse_length(b)
            assert abs(got - want) <= 1e-9 * max(1.0, want)
        # batch parser == per-row reference
        r = _batch_stats([b, None, b"\xff"])
        assert bool(r["valid"][0]) and not r["valid"][1] and not r["valid"][2]
        assert (
            r["xmin"][0], r["ymin"][0], r["xmax"][0], r["ymax"][0]
        ) == _parse_envelope(b)
        assert r["npts"][0] == n_expected
        assert abs(r["length"][0] - _parse_length(b)) <= 1e-9 * max(
            1.0, _parse_length(b)
        )
        # truncation fuzz on a sample of prefixes (full loop is O(n^2))
        for cut in range(0, len(b), max(1, len(b) // 16)):
            assert _parse_envelope(b[:cut]) is None

    check()


def test_batch_parser_speedup_pin():
    """VERDICT r14 #6: the struct-of-arrays batch parse must beat a
    per-row reference-parser loop by >=5x on a polygon-heavy batch —
    the same vectorization pin the DataSource reader carries."""
    import math
    import random
    import time

    from iceberg_compaction_spark.operators.geo import (
        _batch_stats,
        _parse_area,
        _parse_envelope,
        _parse_length,
        _parse_num_points,
        wkb_polygon,
    )

    random.seed(7)
    bufs = []
    for i in range(8000):
        cx, cy = random.uniform(-100, 100), random.uniform(-40, 40)
        ring = [
            (cx + 2 * math.cos(a), cy + 2 * math.sin(a))
            for a in [j * 0.35 for j in range(18)]
        ]
        ring.append(ring[0])
        hole = [
            (cx + 0.5 * math.cos(a), cy + 0.5 * math.sin(a))
            for a in [j * 0.7 for j in range(9)]
        ]
        hole.append(hole[0])
        bufs.append(wkb_polygon([ring, hole], big_endian=(i % 4 == 0)))
    best = 0.0
    for _ in range(3):  # best-of-3 damps CI noise
        t0 = time.perf_counter()
        r = _batch_stats(bufs)
        t1 = time.perf_counter()
        for b in bufs:
            _parse_envelope(b)
            _parse_num_points(b)
            _parse_area(b)
            _parse_length(b)
        t2 = time.perf_counter()
        best = max(best, (t2 - t1) / (t1 - t0))
    assert r["valid"].all()
    assert best >= 5.0, f"batch speedup only {best:.1f}x"


def test_antimeridian_bbox_predicates(spark):
    """VERDICT r14 #5: lon_wrap boxes (xmin > xmax) split at the seam
    — Pacific-crossing queries return the right rows; without the
    flag, reversed bounds raise loudly."""
    import pytest as _pytest

    from iceberg_compaction_spark.operators.geo import (
        st_intersects_bbox,
        st_point,
        st_within_bbox,
    )

    rows = [
        (1, 175.0, 10.0),    # east of the seam: inside
        (2, -175.0, 10.0),   # west of the seam: inside
        (3, 0.0, 10.0),      # Greenwich: outside
        (4, 160.0, 10.0),    # west of xmin: outside
        (5, 175.0, 60.0),    # right lon, wrong lat
        (6, 180.0, 0.0),     # seam edge: inside (east half closed)
        (7, -180.0, 0.0),    # seam edge: inside (west half closed)
    ]
    df = st_point(
        spark.createDataFrame(rows, "id long, lon double, lat double"),
        "lon", "lat",
    )
    got = {
        r["id"]: r["in_bbox"]
        for r in st_within_bbox(
            df, "geom", 170.0, -30.0, -160.0, 30.0, lon_wrap=True
        ).collect()
    }
    assert got == {1: True, 2: True, 3: False, 4: False, 5: False,
                   6: True, 7: True}
    hits = {
        r["id"]: r["hits_bbox"]
        for r in st_intersects_bbox(
            df, "geom", 170.0, -30.0, -160.0, 30.0, lon_wrap=True
        ).collect()
    }
    assert hits == got  # point envelopes: within == intersects
    with _pytest.raises(ValueError, match="lon_wrap"):
        st_within_bbox(df, "geom", 170.0, -30.0, -160.0, 30.0)


def test_tile_bbox_join_lon_wrap_and_collision_guard(spark):
    """The tile join splits wrap regions into two disjoint halves
    before exploding (exactly-once preserved), and rejects a points
    side that already carries bbox column names (VERDICT r14 #7)."""
    import pytest as _pytest

    from iceberg_compaction_spark.operators.geo import st_tile_bbox_join

    pts = spark.createDataFrame(
        [
            (1, 175.0, 10.0),
            (2, -175.0, 10.0),
            (3, 0.0, 10.0),
            (4, 150.0, 10.0),
        ],
        "pid long, lon double, lat double",
    )
    regions = spark.createDataFrame(
        [("pacific", 170.0, -30.0, -160.0, 30.0),
         ("atlantic", -30.0, -30.0, 30.0, 30.0)],
        "region string, xmin double, ymin double, xmax double, ymax double",
    )
    out = st_tile_bbox_join(
        pts, "lon", "lat", regions,
        x_range=(-180.0, 180.0), y_range=(-90.0, 90.0), bits=5,
        lon_wrap=True,
    )
    got = sorted((r["pid"], r["region"]) for r in out.collect())
    assert got == [(1, "pacific"), (2, "pacific"), (3, "atlantic")]
    # exactly-once: no pair duplicated by the two halves
    assert len(got) == len(set(got))
    bad_pts = pts.withColumn("xmin", pts.lon)
    with _pytest.raises(ValueError, match="bbox columns"):
        st_tile_bbox_join(
            bad_pts, "lon", "lat", regions,
            x_range=(-180.0, 180.0), y_range=(-90.0, 90.0),
        )


def test_tile_knn_join_lon_wrap(spark):
    """Round 15: seam-aware kNN — a query at +178 deg finds its
    neighbors at -179 deg via the wrapped distance and the split-box
    tile cover; a radius lapping the whole span raises loudly."""
    import pytest as _pytest

    from iceberg_compaction_spark.operators.geo import st_tile_knn_join

    pts = spark.createDataFrame(
        [
            (1, -179.0, 0.0),   # 3 deg across the seam from the query
            (2, 176.0, 0.0),    # 2 deg on the same side
            (3, -170.0, 0.0),   # 11 deg away (outside radius)
            (4, 0.0, 0.0),      # Greenwich (far)
        ],
        "pid long, lon double, lat double",
    )
    q = spark.createDataFrame([(1, 178.0, 0.0)], "qid long, qx double, qy double")
    out = st_tile_knn_join(
        pts, "lon", "lat", q, "qid", "qx", "qy",
        k=3, radius=5.0,
        x_range=(-180.0, 180.0), y_range=(-90.0, 90.0), bits=5,
        tiebreak_cols=("pid",), lon_wrap=True,
    )
    got = [(r["knn_rank"], r["pid"], r["dist2"]) for r in
           sorted(out.collect(), key=lambda r: r["knn_rank"])]
    assert got == [(1, 2, 4.0), (2, 1, 9.0)]
    with _pytest.raises(ValueError, match="laps"):
        st_tile_knn_join(
            pts, "lon", "lat", q, "qid", "qx", "qy",
            k=3, radius=200.0,
            x_range=(-180.0, 180.0), y_range=(-90.0, 90.0), bits=5,
            lon_wrap=True,
        )


def test_haversine_radius_join_matches_bruteforce(spark):
    """Round 15: the spherical cap-cover radius join returns exactly
    the brute-force haversine result — including a Pacific query whose
    cap crosses the seam and a polar query whose cap covers the full
    longitude band."""
    import math
    import random

    from iceberg_compaction_spark.operators.geo import (
        st_haversine_radius_join,
    )

    rng = random.Random(1514)
    pts = [
        (i, rng.uniform(-180.0, 180.0), rng.uniform(-90.0, 90.0))
        for i in range(400)
    ]
    # plant guaranteed cross-seam and polar neighbors
    pts += [(400, -179.5, 10.0), (401, 179.5, 10.2), (402, 30.0, 89.2)]
    queries = [(1, 179.0, 10.0), (2, -150.0, 88.5), (3, 0.0, 0.0),
               (4, 45.0, 90.0)]  # 4: the literal north pole
    radius = 500_000.0  # 500 km

    def hav(lon1, lat1, lon2, lat2):
        r = 6371008.8
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp = math.radians(lat2 - lat1) / 2
        dl = math.radians(lon2 - lon1) / 2
        a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
        return 2 * r * math.asin(math.sqrt(a))

    expect = sorted(
        (qid, pid)
        for qid, qlon, qlat in queries
        for pid, lon, lat in pts
        if hav(qlon, qlat, lon, lat) <= radius
    )
    assert any(q == 1 and p in (400, 401) for q, p in expect)
    assert any(q == 2 for q, p in expect)  # polar cap has neighbors

    p_df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    q_df = spark.createDataFrame(
        queries, "qid long, qlon double, qlat double"
    )
    out = st_haversine_radius_join(
        p_df, "lon", "lat", q_df, "qid", "qlon", "qlat", radius, bits=6
    )
    got = sorted((r["qid"], r["pid"]) for r in out.collect())
    assert got == expect

    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        st_haversine_radius_join(
            p_df, "lon", "lat", q_df, "qid", "qlon", "qlat", 0.0
        )
    with _pytest.raises(ValueError, match="bbox columns"):
        st_haversine_radius_join(
            p_df, "lon", "lat", q_df.withColumn("xmin", q_df.qlon),
            "qid", "qlon", "qlat", radius,
        )


def test_geom_stats_one_parse_matches_accessors(spark):
    """Round 15: st_geom_stats (every statistic in ONE batch parse)
    agrees field-for-field with the individual accessors over mixed
    geometries — points (fast path), linestrings, multipolygons, both
    byte orders, and invalid WKB (NULL struct)."""
    from iceberg_compaction_spark.operators.geo import (
        st_area,
        st_envelope,
        st_geom_stats,
        st_length,
        st_num_points,
        wkb_linestring,
        wkb_multipolygon,
        wkb_point,
        wkb_polygon,
    )

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]
    rows = [
        (1, wkb_point(3.5, -2.0)),
        (2, wkb_point(7.0, 8.0, big_endian=True)),
        (3, wkb_linestring([(0.0, 0.0), (3.0, 4.0)])),
        (4, wkb_polygon([sq, hole])),
        (5, wkb_multipolygon([[sq], [[(t[0] + 10, t[1]) for t in sq]]],
                             big_endian=True)),
        (6, b"\x01\x99garbage"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, geom binary")
    combo = {
        r["id"]: r["s"]
        for r in st_geom_stats(df, "geom", "s").collect()
    }
    sep = {
        r["id"]: r
        for r in st_envelope(
            st_num_points(st_length(st_area(df, "geom"), "geom"), "geom"),
            "geom", "env",
        ).collect()
    }
    for i in (1, 2, 3, 4, 5):
        c, e = combo[i], sep[i]
        assert c["num_points"] == e["num_points"], i
        assert c["area"] == e["area"], i
        assert c["length"] == e["length"], i
        assert (c["xmin"], c["ymin"], c["xmax"], c["ymax"]) == (
            e["env"]["xmin"], e["env"]["ymin"],
            e["env"]["xmax"], e["env"]["ymax"],
        ), i
    assert combo[6] is None and combo[7] is None
    # spot values: hole-punched square area, two-part multipolygon
    assert combo[4]["area"] == 15.0 and combo[4]["length"] == 20.0
    assert combo[5]["area"] == 32.0 and combo[5]["num_points"] == 10
    assert combo[3]["length"] == 5.0 and combo[3]["area"] == 0.0


def test_cap_file_pruning_with_seam_and_pole(spark, tmp_path):
    """Round 15: spherical-cap file pruning — a Pacific cap keeps the
    files on BOTH sides of the seam and drops Greenwich; a polar cap
    keeps every longitude band inside its latitude reach; kept files
    always cover the haversine join's true matches."""
    import glob
    import shutil

    from iceberg_compaction_spark.operators.geo import (
        cap_cover_boxes,
        prune_tasks_for_cap,
        st_haversine_radius_join,
    )
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "geo")
    os.makedirs(root)
    # four lon-banded files at lat 0-60: [-180,-170], [-10,0], [0,10], [170,180]
    bands = [(-180.0, -170.0), (-10.0, 0.0), (0.0, 10.0), (170.0, 180.0)]
    for i, (lo, hi) in enumerate(bands):
        df = spark.createDataFrame(
            [(i * 100 + j, lo + (hi - lo) * j / 9.0, 6.0 * j)
             for j in range(10)],
            "pid long, lon double, lat double",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{root}/s{i}")
        [part] = glob.glob(f"{root}/s{i}/*.parquet")
        shutil.move(part, f"{root}/band{i}.parquet")
        shutil.rmtree(f"{root}/s{i}")
    m = Manifest.from_parquet_dir(root, sequence_number=1)
    assert len(m.data_files) == 4

    def kept(qlon, qlat, r):
        return sorted(
            os.path.basename(t.data_file_path)
            for t in prune_tasks_for_cap(
                m.data_files, "lon", "lat", qlon, qlat, r
            )
        )

    # Pacific cap at +179: seam halves keep band0 and band3 only
    assert kept(179.0, 10.0, 500_000.0) == ["band0.parquet", "band3.parquet"]
    assert len(cap_cover_boxes(179.0, 10.0, 500_000.0)) == 2
    # Greenwich cap keeps the two central bands
    assert kept(0.0, 30.0, 500_000.0) == ["band1.parquet", "band2.parquet"]
    # polar cap at 88N: full lon band, but lat reach [<=90] touches
    # every file's lat range top (54) only if dlat >= 34 deg (~3800km)
    assert kept(0.0, 88.0, 500_000.0) == []
    assert kept(0.0, 88.0, 4_000_000.0) == [
        "band0.parquet", "band1.parquet", "band2.parquet", "band3.parquet"
    ]
    # safety: kept files cover the join's true matches for the seam cap
    pts = spark.read.parquet(*[t.data_file_path for t in m.data_files])
    q = spark.createDataFrame(
        [(1, 179.0, 10.0)], "qid long, qlon double, qlat double"
    )
    hits = st_haversine_radius_join(
        pts, "lon", "lat", q, "qid", "qlon", "qlat", 500_000.0, bits=5
    ).select("pid").collect()
    hit_pids = {r["pid"] for r in hits}
    assert hit_pids  # the cap does match rows
    kept_pts = spark.read.parquet(*[
        t.data_file_path for t in prune_tasks_for_cap(
            m.data_files, "lon", "lat", 179.0, 10.0, 500_000.0
        )
    ])
    kept_pids = {r["pid"] for r in kept_pts.select("pid").collect()}
    assert hit_pids <= kept_pids


def test_uniform_batch_fast_path_engages_and_matches():
    """Optimization r15: machine-written geometry columns (one encoder,
    one shape per row) take the uniform-layout walk — a single template
    parse + whole-batch structural verification — and must produce
    BIT-identical descriptors/stats to the per-row walk; any
    non-conforming row must disable it for the batch (never a wrong
    answer)."""
    import numpy as np

    from iceberg_compaction_spark.operators import geo as g

    def mp(x0, y0, x1, y1):
        return g.wkb_multipolygon(
            [
                [[(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]],
                [
                    [
                        (x0 + 5, y0 + 5),
                        (x1 + 5, y0 + 5),
                        (x1 + 5, y1 + 5),
                        (x0 + 5, y1 + 5),
                        (x0 + 5, y0 + 5),
                    ]
                ],
            ]
        )

    uniform = [mp(i % 37, i % 31, i % 37 + 2, i % 31 + 3) for i in range(600)]
    # 1) fast path engages on the uniform batch
    called = {"row_walk": False}
    orig_row = g._row_batch_walk

    def spy(bufs, valid):
        called["row_walk"] = True
        return orig_row(bufs, valid)

    g._row_batch_walk = spy
    try:
        r_fast = g._batch_stats(uniform)
    finally:
        g._row_batch_walk = orig_row
    assert not called["row_walk"], "uniform batch must take the fast path"

    # 2) bit-identical to the row walk
    orig_uni = g._uniform_batch_walk
    g._uniform_batch_walk = lambda bufs, valid: None
    try:
        r_slow = g._batch_stats(uniform)
    finally:
        g._uniform_batch_walk = orig_uni
    for key in r_fast:
        assert np.array_equal(r_fast[key], r_slow[key]), key

    # 3) one same-length corrupt row disables the fast path, results
    # stay correct (corrupt row invalid, the rest parsed)
    bad = bytearray(uniform[0])
    bad[1] = 0x99  # invalid geometry type code, same buffer length
    mixed = uniform[:100] + [bytes(bad)] + uniform[100:200]
    r_m = g._batch_stats(mixed)
    assert r_m["valid"][:100].all()
    assert not r_m["valid"][100]
    assert r_m["valid"][101:].all()

    # 4) nulls inside a uniform batch stay null, others fast-parse
    with_nulls = uniform[:50] + [None] + uniform[50:100]
    r_n = g._batch_stats(with_nulls)
    assert not r_n["valid"][50]
    assert r_n["valid"][:50].all() and r_n["valid"][51:].all()
    assert np.array_equal(r_n["area"][:50], r_fast["area"][:50])
