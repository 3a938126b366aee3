"""Iceberg-style metadata tables: ``files``, ``delete_files``,
``partitions``, ``snapshots``, ``history``, ``refs``.

Iceberg exposes table metadata as queryable relations
(``SELECT * FROM tbl$files`` in Spark/Trino); every operator of a real
table uses them to audit layout, pick compaction targets, and debug
commits.  The reference engine has no equivalent surface (it is a
bounded compaction executor — SURVEY §2.9), so this exceeds parity in
the direction a production user needs first.

Scale stance: table metadata describes FILES, not rows.  A 100 TB
table at ~1 GiB/file is ~10^5 file entries and a few thousand
snapshots — driver-side construction into ``spark.createDataFrame`` is
the honest design (same reasoning as the planning layer, SURVEY §2.7):
once a DataFrame, the rows distribute and join/filter like any other
relation.  A table whose *metadata* outgrew the driver would need the
manifest-Avro files themselves read as a distributed scan; the JSON
manifest layer here has no such files, so that path would be
speculative plumbing.

All row builders are pure functions over :class:`Manifest` /
:class:`FileCatalog` so the DataSource's ``option("metadata", ...)``
read path (sources/datasource.py) and the DataFrame helpers here share
one definition of each table.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from pyspark.sql import types as T

from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    FileScanTask,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

    from iceberg_compaction_spark.sources.manifest import Manifest

# Iceberg manifest-entry content ids (spec: manifests, ``content``)
CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1
CONTENT_EQUALITY_DELETES = 2

FILES_SCHEMA = T.StructType(
    [
        T.StructField("content", T.IntegerType(), False),
        T.StructField("file_path", T.StringType(), False),
        T.StructField("file_format", T.StringType(), False),
        T.StructField("spec_id", T.IntegerType(), False),
        T.StructField(
            "partition", T.MapType(T.StringType(), T.StringType()), True
        ),
        T.StructField("record_count", T.LongType(), False),
        T.StructField("file_size_in_bytes", T.LongType(), False),
        T.StructField("sequence_number", T.LongType(), False),
        # data files only (NULL on delete rows): number of delete files
        # attached to this file's scan task
        T.StructField("delete_file_count", T.IntegerType(), True),
        T.StructField("position_delete_count", T.IntegerType(), True),
        T.StructField("equality_delete_count", T.IntegerType(), True),
        # data files only: manifest column bounds as JSON (the stats
        # the pruning tiers evaluate) — inspectable, not relational
        T.StructField("column_bounds", T.StringType(), True),
        # delete rows only: equality key columns as JSON
        T.StructField("equality_ids", T.StringType(), True),
        # delete rows only: number of data files this delete attaches to
        T.StructField("applies_to_files", T.IntegerType(), True),
    ]
)

PARTITIONS_SCHEMA = T.StructType(
    [
        T.StructField(
            "partition", T.MapType(T.StringType(), T.StringType()), True
        ),
        T.StructField("spec_id", T.IntegerType(), False),
        T.StructField("file_count", T.LongType(), False),
        T.StructField("record_count", T.LongType(), False),
        T.StructField("total_size_in_bytes", T.LongType(), False),
        T.StructField("delete_file_count", T.LongType(), False),
    ]
)

SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("sequence_number", T.LongType(), False),
        T.StructField("operation", T.StringType(), True),
        T.StructField("schema_id", T.IntegerType(), False),
        T.StructField("data_file_count", T.LongType(), False),
        T.StructField("delete_file_count", T.LongType(), False),
        T.StructField("total_records", T.LongType(), False),
        T.StructField("total_data_size_in_bytes", T.LongType(), False),
        T.StructField("format_version", T.IntegerType(), False),
    ]
)

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("parent_id", T.LongType(), True),
        # Iceberg's is_current_ancestor: on-main-lineage — false for
        # unpublished branch snapshots and rolled-past commits (r10)
        T.StructField("is_current_ancestor", T.BooleanType(), False),
        T.StructField("is_current", T.BooleanType(), False),
    ]
)

REFS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
    ]
)

METADATA_TABLES = ("files", "delete_files", "partitions", "snapshots",
                   "history", "refs")


def _file_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".puffin":
        return "PUFFIN"
    if ext == ".avro":
        return "AVRO"
    if ext == ".orc":
        return "ORC"
    return "PARQUET"


def _part_map(task: FileScanTask, manifest: "Manifest") -> dict | None:
    """Partition tuple -> {field_name: str(value)}.

    Field names come from the table's partition spec; a file written
    under an OLDER spec (different arity — spec evolution) falls back
    to positional ``p{i}`` names rather than mislabeling values."""
    vals = tuple(task.partition or ())
    if not vals:
        return None
    names = [f.get("name") for f in (manifest.partition_spec or [])]
    if len(names) != len(vals) or any(not n for n in names):
        names = [f"p{i}" for i in range(len(vals))]
    return {n: (None if v is None else str(v)) for n, v in zip(names, vals)}


def files_rows(manifest: "Manifest") -> list[tuple]:
    """One row per data file plus one per distinct attached delete file
    (delete files dedup by path across data files, mirroring L9)."""
    import json

    rows: list[tuple] = []
    deletes: dict[str, list] = {}
    for t in manifest.data_files:
        pm = _part_map(t, manifest)
        pos = sum(1 for d in t.deletes if d.content != EQUALITY_DELETE)
        rows.append(
            (
                CONTENT_DATA,
                t.data_file_path,
                _file_format(t.data_file_path),
                int(t.spec_id),
                pm,
                int(t.record_count),
                int(t.file_size_in_bytes),
                int(t.sequence_number),
                len(t.deletes),
                pos,
                len(t.deletes) - pos,
                json.dumps(t.column_bounds, default=str)
                if t.column_bounds
                else None,
                None,
                None,
            )
        )
        for d in t.deletes:
            content = (
                CONTENT_EQUALITY_DELETES
                if d.content == EQUALITY_DELETE
                else CONTENT_POSITION_DELETES
            )
            row = deletes.setdefault(
                d.path,
                [
                    content,
                    d.path,
                    _file_format(d.path),
                    int(t.spec_id),
                    pm,
                    int(d.record_count),
                    int(d.file_size_in_bytes),
                    int(d.sequence_number),
                    None,
                    None,
                    None,
                    None,
                    json.dumps(list(d.equality_ids))
                    if d.equality_ids
                    else None,
                    0,
                ],
            )
            row[13] += 1  # data files this delete file attaches to
            # A delete file shared across partitions has no single
            # partition cell: null it (matches the applies_to_files
            # aggregation stance) instead of reporting the first data
            # file's partition as if it were the delete's own.
            if row[13] > 1 and row[4] != pm:
                row[4] = None
    rows.extend(tuple(r) for r in deletes.values())
    return rows


def partitions_rows(manifest: "Manifest") -> list[tuple]:
    """Per-partition layout summary over the current snapshot's data
    files (delete files count toward ``delete_file_count`` only)."""
    agg: dict[tuple, list] = {}
    for t in manifest.data_files:
        pm = _part_map(t, manifest)
        key = tuple(sorted(pm.items())) if pm else ()
        a = agg.setdefault(key, [pm, int(t.spec_id), 0, 0, 0, set()])
        a[2] += 1
        a[3] += int(t.record_count)
        a[4] += int(t.file_size_in_bytes)
        a[5].update(d.path for d in t.deletes)
    return [
        (pm, spec, files, recs, size, len(dels))
        for pm, spec, files, recs, size, dels in agg.values()
    ]


def snapshots_rows(catalog, name: str) -> list[tuple]:
    rows = []
    for sid in catalog.table_history(name):
        m = catalog.load_table_at(name, sid)
        dels = {d.path for t in m.data_files for d in t.deletes}
        rows.append(
            (
                int(m.snapshot_id),
                int(m.sequence_number),
                m.operation or None,
                int(m.schema_id),
                len(m.data_files),
                len(dels),
                sum(int(t.record_count) for t in m.data_files),
                sum(int(t.file_size_in_bytes) for t in m.data_files),
                int(m.format_version),
            )
        )
    return rows


def history_rows(catalog, name: str) -> list[tuple]:
    """Round 10: lineage-aware like Iceberg's history table — the
    current head is the PINNED main when refs exist (WAP), ``parent_id``
    comes from the commit's parent stamp (legacy versions degrade to the
    previous retained version), and ``is_current_ancestor`` is real:
    False for unpublished branch snapshots and for rolled-past commits
    off the current chain."""
    hist = catalog.table_history(name)
    head = max(hist, default=0)
    try:
        main = catalog.list_refs(name).get("main")
        if main:
            head = main["snapshot_id"]
    except (AttributeError, FileNotFoundError):
        pass
    parents = {}
    sp = getattr(catalog, "snapshot_parents", None)
    if sp is not None:
        parents = sp(name)
    lineage = set(hist)
    sl = getattr(catalog, "snapshot_lineage", None)
    if sl is not None and head:
        try:
            lineage = set(sl(name, head, 0))
        except ValueError:
            pass  # mid-chain expired: fall back to retained-set
    rows = []
    for prev, sid in zip([None, *hist[:-1]], hist):
        parent = parents.get(sid) or prev  # stamp wins; legacy = linear
        rows.append(
            (
                int(sid),
                int(parent) if parent is not None else None,
                sid in lineage,
                sid == head,
            )
        )
    return rows


def refs_rows(catalog, name: str) -> list[tuple]:
    try:
        refs = catalog.list_refs(name)
    except (AttributeError, FileNotFoundError):
        return []
    return [
        (rname, str(r.get("type", "branch")), int(r.get("snapshot_id", 0)))
        for rname, r in sorted(refs.items())
    ]


_SCHEMAS = {
    "files": FILES_SCHEMA,
    "delete_files": FILES_SCHEMA,
    "partitions": PARTITIONS_SCHEMA,
    "snapshots": SNAPSHOTS_SCHEMA,
    "history": HISTORY_SCHEMA,
    "refs": REFS_SCHEMA,
}


def metadata_schema(kind: str) -> T.StructType:
    if kind not in _SCHEMAS:
        raise ValueError(
            f"unknown metadata table {kind!r}; one of {METADATA_TABLES}"
        )
    return _SCHEMAS[kind]


def metadata_rows(catalog, name: str, kind: str,
                  snapshot_id: int | None = None) -> list[tuple]:
    """Shared row source for the helpers below AND the DataSource's
    ``option("metadata", kind)`` read path."""
    if kind in ("snapshots", "history", "refs"):
        return {
            "snapshots": snapshots_rows,
            "history": history_rows,
            "refs": refs_rows,
        }[kind](catalog, name)
    m = (
        catalog.load_table_at(name, snapshot_id)
        if snapshot_id is not None
        else catalog.load_table(name)
    )
    if kind == "files":
        return [r for r in files_rows(m) if r[0] == CONTENT_DATA]
    if kind == "delete_files":
        return [r for r in files_rows(m) if r[0] != CONTENT_DATA]
    if kind == "partitions":
        return partitions_rows(m)
    raise ValueError(
        f"unknown metadata table {kind!r}; one of {METADATA_TABLES}"
    )


# --- DataFrame helpers (library surface) -------------------------------------


def files_df(spark: "SparkSession", manifest: "Manifest") -> "DataFrame":
    """All file entries (data + deletes) of one snapshot as a DataFrame."""
    return spark.createDataFrame(files_rows(manifest), FILES_SCHEMA)


def partitions_df(spark: "SparkSession", manifest: "Manifest") -> "DataFrame":
    return spark.createDataFrame(partitions_rows(manifest), PARTITIONS_SCHEMA)


def snapshots_df(spark: "SparkSession", catalog, name: str) -> "DataFrame":
    return spark.createDataFrame(snapshots_rows(catalog, name), SNAPSHOTS_SCHEMA)


def history_df(spark: "SparkSession", catalog, name: str) -> "DataFrame":
    return spark.createDataFrame(history_rows(catalog, name), HISTORY_SCHEMA)


def refs_df(spark: "SparkSession", catalog, name: str) -> "DataFrame":
    return spark.createDataFrame(refs_rows(catalog, name), REFS_SCHEMA)
