"""Iceberg-style metadata tables: the table's own metadata as
DataFrames.

Iceberg exposes ``db.table.files`` / ``.snapshots`` / ``.history`` /
``.partitions`` as queryable tables; this module provides the same
inspection surface over the engine's manifests (`SELECT * FROM` the
planning state that drives compaction decisions).

All of these build from MANIFEST metadata — one row per file or
snapshot, never a data-file read.  That is the defining property of a
metadata table: a 100 TB table answers "how many files, how skewed,
which partitions are hot" from kilobytes of manifest, and the result is
a real DataFrame so the whole SQL surface (filters, aggregates, joins
against data) applies.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    POSITION_DELETE,
)
from iceberg_compaction_spark.sources.manifest import Manifest

__all__ = [
    "files_table",
    "delete_files_table",
    "partitions_table",
    "snapshots_table",
    "history_table",
]

_FILES_SCHEMA = (
    "file_path string, file_size_in_bytes long, record_count long, "
    "sequence_number long, partition string, spec_id int, "
    "position_delete_count int, equality_delete_count int, "
    "column_bounds string"
)


def files_table(spark: SparkSession, manifest: Manifest) -> DataFrame:
    """One row per live data file (Iceberg's ``.files``)."""
    rows = [
        (
            t.data_file_path,
            int(t.file_size_in_bytes),
            int(t.record_count),
            int(t.sequence_number),
            json.dumps(list(t.partition)) if t.partition else None,
            int(t.spec_id),
            sum(1 for d in t.deletes if d.content == POSITION_DELETE),
            sum(1 for d in t.deletes if d.content == EQUALITY_DELETE),
            json.dumps(t.column_bounds, default=str) if t.column_bounds else None,
        )
        for t in manifest.data_files
    ]
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def delete_files_table(spark: SparkSession, manifest: Manifest) -> DataFrame:
    """One row per distinct delete file (Iceberg's ``.delete_files``)."""
    seen = {}
    for t in manifest.data_files:
        for d in t.deletes:
            row = seen.setdefault(
                d.path,
                [
                    d.path,
                    "position" if d.content == POSITION_DELETE else "equality",
                    int(d.file_size_in_bytes),
                    int(d.sequence_number),
                    json.dumps(list(d.equality_ids)) if d.equality_ids else None,
                    0,
                ],
            )
            row[5] += 1  # number of data files this delete file applies to
    return spark.createDataFrame(
        [tuple(v) for v in seen.values()],
        "file_path string, content string, file_size_in_bytes long, "
        "sequence_number long, equality_ids string, applies_to_files int",
    )


def partitions_table(spark: SparkSession, manifest: Manifest) -> DataFrame:
    """Per-partition rollup (Iceberg's ``.partitions``): file count,
    records, bytes, delete-file pressure — the table a compaction
    operator inspects to find fragmented or delete-heavy partitions."""
    agg: dict = {}
    for t in manifest.data_files:
        key = json.dumps(list(t.partition)) if t.partition else None
        a = agg.setdefault(key, [0, 0, 0, 0])
        a[0] += 1
        a[1] += int(t.record_count)
        a[2] += int(t.file_size_in_bytes)
        a[3] += len(t.deletes)
    return spark.createDataFrame(
        [(k, *v) for k, v in agg.items()],
        "partition string, file_count int, record_count long, "
        "total_size_in_bytes long, delete_file_count int",
    )


def snapshots_table(spark: SparkSession, catalog, name: str) -> DataFrame:
    """One row per retained snapshot (Iceberg's ``.snapshots``), built
    by walking the catalog's history — still metadata-only."""
    rows = []
    for sid in catalog.table_history(name):
        m = catalog.load_table_at(name, sid)
        rows.append(
            (
                int(m.snapshot_id),
                int(m.sequence_number),
                int(m.schema_id),
                int(m.format_version),
                len(m.data_files),
                int(sum(t.record_count for t in m.data_files)),
                int(sum(t.file_size_in_bytes for t in m.data_files)),
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id long, sequence_number long, schema_id int, "
        "format_version int, data_file_count int, total_records long, "
        "total_data_size_in_bytes long",
    )


def history_table(spark: SparkSession, catalog, name: str) -> DataFrame:
    """Snapshot lineage with the current flag (Iceberg's ``.history``)."""
    history = catalog.table_history(name)
    current = history[-1] if history else None
    return spark.createDataFrame(
        [(int(s), s == current) for s in history],
        "snapshot_id long, is_current_ancestor boolean",
    )
