"""Upsert / CDC write path: the producer of the MOR state compaction
consumes.

The reference engine only CONSUMES merge-on-read tables (its docs
describe streaming writers like RisingWave/Flink producing
equality-delete + data files, README.md "Why Compaction"); this module
closes the loop so the Spark engine is a self-contained system: apply a
changes DataFrame to a catalog table the way a streaming upsert sink
would —

- one EQUALITY-DELETE file over the primary keys of every changed row,
  sequenced ABOVE all current data files (so it applies to them and
  only them: Iceberg's sequence-number rule, J2's ``seq`` residual);
- one data file holding the upserted rows, carrying that same new
  sequence number (so the delete does NOT apply to it);
- a CAS catalog commit appending both.

Reading the table through :func:`read_table_mor` then shows exactly the
upserted state; running compaction afterwards materializes it and drops
the delete files — the full produce -> read -> compact lifecycle.

At scale this writes one delete file + one data file per commit
(streaming sinks roll them per checkpoint); the heavy lifting (key
dedup within the batch) is one window-free groupBy on the keys.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.mor import rewrite_file_group
from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    DeleteFile,
    FileGroup,
    FileScanTask,
)
from iceberg_compaction_spark.sources.manifest import Manifest
from iceberg_compaction_spark.sources.scan import HIDDEN_SEQ

DELETE_OP = "D"


def _write_single_parquet(df: DataFrame, path: str) -> None:
    """Write a DataFrame as exactly one parquet FILE at ``path``."""
    tmp = f"{path}.tmpdir-{uuid.uuid4().hex[:8]}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        f for f in os.listdir(tmp) if f.endswith(".parquet")
    )
    os.replace(os.path.join(tmp, part), path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def upsert(
    spark: SparkSession,
    catalog,
    table_name: str,
    changes: DataFrame,
    keys: list[str],
    op_col: str | None = None,
) -> Manifest:
    """Apply ``changes`` to a catalog table as one upsert commit.

    Without ``op_col`` every row is an upsert (insert-or-replace by
    ``keys``).  With ``op_col``, rows whose op is ``"D"`` are deletes
    (key removed, no new row); anything else upserts.  If the batch
    contains several rows per key, the LAST one wins per the dataframe's
    current order is NOT assumed — callers must pre-deduplicate;
    this function asserts key uniqueness to fail loudly instead of
    committing ambiguous state.

    Commit protocol: CAS with retry through the catalog (same seam as
    compaction commits); each retry reloads the table, RE-SEQUENCES the
    write above the fresh head (rewriting the equality-delete file's
    baked sys_hidden_seq_num column when the sequence moved — equality
    deletes apply only to strictly-LOWER sequences, so committing a
    retry at the stale sequence would skip the race winner's files and
    leave two live rows per key), and re-attaches the delete file to the
    files of the fresh snapshot.
    """
    upserts = changes
    deletes = None
    if op_col is not None:
        deletes = changes.where(F.col(op_col) == DELETE_OP).drop(op_col)
        upserts = changes.where(F.col(op_col) != DELETE_OP).drop(op_col)
    n_changed = changes.count()
    n_distinct = changes.select(*keys).distinct().count()
    if n_changed != n_distinct:
        raise ValueError(
            f"changes batch has duplicate keys ({n_changed} rows, "
            f"{n_distinct} distinct keys) — pre-deduplicate (last-wins "
            "or otherwise) before upserting"
        )

    from iceberg_compaction_spark.commit import CommitConflict  # noqa: F401

    current = catalog.load_table(table_name)
    table_root = current.table_root
    suffix = uuid.uuid4().hex[:8]
    eq_path = os.path.join(table_root, f"upsert-{suffix}-eqdel.parquet")
    data_path = os.path.join(table_root, f"upsert-{suffix}-data.parquet")

    # equality-delete keys: EVERY change row (upserts replace, deletes
    # remove — both need the old row gone)
    key_df = (
        upserts.select(*keys)
        if deletes is None
        else upserts.select(*keys).unionByName(deletes.select(*keys))
    )
    has_upserts = upserts.limit(1).count() > 0
    if has_upserts:
        _write_single_parquet(upserts, data_path)

    written_seq: list[int] = []  # seq the eq parquet currently carries

    def _stamp(seq: int) -> None:
        """(Re)write the eq-delete parquet with ``seq`` baked into its
        sys_hidden_seq_num column.  os.replace keeps the path stable, so
        retries republish the same manifest paths."""
        _write_single_parquet(
            key_df.withColumn(HIDDEN_SEQ, F.lit(seq).cast("long")), eq_path
        )
        written_seq[:] = [seq]

    def attempt() -> Manifest:
        cur = catalog.load_table(table_name)
        # sequence ABOVE the head we are committing against — recomputed
        # per attempt so a retry after losing the CAS race lands STRICTLY
        # above the winner (its delete must apply to the winner's files)
        new_seq = cur.sequence_number + 1
        if written_seq != [new_seq]:
            _stamp(new_seq)
        eq_file = DeleteFile(
            path=eq_path,
            content=EQUALITY_DELETE,
            file_size_in_bytes=os.path.getsize(eq_path),
            sequence_number=new_seq,
            equality_ids=tuple(keys),
        )
        data_task = None
        if has_upserts:
            import pyarrow.parquet as pq

            md = pq.read_metadata(data_path)
            # data parquet carries no seq column (seq is manifest
            # metadata, attached at scan time) — no rewrite needed
            data_task = FileScanTask(
                data_file_path=data_path,
                length=os.path.getsize(data_path),
                file_size_in_bytes=os.path.getsize(data_path),
                record_count=md.num_rows,
                sequence_number=new_seq,
            )
        # from_dict round-trip: a deep copy that preserves EVERY table
        # property (partition spec, declared sort order, last-column-id,
        # per-file spec ids and column bounds) — rebuilding the manifest
        # field-by-field here silently dropped them (round-8 fix)
        new = Manifest.from_dict(cur.to_dict())
        new.snapshot_id = cur.next_snapshot()
        new.sequence_number = new_seq
        # rows change in place: streaming raises unless skipped
        new.operation = "overwrite"
        for t in new.data_files:
            # the new delete applies to every file with an older
            # sequence number — i.e. all current files
            t.deletes.append(eq_file)
        if data_task is not None:
            new.data_files.append(data_task)
        return catalog.commit_table(table_name, cur.snapshot_id, new)

    from iceberg_compaction_spark.commit import CommitManager

    return CommitManager().commit_with_retry(attempt)


def delete_where(
    spark: SparkSession,
    catalog,
    table_name: str,
    predicate: str,
) -> Manifest:
    """Predicate DELETE producing merge-on-read state — the DML that
    pairs with :func:`upsert`'s key-based path (``DELETE FROM t WHERE
    ...`` in Iceberg engines writes position deletes, never rewrites
    data files).

    Scans the CURRENT snapshot with hidden ``(file, pos)`` identity,
    evaluates ``predicate`` over already-MOR-merged rows (a row deleted
    by an earlier commit can't match twice), and commits ONE
    position-delete artifact covering the matches: a
    ``(sys_hidden_file_path, sys_hidden_pos)`` parquet trail on v2
    tables, a puffin deletion vector (one Roaring blob per referenced
    data file, serialized on executors) on v3.  The delete attaches
    only to the data files it references.  No matches -> no commit.

    Retry semantics: losing the CAS race re-runs the WHOLE attempt
    against the fresh head — positions are only valid for the exact
    files they were computed from, and the predicate must also see
    rows added by the race winner (the serializable-delete view).

    Scale shape: the scan + filter is a distributed plan with the
    predicate eligible for pushdown; positions never exist driver-side
    (single-file parquet write, or executor-serialized DV blobs) —
    only the REFERENCED FILE PATHS are collected, which is manifest
    scale by definition.
    """
    from iceberg_compaction_spark.plans.datamodel import POSITION_DELETE
    from iceberg_compaction_spark.sources.scan import (
        HIDDEN_FILE_PATH,
        HIDDEN_POS,
        normalize_path_str,
    )

    suffix = uuid.uuid4().hex[:8]

    def attempt() -> Manifest:
        cur = catalog.load_table(table_name)
        group = FileGroup.from_tasks(cur.data_files)
        group.format_version = cur.format_version
        group.schema_fields = cur.schema_fields or None
        group.name_mapping = _manifest_name_mapping(cur)
        df = rewrite_file_group(spark, group, keep_file_pos=True)
        matched = df.where(predicate).select(HIDDEN_FILE_PATH, HIDDEN_POS)

        v3 = cur.format_version >= 3
        path = os.path.join(
            cur.table_root,
            f"delete-{suffix}" + (".puffin" if v3 else "-pos.parquet"),
        )
        if v3:
            from iceberg_compaction_spark.compaction import (
                _write_v3_dv_file,
            )

            refs, n = _write_v3_dv_file(spark, matched, path)
        else:
            _write_single_parquet(
                matched.orderBy(HIDDEN_FILE_PATH, HIDDEN_POS), path
            )
            import pyarrow.parquet as pq

            t = pq.read_table(path, columns=[HIDDEN_FILE_PATH])
            n = t.num_rows
            refs = set(t.column(HIDDEN_FILE_PATH).unique().to_pylist())
        if n == 0:
            os.remove(path)
            return cur

        new_seq = cur.sequence_number + 1
        dfile = DeleteFile(
            path=path,
            content=POSITION_DELETE,
            file_size_in_bytes=os.path.getsize(path),
            record_count=n,
            sequence_number=new_seq,
        )
        new = Manifest.from_dict(cur.to_dict())
        new.snapshot_id = cur.next_snapshot()
        new.sequence_number = new_seq
        new.operation = "delete"
        for t in new.data_files:
            if normalize_path_str(t.data_file_path) in refs:
                t.deletes.append(dfile)
        return catalog.commit_table(table_name, cur.snapshot_id, new)

    from iceberg_compaction_spark.commit import CommitManager

    return CommitManager().commit_with_retry(attempt)


def read_table_mor(spark: SparkSession, manifest: Manifest) -> DataFrame:
    """Read a manifest table with all its delete files applied — the
    query-engine view of a MOR table (what compaction materializes)."""
    group = FileGroup.from_tasks(manifest.data_files)
    group.format_version = manifest.format_version
    group.schema_fields = manifest.schema_fields or None
    group.name_mapping = _manifest_name_mapping(manifest)
    return rewrite_file_group(spark, group)


def _manifest_name_mapping(manifest: Manifest) -> dict | None:
    from iceberg_compaction_spark.sources.schema_evo import (
        NAME_MAPPING_PROP,
        parse_name_mapping,
    )

    return (
        parse_name_mapping(
            (manifest.properties or {}).get(NAME_MAPPING_PROP)
        )
        or None
    )
