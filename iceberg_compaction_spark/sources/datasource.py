"""Spark Python DataSource for the engine's tables: batch MOR reads and
a Structured Streaming CHANGES source.

PySpark 4's DataSource API lets pure-Python formats plug into
``spark.read.format(...)`` / ``spark.readStream.format(...)`` with real
partition-parallel execution: the driver plans ``InputPartition``s, each
executor calls ``read(partition)`` and yields Arrow batches.  This
module registers ``iceberg-table``:

- **Batch**: the table's CURRENT snapshot with merge-on-read applied —
  position deletes as row-index masks, equality deletes as key-set
  anti-filters honoring the strictly-lower-sequence rule.  One
  partition per data file, so Spark parallelizes across files exactly
  like the native parquet source; delete content is re-read per
  partition executor-side (delete sets are small next to data, and
  nothing ever funnels through the driver).
- **Streaming**: incremental append consumption, the shape of Iceberg's
  Spark streaming read: each micro-batch covers the snapshots committed
  since the last offset; append-only commits emit their added files'
  rows; rewrite/replace commits (file removals with identical live
  rows) are SKIPPED — a compaction must not replay the table into
  downstream consumers; commits that change existing rows (new delete
  attachments) raise unless ``skip_overwrites`` is set, mirroring
  Iceberg's ``streaming-skip-overwrite-snapshots``.

Offsets are ``{"snapshot": id}`` — resumable, exactly-once at the
snapshot granularity, because snapshots are immutable and totally
ordered.

Usage::

    from iceberg_compaction_spark.sources.datasource import register
    register(spark)
    df = (spark.read.format("iceberg-table")
          .option("warehouse", wh).option("table", "t").load())
    stream = (spark.readStream.format("iceberg-table")
              .option("warehouse", wh).option("table", "t").load())

Executor-side reads use only pyarrow + the filesystem (no SparkSession,
no engine imports beyond dataclasses), which is what makes the source
serializable and cluster-safe.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

FORMAT_NAME = "iceberg-table"

_ARROW_TO_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "long",
    "float": "float",
    "double": "double",
    "bool": "boolean",
    "string": "string",
    "large_string": "string",
    "binary": "binary",
    "large_binary": "binary",
    "date32[day]": "date",
}


def _ddl_from_file(path: str) -> str:
    import pyarrow.parquet as pq

    fields = []
    for f in pq.read_schema(path):
        t = str(f.type)
        if t.startswith("timestamp"):
            ddl = "timestamp"
        elif t in _ARROW_TO_DDL:
            ddl = _ARROW_TO_DDL[t]
        else:
            raise ValueError(
                f"unsupported column type for {FORMAT_NAME}: {f.name}: {t}"
            )
        fields.append(f"{f.name} {ddl}")
    return ", ".join(fields)


@dataclass
class _FilePartition(InputPartition):
    """One data file + the delete content that applies to it.  Plain
    picklable data: executors re-read delete files with pyarrow."""

    path: str
    sequence_number: int = 0
    pos_delete_paths: tuple = ()
    # (path, sequence_number, key_columns) triples
    eq_deletes: tuple = ()


def _read_partition(part: _FilePartition, columns: list[str] | None):
    """Executor-side MOR for one file: pyarrow only.

    The data file is STREAMED batch-by-batch (never materialized whole
    — a task holds one Arrow batch, not a 1 GB file); delete content is
    loaded up front because delete sets are small next to data.
    Position deletes become an absolute-row-index mask tracked across
    batches; equality deletes a key-set anti-filter under the
    strictly-lower-sequence rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def norm(p: str) -> str:
        for pre in ("file://", "file:"):
            if p.startswith(pre):
                p = p[len(pre):]
                break
        return p

    drop: set[int] = set()
    if part.pos_delete_paths:
        me = norm(part.path)
        for dp in part.pos_delete_paths:
            dt = pq.read_table(
                dp, columns=["sys_hidden_file_path", "sys_hidden_pos"]
            )
            for p, pos in zip(
                dt.column("sys_hidden_file_path").to_pylist(),
                dt.column("sys_hidden_pos").to_pylist(),
            ):
                if norm(p) == me:
                    drop.add(pos)
    eq_key_sets = []
    for dp, dseq, key_cols in part.eq_deletes:
        # equality deletes apply to strictly LOWER sequence numbers
        if not dseq > part.sequence_number:
            continue
        key_cols = list(key_cols)
        dt = pq.read_table(dp, columns=key_cols)
        keys = set(zip(*[dt.column(c).to_pylist() for c in key_cols]))
        if keys:
            eq_key_sets.append((key_cols, keys))

    pf = pq.ParquetFile(part.path)
    offset = 0
    for batch in pf.iter_batches():
        table = pa.Table.from_batches([batch])
        n = table.num_rows
        if drop:
            local = [p - offset for p in drop if offset <= p < offset + n]
            if local:
                hit = set(local)
                table = table.filter([i not in hit for i in range(n)])
        offset += n
        for key_cols, keys in eq_key_sets:
            cols = [table.column(c).to_pylist() for c in key_cols]
            table = table.filter([t not in keys for t in zip(*cols)])
        if columns:
            table = table.select(columns)
        if table.num_rows:
            yield from table.to_batches()


def _partitions_for_manifest(manifest) -> list[_FilePartition]:
    parts = []
    for t in manifest.data_files:
        pos, eq = [], []
        for d in t.deletes:
            if d.content == "position_delete":
                pos.append(d.path)
            else:
                eq.append((d.path, d.sequence_number, tuple(d.equality_ids)))
        parts.append(
            _FilePartition(
                path=t.data_file_path,
                sequence_number=t.sequence_number,
                pos_delete_paths=tuple(pos),
                eq_deletes=tuple(eq),
            )
        )
    return parts


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self._wh = options["warehouse"]
        self._table = options["table"]
        self._snapshot = options.get("snapshot_id")

    def partitions(self):
        from iceberg_compaction_spark.sources.catalog import FileCatalog

        cat = FileCatalog(warehouse=self._wh)
        m = (
            cat.load_table_at(self._table, int(self._snapshot))
            if self._snapshot
            else cat.load_table(self._table)
        )
        return _partitions_for_manifest(m)

    def read(self, partition):
        yield from _read_partition(partition, None)


class _ChangesStreamReader(DataSourceStreamReader):
    """Micro-batch source over the table's commit log."""

    def __init__(self, options):
        self._wh = options["warehouse"]
        self._table = options["table"]
        self._starting = options.get("starting_snapshot")
        self._skip_overwrites = (
            str(options.get("skip_overwrites", "false")).lower() == "true"
        )

    def _catalog(self):
        from iceberg_compaction_spark.sources.catalog import FileCatalog

        return FileCatalog(warehouse=self._wh)

    def initialOffset(self):
        if self._starting == "earliest":
            return {"snapshot": 0}
        if self._starting:
            return {"snapshot": int(self._starting)}
        # default: only NEW commits (Iceberg's streaming default)
        return {"snapshot": self._catalog().load_table(self._table).snapshot_id}

    def latestOffset(self):
        return {"snapshot": self._catalog().load_table(self._table).snapshot_id}

    def partitions(self, start, end):
        from iceberg_compaction_spark.sources.changes import diff_files

        cat = self._catalog()
        lo, hi = start["snapshot"], end["snapshot"]
        history = [s for s in cat.table_history(self._table) if lo <= s <= hi]
        parts: list[_FilePartition] = []
        prev = None
        for sid in history:
            m = cat.load_table_at(self._table, sid)
            if prev is not None and sid > lo:
                d = diff_files(prev, m)
                if d.is_noop:
                    pass
                elif d.is_append_only:
                    added = set(d.added_data_files)
                    parts.extend(
                        p
                        for p in _partitions_for_manifest(m)
                        if p.path in added
                    )
                elif not d.removed_data_files and d.changed_delete_files:
                    # rows changed in place (upsert/delete commit)
                    if not self._skip_overwrites:
                        raise ValueError(
                            f"snapshot {sid} of {self._table!r} changes "
                            "existing rows; set skip_overwrites=true to "
                            "stream past it (added files still emit)"
                        )
                    added = set(d.added_data_files)
                    parts.extend(
                        p
                        for p in _partitions_for_manifest(m)
                        if p.path in added
                    )
                # else: rewrite/replace (file removals, identical live
                # rows) — never replayed downstream
            prev = m
        return parts

    def read(self, partition):
        yield from _read_partition(partition, None)

    def commit(self, end):
        pass

    def stop(self):
        pass


class IcebergTableDataSource(DataSource):
    """``iceberg-table``: batch MOR reads + streaming append consumption
    of this engine's catalog tables, executor-parallel via pyarrow."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        from iceberg_compaction_spark.sources.catalog import FileCatalog

        if "schema" in self.options:
            return self.options["schema"]
        cat = FileCatalog(warehouse=self.options["warehouse"])
        m = cat.load_table(self.options["table"])
        if not m.data_files:
            raise ValueError(
                f"{self.options['table']!r} has no data files; pass an "
                "explicit .option('schema', ddl)"
            )
        return _ddl_from_file(m.data_files[0].data_file_path)

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _ChangesStreamReader(self.options)

    def writer(self, schema, overwrite):
        return _AppendWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return _StreamAppendWriter(self.options)


def register(spark) -> None:
    """Register the ``iceberg-table`` format on this session."""
    spark.dataSource.register(IcebergTableDataSource)


# --- write path --------------------------------------------------------------


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str = ""
    rows: int = 0
    size: int = 0


class _AppendWriter(DataSourceWriter):
    """Executor-parallel append: each task writes one parquet file into
    the table root with pyarrow; the DRIVER turns the commit messages
    into new FileScanTasks and CAS-commits them against the catalog
    head with the standard retry loop.  Files from aborted jobs are
    never referenced and age out through remove_orphan_files — the same
    write-then-swap discipline as the compaction path, so a crashed
    write can never corrupt the table."""

    def __init__(self, options, overwrite: bool):
        self._wh = options["warehouse"]
        self._table = options["table"]
        self._overwrite = overwrite
        # resolve the target directory at plan time (driver); executors
        # must not need the catalog
        from iceberg_compaction_spark.sources.catalog import FileCatalog

        self._root = (
            FileCatalog(warehouse=self._wh).load_table(self._table).table_root
        )

    def write(self, iterator):
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = list(iterator)
        if not rows:
            return _FileCommit()
        cols = rows[0].__fields__
        table = pa.table(
            {c: [r[c] for r in rows] for c in cols}
        )
        path = os.path.join(
            self._root, f"append-{_uuid.uuid4().hex[:12]}.parquet"
        )
        pq.write_table(table, path, compression="zstd")
        return _FileCommit(
            path=path, rows=table.num_rows, size=os.path.getsize(path)
        )

    def commit(self, messages):
        from iceberg_compaction_spark.commit import CommitManager
        from iceberg_compaction_spark.plans.datamodel import FileScanTask
        from iceberg_compaction_spark.plans import pruning as pr
        from iceberg_compaction_spark.sources.catalog import FileCatalog

        files = [m for m in messages if m and m.path]
        cat = FileCatalog(warehouse=self._wh)
        mgr = CommitManager()

        def attempt():
            cur = cat.load_table(self._table)
            new_seq = cur.sequence_number + 1
            added = []
            for m in files:
                bounds, nulls = pr.collect_file_stats(m.path)
                added.append(
                    FileScanTask(
                        data_file_path=m.path,
                        length=m.size,
                        file_size_in_bytes=m.size,
                        record_count=m.rows,
                        sequence_number=new_seq,
                        spec_id=cur.default_spec_id,
                        column_bounds=bounds,
                        null_counts=nulls,
                    )
                )
            from iceberg_compaction_spark.sources.manifest import Manifest

            new = Manifest.from_dict(cur.to_dict())
            new.snapshot_id = cur.snapshot_id + 1
            new.sequence_number = new_seq
            if self._overwrite:
                new.data_files = added
            else:
                new.data_files = list(new.data_files) + added
            return cat.commit_table(self._table, cur.snapshot_id, new)

        mgr.commit_with_retry(attempt)

    def abort(self, messages):
        for m in messages:
            if m and m.path:
                try:
                    os.remove(m.path)
                except OSError:
                    pass



class _StreamAppendWriter(DataSourceStreamWriter):
    """Streaming append sink: each micro-batch commits one snapshot.

    Executors write the batch's partitions as parquet files (same
    mechanics as the batch writer); the driver's ``commit(batchId)``
    folds them into a new manifest version through the CAS retry loop.
    Idempotence across engine retries comes from the batch-id snapshot
    property: if a batch's commit already landed (query restarted after
    a commit but before the checkpoint advanced), the replayed batch is
    detected via ``streaming.last-batch-id`` and skipped instead of
    double-appending — the same dedup contract Iceberg's Spark sink
    implements with snapshot properties.  ``abort`` unlinks the orphan
    files immediately; crashed jobs age out via remove_orphan_files.
    """

    def __init__(self, options):
        self._inner = _AppendWriter(options, overwrite=False)
        self._wh = options["warehouse"]
        self._table = options["table"]

    def write(self, iterator):
        return self._inner.write(iterator)

    def commit(self, messages, batchId):
        from iceberg_compaction_spark.commit import CommitManager
        from iceberg_compaction_spark.plans import pruning as pr
        from iceberg_compaction_spark.plans.datamodel import FileScanTask
        from iceberg_compaction_spark.sources.catalog import FileCatalog
        from iceberg_compaction_spark.sources.manifest import Manifest

        files = [m for m in messages if m and m.path]
        cat = FileCatalog(warehouse=self._wh)
        mgr = CommitManager()

        def attempt():
            cur = cat.load_table(self._table)
            last = cur.properties.get("streaming.last-batch-id")
            if last is not None and int(last) >= batchId:
                return cur  # replayed batch: already committed
            new_seq = cur.sequence_number + 1
            added = []
            for m in files:
                bounds, nulls = pr.collect_file_stats(m.path)
                added.append(
                    FileScanTask(
                        data_file_path=m.path,
                        length=m.size,
                        file_size_in_bytes=m.size,
                        record_count=m.rows,
                        sequence_number=new_seq,
                        spec_id=cur.default_spec_id,
                        column_bounds=bounds,
                        null_counts=nulls,
                    )
                )
            new = Manifest.from_dict(cur.to_dict())
            new.snapshot_id = cur.snapshot_id + 1
            new.sequence_number = new_seq
            new.data_files = list(new.data_files) + added
            new.properties["streaming.last-batch-id"] = int(batchId)
            return cat.commit_table(self._table, cur.snapshot_id, new)

        mgr.commit_with_retry(attempt)

    def abort(self, messages, batchId):
        self._inner.abort(messages)
