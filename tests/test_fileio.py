"""FileIO seam (sources/fileio.py): the URI-indirection the reference
threads everywhere (iceberg_file_task_scan.rs:473-580 takes FileIO, not
paths).  The catalog lifecycle is parameterized over the local POSIX
backend and the in-memory object store — the sandbox stand-in for the
reference's MinIO integration tier (docker_compose.rs:28-120)."""

import threading

import pytest

from iceberg_compaction_spark.sources.catalog import (
    FileCatalog,
    TableAlreadyExists,
    TableNotFound,
)
from iceberg_compaction_spark.sources.fileio import (
    LocalFileIO,
    MemoryFileIO,
    UnsupportedScheme,
    fileio_for,
    scheme_of,
)
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture(params=["local", "mem"])
def backend(request, tmp_path):
    """(fileio, warehouse_uri) for each backend."""
    if request.param == "local":
        yield LocalFileIO(), str(tmp_path / "wh")
    else:
        MemoryFileIO.clear()
        yield MemoryFileIO(), "mem://wh"
        MemoryFileIO.clear()


def test_scheme_resolution():
    assert scheme_of("/plain/path") == ""
    assert scheme_of("file:///x/y") == "file"
    assert scheme_of("mem://bucket/key") == "mem"
    assert scheme_of("s3://bucket/key") == "s3"
    assert isinstance(fileio_for("/x"), LocalFileIO)
    assert isinstance(fileio_for("file:///x"), LocalFileIO)
    assert isinstance(fileio_for("mem://x"), MemoryFileIO)
    with pytest.raises(UnsupportedScheme):
        fileio_for("weird://x")


def test_fileio_primitives(backend):
    io, wh = backend
    io.makedirs(io.join(wh, "d"))
    p = io.join(wh, "d", "a.bin")
    io.write_bytes(p, b"hello")
    assert io.exists(p)
    assert io.size(p) == 5
    assert io.read_bytes(p) == b"hello"
    with io.open_input(p) as f:
        f.seek(2)
        assert f.read() == b"llo"
    # exclusive create: first wins, second refuses
    q = io.join(wh, "d", "v1.json")
    assert io.create_exclusive(q, b"one") is True
    assert io.create_exclusive(q, b"two") is False
    assert io.read_bytes(q) == b"one"
    # atomic overwrite
    io.write_atomic(q, b"three")
    assert io.read_bytes(q) == b"three"
    # listing + walking
    assert "a.bin" in io.listdir(io.join(wh, "d"))
    walked = {w.rsplit("/", 1)[-1] for w in io.walk_files(wh)}
    assert {"a.bin", "v1.json"} <= walked
    io.remove(p)
    assert not io.exists(p)


def test_memory_create_exclusive_is_atomic_under_contention():
    MemoryFileIO.clear()
    io = MemoryFileIO()
    wins = []

    def race(i):
        if io.create_exclusive("mem://wh/v2.json", f"w{i}".encode()):
            wins.append(i)

    ts = [threading.Thread(target=race, args=(i,)) for i in range(16)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert len(wins) == 1
    MemoryFileIO.clear()


def _manifest(root):
    return Manifest(table_root=root, snapshot_id=0, sequence_number=1)


def test_catalog_lifecycle_over_both_backends(backend):
    """create -> commit -> load -> history -> time travel -> expire ->
    refs -> CAS conflict, identical over POSIX and the object store."""
    from iceberg_compaction_spark.commit import CommitConflict

    io, wh = backend
    cat = FileCatalog(warehouse=wh)
    root = io.join(wh, "t", "data")
    m = cat.create_table("t", _manifest(root))
    assert m.snapshot_id == 1
    assert cat.list_tables() == ["t"]
    with pytest.raises(TableAlreadyExists):
        cat.create_table("t", _manifest(root))

    # three commits
    for i in (2, 3, 4):
        cur = cat.load_table("t")
        new = Manifest.from_dict(cur.to_dict())
        new.snapshot_id = cur.snapshot_id + 1
        new.properties["i"] = i
        cat.commit_table("t", cur.snapshot_id, new)
    assert cat.table_history("t") == [1, 2, 3, 4]
    assert cat.load_table("t").properties["i"] == 4
    assert cat.load_table_at("t", 3).properties["i"] == 3

    # stale CAS loses
    stale = Manifest.from_dict(cat.load_table("t").to_dict())
    stale.snapshot_id = 3
    with pytest.raises(CommitConflict):
        cat.commit_table("t", 2, stale)

    # tags pin snapshots through expiration
    cat.create_tag("t", "audit", snapshot_id=2)
    expired = cat.expire_snapshots("t", keep_last=1)
    assert expired == [1, 3]
    assert cat.table_history("t") == [2, 4]
    assert cat.load_table_ref("t", "audit").properties["i"] == 2
    with pytest.raises(TableNotFound):
        cat.load_table_at("t", 1)


def test_catalog_orphan_removal_over_mem():
    """remove_orphan_files walks the object store, not os.walk."""
    MemoryFileIO.clear()
    io = MemoryFileIO()
    cat = FileCatalog(warehouse="mem://wh")
    root = "mem://wh/t/data"
    io.write_bytes(io.join(root, "live.parquet"), b"x")
    m = _manifest(root)
    from iceberg_compaction_spark.plans.datamodel import FileScanTask

    m.data_files = [
        FileScanTask(
            data_file_path=io.join(root, "live.parquet"), length=1
        )
    ]
    cat.create_table("t", m)
    io.write_bytes(io.join(root, "orphan.parquet"), b"y")
    removed = cat.remove_orphan_files("t", older_than_s=0)
    assert removed == [io.join(root, "orphan.parquet")]
    assert io.exists(io.join(root, "live.parquet"))
    MemoryFileIO.clear()
