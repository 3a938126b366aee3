"""rewrite_manifests — metadata small-file compaction (VERDICT r11 #2).

The fixture reproduces how real Iceberg writers grow metadata: each
spec-wire append commits ONE new small manifest and carries every prior
manifest forward in the next manifest list, so the head snapshot's list
soon points at O(commits) small Avro files.  The rewrite must merge
them size-targeted, keep the scan row-identical (MOR invariance), hit a
fixed point on the second run, and stay safe under expiration.
"""

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.sources.avro_io import (
    read_avro_file,
    write_avro_file,
)
from iceberg_compaction_spark.sources.iceberg_meta import (
    _DATA_FILE_SCHEMA,
    _MANIFEST_ENTRY_SCHEMA,
    _MANIFEST_FILE_SCHEMA,
    IcebergHadoopCatalog,
)
from iceberg_compaction_spark.sources.ingest import read_table_mor
from iceberg_compaction_spark.sources.manifest import Manifest
from iceberg_compaction_spark.sources.manifest_rewrite import (
    ManifestRewriteStats,
    _copy_live_entries,
    _plan_groups,
    _write_merged,
    rewrite_manifests,
)


def _uri(p):
    return p if "://" in p else f"file://{os.path.abspath(p)}"


def _head_list_entries(cat, name):
    """The head snapshot's manifest-list entries."""
    _, md = cat.current_metadata(name)
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    ml = snap["manifest-list"].replace("file://", "")
    return read_avro_file(ml)[1], snap


def _specwire_append(cat, name, table_dir, ids, vals, seq):
    """One real-Iceberg-style append: write a parquet data file, ONE
    new manifest with its ADDED entry (null seq — v2 inheritance), and
    a manifest list carrying all PRIOR manifests plus the new one."""
    mdir = os.path.join(table_dir, "metadata")
    dpath = os.path.join(table_dir, f"data-{uuid.uuid4().hex}.parquet")
    pq.write_table(
        pa.table(
            {"id": pa.array(ids, type=pa.int64()), "val": list(vals)}
        ),
        dpath,
    )
    entry = {
        "status": 1,  # ADDED
        "snapshot_id": None,
        "sequence_number": None,  # inherited from the list entry (v2)
        "file_sequence_number": None,
        "data_file": {
            "content": 0,
            "file_path": _uri(dpath),
            "file_format": "PARQUET",
            "partition": {},
            "record_count": len(ids),
            "file_size_in_bytes": os.path.getsize(dpath),
            "null_value_counts": None,
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": None,
        },
    }
    head = max(cat.table_history(name))
    mpath = os.path.join(mdir, f"{uuid.uuid4().hex}-m0.avro")
    write_avro_file(
        mpath,
        _MANIFEST_ENTRY_SCHEMA,
        [entry],
        metadata={"format-version": "2", "content": "data"},
    )
    prior, _snap = _head_list_entries(cat, name)
    new_mf = {
        "manifest_path": _uri(mpath),
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": head + 1,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": len(ids),
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    list_path = os.path.join(
        mdir, f"snap-{head + 1}-1-{uuid.uuid4().hex}.avro"
    )
    write_avro_file(
        list_path,
        _MANIFEST_FILE_SCHEMA,
        list(prior) + [new_mf],
        metadata={"format-version": "2"},
    )
    cat.commit_snapshot(
        name,
        expected_snapshot_id=head,
        snapshot={
            "snapshot-id": head + 1,
            "parent-snapshot-id": head,
            "sequence-number": seq,
            "timestamp-ms": 1,
            "manifest-list": _uri(list_path),
            "summary": {"operation": "append"},
        },
    )


@pytest.fixture()
def grown(tmp_path):
    """(catalog, expected row dict): base table + 5 spec-wire appends
    -> head manifest list with 6+ small manifests."""
    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(4), type=pa.int64()),
                "val": [f"v{i}" for i in range(4)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("h", Manifest.from_parquet_dir(root, sequence_number=1))
    tdir = os.path.join(str(tmp_path / "wh"), "h")
    expect = {i: f"v{i}" for i in range(4)}
    for k in range(5):
        ids = [100 + 10 * k, 101 + 10 * k]
        _specwire_append(
            cat, "h", tdir, ids, [f"a{i}" for i in ids], seq=2 + k
        )
        expect.update({i: f"a{i}" for i in ids})
    return cat, expect


def _rows(spark, cat, name="h"):
    return {
        r["id"]: r["val"]
        for r in read_table_mor(spark, cat.load_table(name)).collect()
    }


def test_rewrite_merges_small_manifests_row_identical(spark, grown):
    cat, expect = grown
    before_entries, _ = _head_list_entries(cat, "h")
    assert len(before_entries) == 6  # the accumulation problem
    assert _rows(spark, cat) == expect

    stats = rewrite_manifests(cat, "h")
    assert stats.committed
    assert stats.input_manifests == 6
    assert stats.rewritten_manifests == 6
    assert stats.output_manifests == 1  # all tiny -> one merged manifest
    assert stats.rewritten_entries == 6  # 1 base file + 5 appends

    after_entries, snap = _head_list_entries(cat, "h")
    assert len(after_entries) == 1
    assert snap["summary"]["operation"] == "replace"
    # MOR invariance: identical rows through the merged metadata
    assert _rows(spark, cat) == expect
    # original snapshot attribution survives as EXISTING entries with
    # explicit sequence numbers (v2 inheritance made explicit)
    _, entries = read_avro_file(
        after_entries[0]["manifest_path"].replace("file://", "")
    )
    assert all(e["status"] == 0 for e in entries)  # EXISTING
    assert sorted(e["sequence_number"] for e in entries) == [1, 2, 3, 4, 5, 6]


def test_rewrite_second_run_is_fixed_point(spark, grown):
    cat, expect = grown
    s1 = rewrite_manifests(cat, "h")
    assert s1.committed
    head_after = max(cat.table_history("h"))
    s2 = rewrite_manifests(cat, "h")
    assert not s2.committed  # nothing below target in a 1-manifest list
    assert s2.output_manifests == 0
    assert max(cat.table_history("h")) == head_after  # no empty commit
    assert _rows(spark, cat) == expect


def test_rewrite_size_targeting_converges(spark, grown):
    """A mid-size target splits output into SEVERAL manifests; repeated
    passes must strictly reduce the list until a fixed point — the
    no-progress guard forbids churn (a merge that doesn't shrink a
    group keeps the originals)."""
    cat, expect = grown
    # a ~2-entries-per-manifest target; 2.5x the per-entry estimate so
    # int() truncation in the binning can't flip the chunk size to 1
    # (sizes jitter a few bytes with path lengths)
    entries, _ = _head_list_entries(cat, "h")
    target = int(2.5 * sum(e["manifest_length"] for e in entries) / 6)
    s1 = rewrite_manifests(cat, "h", target_manifest_size_bytes=target)
    assert s1.committed and 1 < s1.output_manifests < 6
    counts = [s1.output_manifests]
    for _ in range(6):
        s = rewrite_manifests(
            cat, "h", target_manifest_size_bytes=target
        )
        if not s.committed:
            break
        # strict progress: the head list must shrink every pass
        n, _snap = _head_list_entries(cat, "h")
        assert len(n) < counts[-1]
        counts.append(len(n))
    else:
        pytest.fail(f"no fixed point after 6 passes: {counts}")
    assert _rows(spark, cat) == expect


def test_rewrite_time_travel_and_expire_safety(spark, grown):
    """Old versions still read their ORIGINAL manifests after the
    rewrite; expiration reference-counts the old Avro away without
    touching the merged metadata."""
    cat, expect = grown
    pre_head = max(cat.table_history("h"))
    rewrite_manifests(cat, "h")
    # time travel to the pre-rewrite snapshot still works
    old = cat.load_table_at("h", pre_head)
    got = {
        r["id"]: r["val"] for r in read_table_mor(spark, old).collect()
    }
    assert got == expect
    expired = cat.expire_snapshots("h", keep_last=1)
    assert pre_head in expired
    # the head (merged) metadata survives and reads identically
    assert _rows(spark, cat) == expect
    refs, complete = cat._avro_refs("h", max(cat.table_history("h")))
    assert complete and all(os.path.exists(p) for p in refs)


def test_rewrite_on_branch_leaves_main_untouched(spark, grown):
    cat, expect = grown
    cat.create_branch("h", "audit")
    main_head = cat.list_refs("h")["main"]["snapshot_id"]
    stats = rewrite_manifests(cat, "h", to_branch="audit")
    assert stats.committed
    refs = cat.list_refs("h")
    assert refs["main"]["snapshot_id"] == main_head  # pinned, unmoved
    assert refs["audit"]["snapshot_id"] != main_head
    assert _rows(spark, cat) == expect  # main scan unchanged
    # the branch head reads identically through merged metadata
    got = {
        r["id"]: r["val"]
        for r in read_table_mor(
            spark, cat.load_table_ref("h", "audit")
        ).collect()
    }
    assert got == expect
    with pytest.raises(KeyError):
        rewrite_manifests(cat, "h", to_branch="nope")


def test_plan_groups_never_mixes_content_or_spec():
    mk = lambda c, s, n: {  # noqa: E731
        "content": c,
        "partition_spec_id": s,
        "manifest_length": n,
        "manifest_path": "x",
    }
    kept, to_merge = _plan_groups(
        [mk(0, 0, 10), mk(0, 0, 20), mk(1, 0, 10), mk(1, 0, 20),
         mk(0, 1, 10), mk(0, 1, 5), mk(0, 0, 10**9)],
        target=1000,
        min_count=2,
    )
    assert set(to_merge) == {(0, 0), (1, 0), (0, 1)}  # three groups
    assert all(len(v) == 2 for v in to_merge.values())
    assert len(kept) == 1  # the at-target manifest is carried verbatim


def test_copy_preserves_foreign_partition_schema(tmp_path):
    """Entries written by ANOTHER engine (non-empty partition record)
    must round-trip byte-faithfully — the rewrite copies at the Avro
    level with the SOURCE writer schema, never through the engine's
    (partition-less) entry schema."""
    import copy

    schema = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    # locate data_file.partition and give it a real field, like an
    # external writer would
    df_schema = copy.deepcopy(_DATA_FILE_SCHEMA)
    for f in df_schema["fields"]:
        if f["name"] == "partition":
            f["type"] = {
                "type": "record",
                "name": "part_r102",
                "fields": [
                    {
                        "name": "region",
                        "type": ["null", "string"],
                        "default": None,
                        "field-id": 1000,
                    }
                ],
            }
    for f in schema["fields"]:
        if f["name"] == "data_file":
            f["type"] = df_schema
    paths = []
    for i in range(2):
        p = str(tmp_path / f"m{i}.avro")
        write_avro_file(
            p,
            schema,
            [
                {
                    "status": 1,
                    "snapshot_id": None,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": 0,
                        "file_path": f"file:///d{i}.parquet",
                        "file_format": "PARQUET",
                        "partition": {"region": f"r{i}"},
                        "record_count": 5,
                        "file_size_in_bytes": 100,
                        "null_value_counts": None,
                        "lower_bounds": None,
                        "upper_bounds": None,
                        "equality_ids": None,
                    },
                }
            ],
            metadata={"format-version": "2", "content": "data"},
        )
        paths.append(p)
    mfs = [
        {
            "manifest_path": _uri(p),
            "manifest_length": os.path.getsize(p),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": i + 1,
            "added_snapshot_id": i + 1,
        }
        for i, p in enumerate(paths)
    ]
    subgroups = _copy_live_entries(mfs)
    assert len(subgroups) == 1  # same writer schema -> one sub-group
    got_schema, entries, src, src_mfs = subgroups[0]
    assert len(entries) == 2 and src > 0 and len(src_mfs) == 2
    # inheritance made explicit, attribution preserved
    assert [e["sequence_number"] for e in entries] == [1, 2]
    assert [e["snapshot_id"] for e in entries] == [1, 2]

    from iceberg_compaction_spark.sources.fileio import fileio_for

    out = _write_merged(
        str(tmp_path), fileio_for(str(tmp_path)), (0, 0), got_schema,
        entries, src, target=10**6, snap_id=99,
    )
    assert len(out) == 1
    _, merged = read_avro_file(
        out[0]["manifest_path"].replace("file://", "")
    )
    assert [e["data_file"]["partition"]["region"] for e in merged] == [
        "r0",
        "r1",
    ]
    assert all(e["status"] == 0 for e in merged)
    assert out[0]["existing_files_count"] == 2
    assert out[0]["added_snapshot_id"] == 99


def test_engine_tier_reports_fixed_point(tmp_path):
    """FileCatalog versions are self-contained JSON manifests — the
    rewrite reports the already-consolidated fixed point, no commit."""
    from iceberg_compaction_spark.sources.catalog import FileCatalog

    root = str(tmp_path / "t")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array([1], type=pa.int64()), "val": ["a"]}),
        os.path.join(root, "a.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    stats = rewrite_manifests(cat, "t")
    assert isinstance(stats, ManifestRewriteStats)
    assert not stats.committed and stats.kept_manifests == 1


def test_conflict_retry_unlinks_orphaned_avro(spark, grown, monkeypatch):
    """A lost CAS must not leak the attempt's freshly-written Avro:
    the retry unlinks it before re-planning from the new head."""
    import glob

    from iceberg_compaction_spark.commit import CommitConflict

    cat, expect = grown
    mdir = cat._mdir("h")
    real = cat.commit_snapshot
    calls = {"n": 0}

    def racy(name, expected_snapshot_id, snapshot, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise CommitConflict("simulated racing writer")
        return real(name, expected_snapshot_id, snapshot, **kw)

    monkeypatch.setattr(cat, "commit_snapshot", racy)
    before = set(glob.glob(os.path.join(mdir, "*.avro")))
    stats = rewrite_manifests(cat, "h")
    assert stats.committed and calls["n"] == 2
    after = set(glob.glob(os.path.join(mdir, "*.avro")))
    # exactly the SECOND attempt's files were added (1 merged manifest
    # + 1 list); the first attempt's were unlinked
    assert len(after - before) == 2
    assert _rows(spark, cat) == expect


def test_maintain_runs_manifest_rewrite_then_expire_cleans(spark, grown):
    """service.maintain wires rewrite_manifests between compaction and
    expiration: one pass consolidates the fragmented head list, then
    expire reference-counts the superseded small Avro away."""
    import glob

    from iceberg_compaction_spark.service import (
        MaintenancePolicy,
        maintain,
    )

    from iceberg_compaction_spark.plans.auto import AutoCompactionConfig

    cat, expect = grown
    before_entries, _ = _head_list_entries(cat, "h")
    assert len(before_entries) == 6
    # disable DATA compaction: an engine rewrite commit would itself
    # consolidate metadata (fresh full-state manifests) and hide the
    # manifest step; this test isolates the metadata-only path
    pol = MaintenancePolicy(
        auto=AutoCompactionConfig(
            small_file_threshold_bytes=1,
            min_delete_file_count_threshold=0,
        ),
        rewrite_manifests_min_count=2,
        keep_snapshots=1,
        orphan_older_than_s=0,
    )
    report = maintain(spark, cat, "h", policy=pol)
    assert report.manifest_rewrite.committed
    after_entries, _ = _head_list_entries(cat, "h")
    assert len(after_entries) < len(before_entries)
    assert _rows(spark, cat) == expect
    # second pass: manifest fixed point
    report2 = maintain(spark, cat, "h", policy=pol)
    assert not report2.manifest_rewrite.committed
    assert _rows(spark, cat) == expect
    # expiration removed the superseded per-commit Avro: only the
    # retained head's references remain on disk
    mdir = cat._mdir("h")
    live = cat._avro_refs("h", max(cat.table_history("h")))[0]
    on_disk = set(glob.glob(os.path.join(mdir, "*.avro")))
    assert on_disk == {os.path.abspath(p) for p in live} or on_disk == live


def test_rewrite_over_rest_client_spec_wire(spark, grown):
    """rewrite_manifests through a RestCatalog client: the merged Avro
    is written to shared storage by the CLIENT and the commit is a
    pointer-only add-snapshot + set-snapshot-ref under an
    assert-ref-snapshot-id requirement — the shape Spark's own
    rewrite_manifests sends a REST catalog."""
    from iceberg_compaction_spark.sources.rest_catalog import (
        RestCatalog,
        serve_rest_catalog,
    )

    cat, expect = grown
    with serve_rest_catalog(cat) as srv:
        client = RestCatalog(uri=srv.uri)
        before, _ = _head_list_entries(cat, "h")
        assert len(before) == 6
        stats = rewrite_manifests(client, "h")
        assert stats.committed and stats.output_manifests == 1
        after, snap = _head_list_entries(cat, "h")
        assert len(after) == 1
        assert snap["summary"]["operation"] == "replace"
        # reads through BOTH surfaces are row-identical
        assert _rows(spark, cat) == expect
        got = {
            r["id"]: r["val"]
            for r in read_table_mor(
                spark, client.load_table("h")
            ).collect()
        }
        assert got == expect
        # second run over the wire: fixed point, no new snapshot
        head = max(cat.table_history("h"))
        s2 = rewrite_manifests(client, "h")
        assert not s2.committed
        assert max(cat.table_history("h")) == head


def test_rewrite_rest_client_engine_tier_fixed_point(tmp_path):
    """Against an engine-manifest server (FileCatalog backing) the
    client has no physical Avro to rewrite: fixed point, no commit."""
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.rest_catalog import (
        RestCatalog,
        serve_rest_catalog,
    )

    root = str(tmp_path / "d")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array([1], type=pa.int64()), "val": ["a"]}),
        os.path.join(root, "a.parquet"),
    )
    backing = FileCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "t", Manifest.from_parquet_dir(root, sequence_number=1)
    )
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        before = backing.table_history("t")
        stats = rewrite_manifests(client, "t")
        assert not stats.committed
        assert backing.table_history("t") == before


def test_rewrite_preserves_foreign_list_schema_fields(tmp_path):
    """An external writer's manifest LIST carries fields the engine's
    schema lacks (the spec's per-field `partitions` summaries drive
    manifest-level pruning).  The rewritten list is written with the
    SOURCE schema when the engine's entries can ride it, so KEPT
    entries round-trip those fields; merged entries carry null there.
    A source schema MISSING an engine-relied field (a v1 list without
    `content`) falls back to the engine schema instead."""
    import copy

    from iceberg_compaction_spark.sources.manifest_rewrite import (
        _list_out_schema,
        _manifest_file_schema,
    )

    ext_schema = copy.deepcopy(_MANIFEST_FILE_SCHEMA)
    ext_schema["fields"].append(
        {
            "name": "partitions_json",
            "type": ["null", "string"],
            "default": None,
            "field-id": 507,
        }
    )
    kept = {
        "manifest_path": "file:///kept.avro",
        "manifest_length": 10000,
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": 5,
        "min_sequence_number": 1,
        "added_snapshot_id": 3,
        "added_files_count": 9,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": 90,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions_json": "summary-kept",
    }
    merged = {k: v for k, v in kept.items() if k != "partitions_json"}
    merged["manifest_path"] = "file:///merged.avro"

    out = _list_out_schema(ext_schema, [merged])
    assert out is ext_schema  # extra field is nullable: source wins
    lp = str(tmp_path / "list.avro")
    write_avro_file(lp, out, [kept, merged],
                    metadata={"format-version": "2"})
    _, back = read_avro_file(lp)
    by_path = {e["manifest_path"]: e for e in back}
    assert by_path["file:///kept.avro"]["partitions_json"] == "summary-kept"
    assert by_path["file:///merged.avro"]["partitions_json"] is None

    # a REQUIRED foreign field the engine can't produce: fall back
    req_schema = copy.deepcopy(ext_schema)
    req_schema["fields"][-1]["type"] = "string"
    assert _list_out_schema(req_schema, [merged]) == _manifest_file_schema()

    # a v1-style list lacking `content`: fall back (a merged DELETE
    # manifest could not be represented)
    v1_schema = copy.deepcopy(_MANIFEST_FILE_SCHEMA)
    v1_schema["fields"] = [
        f for f in v1_schema["fields"] if f["name"] != "content"
    ]
    assert _list_out_schema(v1_schema, [merged]) == _manifest_file_schema()


def test_rewrite_never_merges_across_entry_schemas(spark, grown, tmp_path):
    """Manifests written under DIFFERENT entry schemas (schema
    evolution between commits) never merge into one file — a
    different-schema straggler is kept verbatim while the same-schema
    crowd merges."""
    import copy

    cat, expect = grown
    tdir = os.path.join(os.path.dirname(cat._mdir("h")), "")
    mdir = cat._mdir("h")
    # one more append whose MANIFEST uses an extended entry schema
    ext_entry = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    ext_entry["fields"].append(
        {
            "name": "custom_flag",
            "type": ["null", "long"],
            "default": None,
            "field-id": 9999,
        }
    )
    dpath = os.path.join(os.path.dirname(mdir), "data-ext.parquet")
    pq.write_table(
        pa.table({"id": pa.array([900], type=pa.int64()), "val": ["x"]}),
        dpath,
    )
    mpath = os.path.join(mdir, f"{uuid.uuid4().hex}-ext-m0.avro")
    write_avro_file(
        mpath,
        ext_entry,
        [
            {
                "status": 1,
                "snapshot_id": None,
                "sequence_number": 7,
                "file_sequence_number": 7,
                "custom_flag": 42,
                "data_file": {
                    "content": 0,
                    "file_path": _uri(dpath),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(dpath),
                    "null_value_counts": None,
                    "lower_bounds": None,
                    "upper_bounds": None,
                    "equality_ids": None,
                },
            }
        ],
        metadata={"format-version": "2", "content": "data"},
    )
    prior, _ = _head_list_entries(cat, "h")
    new_mf = {
        "manifest_path": _uri(mpath),
        "manifest_length": os.path.getsize(mpath),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": 7,
        "min_sequence_number": 7,
        "added_snapshot_id": 7,
        "added_files_count": 1,
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": 1,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    list_path = os.path.join(mdir, f"snap-7-1-{uuid.uuid4().hex}.avro")
    write_avro_file(
        list_path,
        _MANIFEST_FILE_SCHEMA,
        list(prior) + [new_mf],
        metadata={"format-version": "2"},
    )
    head = max(cat.table_history("h"))
    cat.commit_snapshot(
        "h",
        expected_snapshot_id=head,
        snapshot={
            "snapshot-id": head + 1,
            "parent-snapshot-id": head,
            "sequence-number": 7,
            "timestamp-ms": 1,
            "manifest-list": _uri(list_path),
            "summary": {"operation": "append"},
        },
    )
    expect = dict(expect)
    expect[900] = "x"
    stats = rewrite_manifests(cat, "h")
    assert stats.committed
    # the 6 same-schema manifests merged; the extended-schema one was
    # its own sub-group of 1 -> no-progress guard kept it verbatim
    assert stats.output_manifests == 1
    assert stats.kept_manifests == 1
    after, _snap = _head_list_entries(cat, "h")
    assert len(after) == 2
    # the kept straggler's entry still carries its custom field
    kept_mf = next(
        e for e in after if e["manifest_path"] == _uri(mpath)
    )
    _, es = read_avro_file(kept_mf["manifest_path"].replace("file://", ""))
    assert es[0]["custom_flag"] == 42
    assert _rows(spark, cat) == expect


def test_remove_orphan_metadata_sweeps_crash_leftovers(spark, grown):
    """remove_orphan_metadata (round 12): Avro no retained version
    references — crash leftovers a clean CAS loser would have unlinked
    itself — is swept under the grace window; live refs survive; an
    unreadable retained manifest list fails the whole sweep closed."""
    import time

    cat, expect = grown
    mdir = cat._mdir("h")
    # plant "crashed rewrite" leftovers: one old, one fresh
    old_p = os.path.join(mdir, "deadbeef-rw-m0.avro")
    new_p = os.path.join(mdir, "cafebabe-rw-m0.avro")
    for p in (old_p, new_p):
        with open(p, "wb") as f:
            f.write(b"Obj\x01junk")
    os.utime(old_p, (1, 1))  # ancient

    got = cat.remove_orphan_metadata("h", dry_run=True)
    assert got == [old_p]
    assert os.path.exists(old_p)  # dry run touched nothing

    got = cat.remove_orphan_metadata("h")
    assert got == [old_p]
    assert not os.path.exists(old_p)
    assert os.path.exists(new_p)  # grace window protected
    # every live reference survived; the table still reads
    live, complete = cat._avro_refs("h", max(cat.table_history("h")))
    assert complete and all(os.path.exists(p) for p in live)
    assert _rows(spark, cat) == expect

    # fail closed: corrupt a RETAINED version's manifest list
    os.utime(new_p, (1, 1))  # now old enough to be eligible
    _, snap = _head_list_entries(cat, "h")
    ml = snap["manifest-list"].replace("file://", "")
    backup = open(ml, "rb").read()
    with open(ml, "wb") as f:
        f.write(b"not avro")
    assert cat.remove_orphan_metadata("h") == []
    assert os.path.exists(new_p)  # nothing removed
    with open(ml, "wb") as f:
        f.write(backup)


def test_maintain_sweeps_metadata_orphans(spark, grown):
    """service.maintain's orphan step covers the metadata tier too."""
    from iceberg_compaction_spark.plans.auto import AutoCompactionConfig
    from iceberg_compaction_spark.service import (
        MaintenancePolicy,
        maintain,
    )

    cat, expect = grown
    mdir = cat._mdir("h")
    stray = os.path.join(mdir, "deadc0de-rw-m0.avro")
    with open(stray, "wb") as f:
        f.write(b"Obj\x01junk")
    os.utime(stray, (1, 1))
    pol = MaintenancePolicy(
        auto=AutoCompactionConfig(
            small_file_threshold_bytes=1,
            min_delete_file_count_threshold=0,
        ),
        rewrite_manifests_min_count=2,
        keep_snapshots=1,
        orphan_older_than_s=0,
    )
    report = maintain(spark, cat, "h", policy=pol)
    assert stray in report.orphans_removed
    assert not os.path.exists(stray)
    assert _rows(spark, cat) == expect


def test_rewrite_over_rest_client_on_branch(spark, grown):
    """Branch-targeted REST rewrite: the spec-wire commit rides
    assert-ref-snapshot-id on the BRANCH; main stays pinned and
    untouched while the audit branch's metadata consolidates."""
    from iceberg_compaction_spark.sources.rest_catalog import (
        RestCatalog,
        serve_rest_catalog,
    )

    cat, expect = grown
    cat.create_branch("h", "audit")
    main_head = cat.list_refs("h")["main"]["snapshot_id"]
    with serve_rest_catalog(cat) as srv:
        client = RestCatalog(uri=srv.uri)
        stats = rewrite_manifests(client, "h", to_branch="audit")
        assert stats.committed and stats.output_manifests == 1
        refs = cat.list_refs("h")
        assert refs["main"]["snapshot_id"] == main_head  # untouched
        assert refs["audit"]["snapshot_id"] != main_head
        # both the pinned main and the branch read row-identically
        assert _rows(spark, cat) == expect
        got = {
            r["id"]: r["val"]
            for r in read_table_mor(
                spark, cat.load_table_ref("h", "audit")
            ).collect()
        }
        assert got == expect
