"""CLI entry point (__main__.py): the cron-able operational surface.
In-process (session fixture injected) — each command returns the JSON
dict it prints."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.__main__ import main, COMMANDS, build_parser
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def wh(tmp_path, spark):
    root = str(tmp_path / "t")
    os.makedirs(root)
    for i in range(4):
        ids = list(range(i * 10, i * 10 + 10))
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{j}" for j in ids],
                }
            ),
            os.path.join(root, f"f{i}.parquet"),
        )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root))
    return cat.warehouse


def _run(spark, argv):
    args = build_parser().parse_args(argv)
    return COMMANDS[args.command](args, spark=spark)


def test_cli_show_and_history(spark, wh):
    out = _run(spark, ["show", "--warehouse", wh, "--table", "t"])
    assert out["snapshot_id"] == 1
    assert out["data_files"] == 4
    assert out["total_records"] == 40
    hist = _run(spark, ["history", "--warehouse", wh, "--table", "t"])
    assert hist["snapshots"] == [1]


def test_cli_compact_then_maintain_idempotent(spark, wh):
    out = _run(
        spark,
        ["compact", "--warehouse", wh, "--table", "t"],
    )
    assert out["snapshot_after"] == out["snapshot_before"] + 1
    cat = FileCatalog(warehouse=wh)
    m = cat.load_table("t")
    assert len(m.data_files) < 4  # files merged
    assert sum(t.record_count for t in m.data_files) == 40
    assert m.operation == "replace"

    rep = _run(
        spark,
        [
            "maintain",
            "--warehouse",
            wh,
            "--table",
            "t",
            "--keep-snapshots",
            "1",
            "--orphan-grace-s",
            "0",
        ],
    )
    # compaction already at fixed point: maintenance only expires
    assert rep["compaction_groups"] == 0
    assert rep["expired_snapshots"] == [1]
    # second pass is a no-op
    rep2 = _run(
        spark,
        [
            "maintain",
            "--warehouse",
            wh,
            "--table",
            "t",
            "--keep-snapshots",
            "1",
            "--orphan-grace-s",
            "0",
        ],
    )
    assert rep2["expired_snapshots"] == []
    assert rep2["compaction_groups"] == 0


def test_cli_main_prints_json(spark, wh, capsys):
    import json

    assert main(["show", "--warehouse", wh, "--table", "t"], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["data_files"] == 4


def test_cli_delete_where(spark, wh):
    out = _run(
        spark,
        ["delete", "--warehouse", wh, "--table", "t",
         "--where", "id % 10 = 0"],
    )
    assert out["committed"] and out["snapshot_after"] == out["snapshot_before"] + 1
    assert len(out["delete_files_written"]) == 1
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    m = FileCatalog(warehouse=wh).load_table("t")
    ids = [r["id"] for r in read_table_mor(spark, m).collect()]
    assert all(i % 10 != 0 for i in ids) and len(ids) == 36

    again = _run(
        spark,
        ["delete", "--warehouse", wh, "--table", "t",
         "--where", "id % 10 = 0"],
    )
    assert not again["committed"]  # already-merged rows can't match twice


def test_cli_update_where(spark, wh):
    out = _run(
        spark,
        ["update", "--warehouse", wh, "--table", "t",
         "--where", "id % 10 = 1", "--set", "val=upper(val)"],
    )
    assert out["committed"]
    assert out["snapshot_after"] == out["snapshot_before"] + 1
    assert out["rows_updated"] > 0
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    m = FileCatalog(warehouse=wh).load_table("t")
    rows = {r["id"]: r["val"] for r in read_table_mor(spark, m).collect()}
    assert rows[1] == rows[1].upper()
    assert rows[2] == rows[2] and rows[2].islower()

    none = _run(
        spark,
        ["update", "--warehouse", wh, "--table", "t",
         "--where", "id > 100000", "--set", "val='x'"],
    )
    assert not none["committed"] and none["rows_updated"] == 0


def test_cli_rollback(spark, wh):
    out = _run(
        spark,
        ["delete", "--warehouse", wh, "--table", "t",
         "--where", "id < 20"],
    )
    assert out["committed"]
    rb = _run(
        spark,
        ["rollback", "--warehouse", wh, "--table", "t", "--snapshot", "1"],
    )
    assert rb["committed"] and rb["snapshot_after"] == 3
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    m = FileCatalog(warehouse=wh).load_table("t")
    assert len(read_table_mor(spark, m).collect()) == 40


def test_cli_wap_branch_lifecycle(spark, tmp_path):
    """Round 10: the operational WAP loop end-to-end through the CLI —
    branch create, compact --to-branch (main untouched), publish via
    branch --fast-forward, audit with branch (list)."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.__main__ import main
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "data")
    os.makedirs(root)
    for f in range(4):
        pq.write_table(
            pa.table({"id": pa.array(range(f * 5, f * 5 + 5), type=pa.int64())}),
            os.path.join(root, f"p{f}.parquet"),
        )
    wh = str(tmp_path / "wh")
    cat = FileCatalog(warehouse=wh)
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))

    def run(argv):
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            assert main(argv, spark=spark) == 0
        return _json.loads(buf.getvalue())

    base = ["--warehouse", wh, "--table", "t"]
    out = run(["branch", *base, "--create", "audit"])
    assert out["created"] == "audit"

    out = run(["compact", *base, "--to-branch", "audit"])
    assert out["snapshot_after"] > out["snapshot_before"]
    assert cat.load_table("t").snapshot_id == 1  # main untouched
    staged = out["snapshot_after"]

    out = run(["branch", *base])
    assert out["refs"]["audit"]["snapshot_id"] == staged
    assert out["refs"]["main"]["snapshot_id"] == 1

    out = run(
        ["branch", *base, "--fast-forward", "main", "--snapshot", str(staged)]
    )
    assert out["ref"]["snapshot_id"] == staged
    assert cat.load_table("t").snapshot_id == staged

    out = run(["delete", *base, "--where", "id < 3", "--to-branch", "audit"])
    assert out["committed"] and cat.load_table("t").snapshot_id == staged


def test_cli_metadata_addfiles_orphans(spark, wh, tmp_path):
    """Round-11 commands: metadata relations from a shell, metadata-only
    imports, and dry-run-by-default orphan cleanup."""
    base = ["--warehouse", wh, "--table", "t"]

    out = _run(spark, ["metadata", *base, "--kind", "files"])
    assert out["columns"][0] == "content" and len(out["rows"]) == 4

    out = _run(spark, ["metadata", *base, "--kind", "entries"])
    assert {r[0] for r in out["rows"]} == {1}  # all ADDED at snapshot 1

    # add-files: metadata-only import
    extra = str(tmp_path / "extra")
    os.makedirs(extra)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([500], type=pa.int64()),
                "val": ["x500"],
            }
        ),
        os.path.join(extra, "imp.parquet"),
    )
    out = _run(spark, ["add-files", *base, "--src-dir", extra])
    assert out["snapshot_id"] == 2

    out = _run(spark, ["metadata", *base, "--kind", "all_manifests"])
    assert {r[0] for r in out["rows"]} == {1, 2}

    # orphan cleanup: dry-run reports, --apply removes
    orphan = os.path.join(os.path.dirname(wh), "t", "stray.parquet")
    pq.write_table(pa.table({"id": pa.array([1], type=pa.int64())}), orphan)
    os.utime(orphan, (1, 1))  # far older than any grace window
    out = _run(spark, ["orphans", *base])
    assert out["dry_run"] and out["would_remove"] == [orphan]
    assert os.path.exists(orphan)  # dry run touched nothing
    out = _run(spark, ["orphans", *base, "--apply"])
    assert out["removed"] == [orphan] and not os.path.exists(orphan)

    # branch create with per-ref retention via the CLI
    out = _run(
        spark,
        [
            "branch", *base, "--create", "audit",
            "--retention", "max-ref-age-ms=1000",
        ],
    )
    assert out["ref"]["max_ref_age_ms"] == 1000


def test_cli_rewrite_manifests_and_analyze(spark, wh, tmp_path):
    """Round-12 commands: metadata compaction + ANALYZE from a shell."""
    base = ["--warehouse", wh, "--table", "t"]

    # engine-tier table: rewrite reports the consolidated fixed point
    out = _run(spark, ["rewrite-manifests", *base])
    assert out["committed"] is False and out["kept_manifests"] == 1

    # analyze commits per-column stats properties
    out = _run(spark, ["analyze", *base, "--exact"])
    assert out["stats"]["stats.n-rows"] == "40"
    assert out["stats"]["stats.id.ndv"] == "40"
    assert out["stats"]["stats.snapshot-id"] == "1"
    assert out["snapshot_id"] == 2

    # metadata_log_entries rides the metadata command too
    out = _run(
        spark, ["metadata", *base, "--kind", "metadata_log_entries"]
    )
    assert [r[2] for r in out["rows"]] == [1, 2]


def test_cli_compute_stats(spark, wh):
    """compute-stats writes + registers the theta StatisticsFile."""
    base = ["--warehouse", wh, "--table", "t"]
    out = _run(spark, ["compute-stats", *base, "--columns", "id", "val"])
    assert out["ndv"] == {"id": 40, "val": 40}
    [path] = out["statistics_files"]
    assert os.path.exists(path) and path.endswith(".stats.puffin")
    # the registration is on the committed head
    cat = FileCatalog(warehouse=wh)
    head = cat.load_table("t")
    assert head.statistics_files[0]["statistics-path"] == path


def test_cli_snapshot_and_register(spark, wh, tmp_path):
    base = ["--warehouse", wh, "--table", "t"]
    out = _run(spark, ["snapshot-table", *base, "--dest", "t2"])
    assert out["dest"] == "t2" and out["gc_enabled"] == "false"
    assert out["files"] == 4
    meta = os.path.join(wh, "t", "metadata", "v1.metadata.json")
    out = _run(
        spark,
        [
            "register-table",
            "--warehouse", str(tmp_path / "wh2"),
            "--table", "t3",
            "--metadata-file", meta,
        ],
    )
    assert out["rows"] == 40 and out["files"] == 4


def test_cli_migrate_table(spark, tmp_path):
    root = str(tmp_path / "legacy")
    os.makedirs(root)
    for i in range(3):
        pq.write_table(
            pa.table({"id": pa.array(range(i * 5, i * 5 + 5))}),
            os.path.join(root, f"p{i}.parquet"),
        )
    out = _run(
        spark,
        [
            "migrate-table",
            "--warehouse", str(tmp_path / "wh"),
            "--table", "legacy",
            "--parquet-dir", root,
        ],
    )
    assert out["files"] == 3 and out["rows"] == 15


def test_cli_maintain_refresh_stats(spark, wh):
    out = _run(
        spark,
        [
            "maintain", "--warehouse", wh, "--table", "t",
            "--refresh-stats", "--refresh-partition-stats",
        ],
    )
    assert out["column_ndv"] == {"id": 40, "val": 40}
    assert out["partition_stats_partitions"] == 1
    cat = FileCatalog(warehouse=wh)
    head = cat.load_table("t")
    assert head.statistics_files and head.partition_statistics_files
