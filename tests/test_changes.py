"""Incremental / CDC reads (sources/changes.py): file diff, row-level
changelog, append fast path, and the history walk."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import CompactionConfig
from iceberg_compaction_spark.sources import changes as ch
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.ingest import upsert
from iceberg_compaction_spark.sources.manifest import Manifest


def _write(root, name, ids):
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "val": [f"v{i}" for i in ids],
            }
        ),
        os.path.join(root, name),
    )


@pytest.fixture()
def cat(tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    _write(root, "base.parquet", range(10))
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    return cat


def _changes_dict(df):
    return {
        (r["id"], r[ch.CHANGE_TYPE]): r["val"] for r in df.collect()
    }


def test_diff_files_and_noop(cat):
    m = cat.load_table("t")
    d = ch.diff_files(m, m)
    assert d.is_noop and d.is_append_only
    empty = d
    assert not empty.added_data_files


def test_append_only_changelog_reads_only_added_files(spark, cat):
    m1 = cat.load_table("t")
    root = m1.table_root
    _write(root, "extra.parquet", range(100, 105))
    m2 = Manifest.from_parquet_dir(root, sequence_number=2)
    m2.snapshot_id = m1.snapshot_id + 1

    d = ch.diff_files(m1, m2)
    assert d.is_append_only and d.added_data_files == [
        os.path.join(root, "extra.parquet")
    ]

    out = ch.table_changes(spark, m1, m2)
    got = _changes_dict(out)
    assert got == {(i, "insert"): f"v{i}" for i in range(100, 105)}
    # fast path: the plan must scan ONLY the added file — no Except, and
    # no reference to the carried-over base file
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Except" not in plan
    scanned = [ln for ln in plan.splitlines() if "base.parquet" in ln]
    assert not scanned


def test_compaction_rewrite_produces_empty_changelog(spark, cat):
    m1 = cat.load_table("t")
    root = m1.table_root
    _write(root, "extra.parquet", range(100, 105))
    m2 = Manifest.from_parquet_dir(root, sequence_number=2)
    c = Compaction(spark=spark, config=CompactionConfig.full())
    m3, _ = c.compact(m2)
    # layout changed entirely -> general path; live rows identical
    d = ch.diff_files(m2, m3)
    assert not d.is_append_only
    out = ch.table_changes(spark, m2, m3)
    assert out.count() == 0


def test_upsert_changelog_shows_delete_insert_pairs(spark, cat):
    m1 = cat.load_table("t")
    delta = spark.createDataFrame([(3, "v3-new"), (42, "v42")], ["id", "val"])
    m2 = upsert(spark, cat, "t", delta, keys=["id"])

    d = ch.diff_files(m1, m2)
    # the equality delete attaches to the carried-over base file
    assert d.changed_delete_files and not d.is_append_only

    got = _changes_dict(ch.table_changes(spark, m1, m2))
    assert got == {
        (3, "delete"): "v3",
        (3, "insert"): "v3-new",
        (42, "insert"): "v42",
    }


def test_changelog_between_walks_history(spark, cat):
    delta1 = spark.createDataFrame([(42, "v42")], ["id", "val"])
    m2 = upsert(spark, cat, "t", delta1, keys=["id"])
    delta2 = spark.createDataFrame([(42, "v42-b")], ["id", "val"])
    m3 = upsert(spark, cat, "t", delta2, keys=["id"])

    out = ch.changelog_between(
        spark, cat, "t", cat.table_history("t")[0], m3.snapshot_id
    )
    rows = {
        (r["id"], r[ch.CHANGE_TYPE], r["_commit_snapshot_id"])
        for r in out.collect()
    }
    assert (42, "insert", m2.snapshot_id) in rows
    assert (42, "delete", m3.snapshot_id) in rows
    assert (42, "insert", m3.snapshot_id) in rows
    # untouched base rows never appear
    assert not [r for r in rows if r[0] == 1]


def test_changelog_between_skips_unpublished_branch_snapshots(spark, cat):
    """WAP interleave: main v1, audit-branch upsert allocates v2, main
    upsert allocates v3.  A main-range changelog (1, 3) must contain NO
    step from the unpublished branch snapshot — version order is not
    lineage order on a WAP table."""
    v1 = cat.table_history("t")[0]
    cat.create_branch("t", "audit")
    m_branch = upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(7, "LEAKED")], ["id", "val"]),
        keys=["id"],
        to_branch="audit",
    )
    m_main = upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(3, "v3-main")], ["id", "val"]),
        keys=["id"],
    )
    assert m_branch.snapshot_id < m_main.snapshot_id  # interleaved

    out = ch.changelog_between(spark, cat, "t", v1, m_main.snapshot_id)
    rows = [
        (r["id"], r[ch.CHANGE_TYPE], r["val"], r["_commit_snapshot_id"])
        for r in out.collect()
    ]
    commit_ids = {r[3] for r in rows}
    assert m_branch.snapshot_id not in commit_ids
    assert commit_ids == {m_main.snapshot_id}
    # no phantom delete/insert of the branch's row, no reversal step
    assert sorted(rows) == [
        (3, "delete", "v3", m_main.snapshot_id),
        (3, "insert", "v3-main", m_main.snapshot_id),
    ]


def test_changelog_rejects_non_ancestor_endpoints(spark, cat):
    """A changelog between snapshots on different branches is
    meaningless and must raise, not emit phantom steps."""
    cat.create_branch("t", "audit")
    m_branch = upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(7, "b")], ["id", "val"]),
        keys=["id"],
        to_branch="audit",
    )
    m_main = upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(3, "m")], ["id", "val"]),
        keys=["id"],
    )
    with pytest.raises(ValueError, match="not an ancestor"):
        ch.changelog_between(
            spark, cat, "t", m_branch.snapshot_id, m_main.snapshot_id
        )
    with pytest.raises(ValueError, match="after"):
        ch.changelog_between(
            spark, cat, "t", m_main.snapshot_id, m_branch.snapshot_id
        )


def test_changelog_for_ref_shows_staged_branch_commits(spark, cat):
    """The audit-consumer view: a branch changelog from the fork point
    contains exactly the staged commits, never main's concurrent
    ones."""
    fork = cat.table_history("t")[0]
    cat.create_branch("t", "audit")
    m_branch = upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(7, "v7-staged")], ["id", "val"]),
        keys=["id"],
        to_branch="audit",
    )
    upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(3, "v3-main")], ["id", "val"]),
        keys=["id"],
    )
    out = ch.changelog_for_ref(spark, cat, "t", "audit", from_snapshot=fork)
    rows = sorted(
        (r["id"], r[ch.CHANGE_TYPE], r["val"], r["_commit_snapshot_id"])
        for r in out.collect()
    )
    assert rows == [
        (7, "delete", "v7", m_branch.snapshot_id),
        (7, "insert", "v7-staged", m_branch.snapshot_id),
    ]
    # default from_snapshot walks the full retained lineage
    full = ch.changelog_for_ref(spark, cat, "t", "audit")
    ids = {r["_commit_snapshot_id"] for r in full.collect()}
    assert ids == {m_branch.snapshot_id}
    with pytest.raises(KeyError):
        ch.changelog_for_ref(spark, cat, "t", "nope")


def test_schema_evolution_aligns_on_new_columns(spark, cat):
    m1 = cat.load_table("t")
    root = m1.table_root
    pq.write_table(
        pa.table(
            {
                "id": pa.array([200], type=pa.int64()),
                "val": ["v200"],
                "extra_col": ["e200"],
            }
        ),
        os.path.join(root, "evolved.parquet"),
    )
    m2 = Manifest.from_parquet_dir(root, sequence_number=2)
    # general path (force it): remove nothing but touch deletes via a
    # fake removed file to exercise alignment
    m2.data_files = [
        t for t in m2.data_files if "base" not in t.data_file_path
    ]
    out = ch.table_changes(spark, m1, m2)
    got = {(r["id"], r[ch.CHANGE_TYPE]) for r in out.collect()}
    assert (200, "insert") in got
    assert all(t == "delete" for (i, t) in got if i < 10)
    assert "extra_col" in out.columns


def test_general_path_skips_carried_unchanged_files(spark, cat):
    """Dropping one file must not scan the other carried files: their
    rows are identical on both sides and cancel exactly."""
    m1 = cat.load_table("t")
    root = m1.table_root
    _write(root, "drop_me.parquet", range(300, 303))
    m2 = Manifest.from_parquet_dir(root, sequence_number=2)
    m3 = Manifest.from_parquet_dir(root, sequence_number=2)
    m3.data_files = [
        t for t in m3.data_files if "drop_me" not in t.data_file_path
    ]
    out = ch.table_changes(spark, m2, m3)
    got = _changes_dict(out)
    assert got == {(i, "delete"): f"v{i}" for i in range(300, 303)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert not [ln for ln in plan.splitlines() if "base.parquet" in ln]


def test_pair_update_images_tags_within_commit_only(spark):
    """pair_update_images (round 11): a delete+insert pair sharing a
    key WITHIN one commit becomes update_before/update_after; the same
    key deleted in commit N and re-inserted in commit M stays two
    independent events (per-commit pairing), and unpaired rows keep
    their original tags."""
    rows = [
        # commit 10: key 1 updated (pair), key 2 purely deleted,
        # key 3 purely inserted
        (1, "old", "delete", 10),
        (1, "new", "insert", 10),
        (2, "gone", "delete", 10),
        (3, "born", "insert", 10),
        # key 4: deleted in commit 10, re-inserted in commit 11 —
        # NOT an update
        (4, "v1", "delete", 10),
        (4, "v2", "insert", 11),
    ]
    df = spark.createDataFrame(
        rows, ["id", "val", ch.CHANGE_TYPE, "_commit_snapshot_id"]
    )
    out = {
        (r["id"], r["_commit_snapshot_id"]): r[ch.CHANGE_TYPE]
        for r in ch.pair_update_images(df, keys=["id"]).collect()
    }
    assert out[(1, 10)] in ("update_before", "update_after")
    got1 = {
        r[ch.CHANGE_TYPE]
        for r in ch.pair_update_images(df, keys=["id"]).collect()
        if r["id"] == 1
    }
    assert got1 == {"update_before", "update_after"}
    assert out[(2, 10)] == "delete"
    assert out[(3, 10)] == "insert"
    assert out[(4, 10)] == "delete" and out[(4, 11)] == "insert"

    # without the commit column, pairing is frame-wide
    nf = df.drop("_commit_snapshot_id")
    out2 = {
        (r["id"], r["val"]): r[ch.CHANGE_TYPE]
        for r in ch.pair_update_images(nf, keys=["id"]).collect()
    }
    assert out2[(4, "v1")] == "update_before"
    assert out2[(4, "v2")] == "update_after"


def test_changelog_for_ref_tolerates_expired_tail(spark, cat):
    """Round-11 review: changelog_for_ref(from_snapshot=None) must walk
    from the oldest RETAINED ancestor after routine expiration, not
    raise on the expired tail."""
    for i in range(4):
        upsert(
            spark, cat, "t",
            spark.createDataFrame([(900 + i, f"m{i}")], ["id", "val"]),
            keys=["id"],
        )
    expired = cat.expire_snapshots("t", keep_last=3)
    assert expired  # the tail really went away
    out = ch.changelog_for_ref(spark, cat, "t", "main")
    commits = {
        r["_commit_snapshot_id"] for r in out.collect()
    }
    retained = cat.table_history("t")
    assert commits == set(retained[1:])  # steps between retained snaps


def test_single_scan_pre_filter_equivalence_and_plan(spark):
    """r16: row_changes_single_scan skips emitting the ±1 variant pair
    for provably-carried rows (kept AND every override null-safe-equals
    the original).  Must stay multiset-identical to the generic
    row_changes formulation on the tricky shapes the filter reasons
    about — NULL override values, NULL new_keep, duplicate rows — and
    the plan must show the carried-row filter BELOW the explode so the
    exchange only sees changeable rows."""
    rows = [
        (1, 10.0),   # untouched (carried) -> must not appear
        (2, None),   # override NULL == original NULL -> carried
        (2, None),   # duplicate of the carried row
        (3, 5.0),    # touched: quantity bumped -> delete+insert
        (4, 7.0),    # dropped (new_keep false) -> delete
        (5, None),   # touched with NULL -> NULL+1 stays NULL -> carried
        (6, 6.0),
        (6, 6.0),    # duplicate touched rows -> 2 deletes + 2 inserts
    ]
    base = spark.createDataFrame(rows, "id long, qty double")
    touched = F.col("id").isin(3, 5, 6)
    new_keep = ~F.col("id").eqNullSafe(4)
    overrides = {
        "qty": F.when(touched, F.col("qty") + 1).otherwise(F.col("qty"))
    }
    got = ch.row_changes_single_scan(base, new_keep, overrides)
    ref = ch.row_changes(
        base,
        base.where(new_keep).withColumns(overrides),
    )
    key = lambda r: (r["id"], r["qty"], r[ch.CHANGE_TYPE])
    assert sorted(map(key, got.collect())) == sorted(
        map(key, ref.collect())
    )
    # note id=5: qty NULL + 1 is NULL <=> NULL -> carried, not a change
    ids = {r["id"] for r in got.collect()}
    assert ids == {3, 4, 6}
    # plan: the null-safe carried-row filter sits below the Generate
    plan = got._jdf.queryExecution().executedPlan().toString()
    gen_pos = plan.index("Generate explode")
    assert "<=>" in plan[gen_pos:], "carried filter missing"
