"""Branch-targeted commits (to_branch) + write-audit-publish lifecycle.

The reference plans and commits against a named branch
(``core/src/compaction/mod.rs:97,1307-1336``; consistency check
``:55-76``).  Here: compaction and every DML statement accept
``to_branch``; a branch commit allocates the snapshot, moves the branch
ref atomically (refs CAS), and pins main at its pre-commit head — main
provably never sees branch snapshots until ``fast_forward`` publishes.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.commit import (
    CommitManager,
    InconsistentPlansError,
)
from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import CompactionConfig
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.ingest import (
    delete_where,
    merge_into,
    read_table_mor,
    update_where,
    upsert,
)
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def cat(tmp_path):
    """A table fragmented into 6 small files (compactable)."""
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for f in range(6):
        ids = list(range(f * 10, f * 10 + 10))
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{i}" for i in ids],
                }
            ),
            os.path.join(root, f"part-{f}.parquet"),
        )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    return cat


def _rows(spark, cat, name="t", ref=None):
    m = (
        cat.load_table_ref(name, ref) if ref else cat.load_table(name)
    )
    return {
        r["id"]: r["val"] for r in read_table_mor(spark, m).collect()
    }


def test_wap_lifecycle_upsert_and_compact_on_branch(spark, cat):
    """The full write-audit-publish flow: stage an upsert AND a
    compaction on the audit branch, audit via ref reads, publish with
    fast_forward — main provably untouched until the publish."""
    base_rows = _rows(spark, cat)
    cat.create_branch("t", "audit")

    # write ON the branch
    m2 = upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(3, "three"), (99, "v99")], ["id", "val"]),
        keys=["id"],
        to_branch="audit",
    )
    assert cat.list_refs("t")["audit"]["snapshot_id"] == m2.snapshot_id

    # main untouched: pinned at the pre-commit head
    assert cat.load_table("t").snapshot_id == 1
    assert _rows(spark, cat) == base_rows
    # audit sees the staged write
    audit = _rows(spark, cat, ref="audit")
    assert audit[3] == "three" and audit[99] == "v99" and len(audit) == 61

    # compact ON the branch: fewer files, same rows, main still put
    c = Compaction(spark, CompactionConfig.small_files())
    m3, stats = c.compact_catalog(cat, "t", to_branch="audit")
    assert stats.input_files_count >= 6
    assert len(m3.data_files) < 7
    assert cat.list_refs("t")["audit"]["snapshot_id"] == m3.snapshot_id
    assert cat.load_table("t").snapshot_id == 1
    assert _rows(spark, cat) == base_rows
    assert _rows(spark, cat, ref="audit") == audit

    # publish: fast-forward main to the audited snapshot
    cat.fast_forward("t", "main", m3.snapshot_id)
    assert _rows(spark, cat) == audit
    assert cat.load_table("t").snapshot_id == m3.snapshot_id


def test_branch_dml_full_surface_keeps_main_untouched(spark, cat):
    """delete/update/merge all take to_branch; main never moves."""
    base_rows = _rows(spark, cat)
    cat.create_branch("t", "stage")
    delete_where(spark, cat, "t", "id < 5", to_branch="stage")
    update_where(
        spark, cat, "t", "id >= 55", {"val": "upper(val)"},
        to_branch="stage",
    )
    merge_into(
        spark,
        cat,
        "t",
        spark.createDataFrame([(10, "TEN"), (200, "v200")], ["id", "val"]),
        keys=["id"],
        to_branch="stage",
    )
    assert _rows(spark, cat) == base_rows
    assert cat.load_table("t").snapshot_id == 1
    staged = _rows(spark, cat, ref="stage")
    assert 0 not in staged and 4 not in staged
    assert staged[55] == "V55" and staged[59] == "V59"
    assert staged[10] == "TEN" and staged[200] == "v200"
    assert len(staged) == 60 - 5 + 1
    # publish and confirm the exact staged state lands on main
    cat.fast_forward(
        "t", "main", cat.list_refs("t")["stage"]["snapshot_id"]
    )
    assert _rows(spark, cat) == staged


def test_branch_commit_requires_existing_branch(spark, cat):
    with pytest.raises(KeyError, match="no such"):
        upsert(
            spark,
            cat,
            "t",
            spark.createDataFrame([(1, "x")], ["id", "val"]),
            keys=["id"],
            to_branch="nope",
        )


def test_branch_commit_rejects_tags(spark, cat):
    cat.create_tag("t", "pin")
    with pytest.raises(ValueError, match="is a tag"):
        upsert(
            spark,
            cat,
            "t",
            spark.createDataFrame([(1, "x")], ["id", "val"]),
            keys=["id"],
            to_branch="pin",
        )


def test_t3_rejects_plans_built_for_another_branch(spark, cat):
    """Extended T3 (mod.rs:55-76): plans stamped for main must not land
    on an audit branch."""
    c = Compaction(spark, CompactionConfig.small_files())
    m = cat.load_table("t")
    plans = c.plan(m)  # branch defaults to "main"
    results = [c.rewrite(p) for p in plans]
    with pytest.raises(InconsistentPlansError, match="commit targets"):
        CommitManager().rewrite_files(m, results, branch="audit")


def test_branch_snapshots_survive_expiration_and_main_stays(spark, cat):
    """Pinned main and the branch head are both expiration-proof."""
    cat.create_branch("t", "audit")
    for i in range(3):
        upsert(
            spark,
            cat,
            "t",
            spark.createDataFrame([(i, f"u{i}")], ["id", "val"]),
            keys=["id"],
            to_branch="audit",
        )
    head = cat.list_refs("t")["audit"]["snapshot_id"]
    expired = cat.expire_snapshots("t", keep_last=1)
    assert 1 not in expired  # main's pinned snapshot retained
    assert head not in expired
    assert cat.load_table("t").snapshot_id == 1
    assert _rows(spark, cat, ref="audit")[2] == "u2"


def test_two_branches_commit_independently(spark, cat):
    """Ref CAS: sequential commits to two branches never lose each
    other's ref move, and each branch sees only its own lineage."""
    cat.create_branch("t", "a")
    cat.create_branch("t", "b")
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "a1")], ["id", "val"]),
        keys=["id"], to_branch="a",
    )
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "b1")], ["id", "val"]),
        keys=["id"], to_branch="b",
    )
    refs = cat.list_refs("t")
    assert refs["a"]["snapshot_id"] != refs["b"]["snapshot_id"]
    assert _rows(spark, cat, ref="a")[1] == "a1"
    assert _rows(spark, cat, ref="b")[1] == "b1"
    assert _rows(spark, cat)[1] == "v1"


def test_unpinned_commit_protocol_unchanged(spark, cat):
    """No branch commit ever happened: the classic version==snapshot
    CAS is byte-for-byte the same protocol (no refs file appears)."""
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "u1")], ["id", "val"]),
        keys=["id"],
    )
    m = cat.load_table("t")
    assert m.snapshot_id == 2
    assert cat.list_refs("t") == {}


def test_snapshot_lineage_and_parent_stamps(spark, cat):
    """Parent stamps make lineage walkable: branch snapshots interleave
    version numbers but never appear on main's chain; as-of time travel
    on a WAP table answers from the MAIN lineage only."""
    cat.create_branch("t", "audit")
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "a1")], ["id", "val"]),
        keys=["id"], to_branch="audit",
    )  # v2 on audit, main pinned at 1
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(2, "m2")], ["id", "val"]),
        keys=["id"],
    )  # v3 on main
    parents = cat.snapshot_parents("t")
    assert parents[2] == 1 and parents[3] == 1
    assert cat.snapshot_lineage("t", 3, 0) == [1, 3]
    assert cat.snapshot_lineage("t", 2, 0) == [1, 2]
    # as-of "now" resolves main's head, not the branch snapshot
    import time as _t

    m = cat.load_table_as_of("t", int(_t.time() * 1000) + 10_000)
    assert m.snapshot_id == 3


def test_fast_forward_rejects_non_ancestral_target(spark, cat):
    """Iceberg's fast_forward requires ancestry: a branch must not be
    force-moved onto a snapshot that does not descend from its head."""
    cat.create_branch("t", "audit")
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "a1")], ["id", "val"]),
        keys=["id"], to_branch="audit",
    )  # v2: audit lineage
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(2, "m2")], ["id", "val"]),
        keys=["id"],
    )  # v3: main lineage (parent 1, not 2)
    with pytest.raises(ValueError, match="not a fast-forward"):
        cat.fast_forward("t", "audit", 3)
    # the true descendant is fine
    cat.fast_forward("t", "main", 3)


def test_maintain_on_branch_keeps_main_untouched(spark, cat):
    """service.maintain(to_branch=...): the audit branch is compacted
    and delete-maintained before publish; main never moves; the
    hygiene steps keep their global ref-protecting semantics."""
    from iceberg_compaction_spark.plans.auto import AutoCompactionConfig
    from iceberg_compaction_spark.service import MaintenancePolicy, maintain

    base_rows = _rows(spark, cat)
    cat.create_branch("t", "audit")
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(3, "a3"), (99, "a99")], ["id", "val"]),
        keys=["id"], to_branch="audit",
    )
    r = maintain(
        spark,
        cat,
        "t",
        MaintenancePolicy(
            auto=AutoCompactionConfig(min_small_files_count=2),
            keep_snapshots=10,
            clean_orphans=False,
        ),
        to_branch="audit",
    )
    assert r.stats.input_files_count >= 6
    assert cat.load_table("t").snapshot_id == 1
    assert _rows(spark, cat) == base_rows
    audited = _rows(spark, cat, ref="audit")
    assert audited[3] == "a3" and audited[99] == "a99"
    assert len(audited) == 61
    head = cat.list_refs("t")["audit"]["snapshot_id"]
    assert r.snapshot_after == head
    cat.fast_forward("t", "main", head)
    assert _rows(spark, cat) == audited

    # with a branch target, a structural upgrade is rejected loudly
    with pytest.raises(ValueError, match="whole-table"):
        maintain(
            spark, cat, "t",
            MaintenancePolicy(upgrade_to_version=3),
            to_branch="audit",
        )


def test_concurrent_branch_commits_exactly_one_winner(cat):
    """Two writers racing the SAME branch head: exactly one commit
    lands; the loser surfaces retryable CommitConflict, and the
    allocated-version orphan of the loser is unlinked."""
    import threading

    from iceberg_compaction_spark.commit import CommitConflict
    from iceberg_compaction_spark.sources.manifest import Manifest as _M

    cat.create_branch("t", "audit")
    base = cat.load_table_ref("t", "audit")

    def make_next():
        m = _M.from_dict(base.to_dict())
        m.snapshot_id = base.snapshot_id + 1
        m.sequence_number = base.sequence_number + 1
        return m

    outcomes = [None, None]
    barrier = threading.Barrier(2)

    def run(i):
        try:
            barrier.wait()
            outcomes[i] = cat.commit_table(
                "t", base.snapshot_id, make_next(), to_branch="audit"
            )
        except CommitConflict as e:
            outcomes[i] = e

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    wins = [o for o in outcomes if isinstance(o, _M)]
    losses = [o for o in outcomes if isinstance(o, CommitConflict)]
    assert len(wins) == 1 and len(losses) == 1, outcomes
    refs = cat.list_refs("t")
    assert refs["audit"]["snapshot_id"] == wins[0].snapshot_id
    assert refs["main"]["snapshot_id"] == 1
    assert cat.load_table("t").snapshot_id == 1


def test_concurrent_commits_to_distinct_branches_both_land(cat):
    """Two writers racing DIFFERENT branches: both succeed — the refs
    CAS re-applies the loser of the exclusive-create race, so neither
    ref move is lost."""
    import threading

    from iceberg_compaction_spark.sources.manifest import Manifest as _M

    cat.create_branch("t", "a")
    cat.create_branch("t", "b")
    base = cat.load_table("t")
    outcomes = [None, None]
    barrier = threading.Barrier(2)

    def run(i, branch):
        m = _M.from_dict(base.to_dict())
        m.snapshot_id = base.snapshot_id + 1
        m.sequence_number = base.sequence_number + 1
        barrier.wait()
        outcomes[i] = cat.commit_table(
            "t", base.snapshot_id, m, to_branch=branch
        )

    ts = [
        threading.Thread(target=run, args=(0, "a")),
        threading.Thread(target=run, args=(1, "b")),
    ]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    refs = cat.list_refs("t")
    assert outcomes[0].snapshot_id != outcomes[1].snapshot_id
    assert refs["a"]["snapshot_id"] == outcomes[0].snapshot_id
    assert refs["b"]["snapshot_id"] == outcomes[1].snapshot_id
    assert refs["main"]["snapshot_id"] == 1


def test_wap_on_real_metadata_hadoop_catalog(spark, tmp_path):
    """Round 10: the full WAP cycle over the REAL Iceberg on-disk
    layout (IcebergHadoopCatalog + TableRefs mixin) — upsert and
    compact on the audit branch, main provably untouched, publish via
    fast-forward; every branch version is genuine TableMetadata with
    spec refs + parent-snapshot-id, and expiration never drops pinned
    snapshots."""
    import json as _json

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    root = str(tmp_path / "htbl")
    os.makedirs(root)
    for f in range(4):
        ids = list(range(f * 10, f * 10 + 10))
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{i}" for i in ids],
                }
            ),
            os.path.join(root, f"part-{f}.parquet"),
        )
    hcat = IcebergHadoopCatalog(warehouse=str(tmp_path / "hwh"))
    hcat.create_table("h", Manifest.from_parquet_dir(root, sequence_number=1))
    base_rows = _rows(spark, hcat, name="h")

    hcat.create_branch("h", "audit")
    upsert(
        spark, hcat, "h",
        spark.createDataFrame([(3, "a3"), (99, "a99")], ["id", "val"]),
        keys=["id"], to_branch="audit",
    )
    assert hcat.load_table("h").snapshot_id == 1
    assert _rows(spark, hcat, name="h") == base_rows
    audited = _rows(spark, hcat, name="h", ref="audit")
    assert audited[3] == "a3" and audited[99] == "a99"
    assert len(audited) == 41

    # compact ON the branch, real metadata end-to-end
    c = Compaction(spark, CompactionConfig.small_files())
    m3, stats = c.compact_catalog(hcat, "h", to_branch="audit")
    assert stats.input_files_count >= 4
    assert hcat.load_table("h").snapshot_id == 1
    assert _rows(spark, hcat, name="h", ref="audit") == audited

    # the branch version file is genuine spec TableMetadata: refs map
    # shows the branch AND the pinned main; parent stamps the lineage
    raw = _json.loads(
        open(
            os.path.join(
                str(tmp_path / "hwh"), "h", "metadata",
                f"v{m3.snapshot_id}.metadata.json",
            ), "rb"
        ).read()
    )
    assert raw["refs"]["main"]["snapshot-id"] == 1
    assert raw["refs"]["audit"]["snapshot-id"] == m3.snapshot_id
    assert raw["snapshots"][0]["parent-snapshot-id"] == m3.snapshot_id - 1
    assert hcat.snapshot_lineage("h", m3.snapshot_id, 0) == [
        1, 2, m3.snapshot_id,
    ]

    # expiration keeps every pinned snapshot
    expired = hcat.expire_snapshots("h", keep_last=1)
    assert 1 not in expired and m3.snapshot_id not in expired

    # publish
    hcat.fast_forward("h", "main", m3.snapshot_id)
    assert _rows(spark, hcat, name="h") == audited
    # the REST server over this backing serves the published main
    from iceberg_compaction_spark.sources.rest_catalog import (
        RestCatalog,
        serve_rest_catalog,
    )

    with serve_rest_catalog(hcat) as srv:
        client = RestCatalog(uri=srv.uri)
        assert client.load_table("h").snapshot_id == m3.snapshot_id


def test_rollback_on_branch(spark, cat):
    """rollback_table(to_branch=...) restores the BRANCH to an earlier
    lineage state as a new branch commit; main never moves."""
    from iceberg_compaction_spark.sources.catalog import rollback_table

    cat.create_branch("t", "audit")
    m2 = upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "a1")], ["id", "val"]),
        keys=["id"], to_branch="audit",
    )
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(2, "a2")], ["id", "val"]),
        keys=["id"], to_branch="audit",
    )
    assert _rows(spark, cat, ref="audit")[2] == "a2"
    m4 = rollback_table(cat, "t", m2.snapshot_id, to_branch="audit")
    assert cat.list_refs("t")["audit"]["snapshot_id"] == m4.snapshot_id
    rolled = _rows(spark, cat, ref="audit")
    assert rolled[1] == "a1" and rolled[2] == "v2"
    assert cat.load_table("t").snapshot_id == 1


def test_as_of_time_travel_survives_expiration(spark, cat):
    """ADVICE r10 (medium): timestamp time travel on a pinned-main
    table must keep working after routine expire_snapshots removes old
    main-lineage ancestors — the eligible set is the RETAINED chain,
    not a full-lineage walk that raises on the expired tail."""
    import time as _t

    cat.create_branch("t", "keepout")
    for i in range(4):
        upsert(
            spark,
            cat,
            "t",
            spark.createDataFrame([(i, f"m{i}")], ["id", "val"]),
            keys=["id"],
        )
    expired = cat.expire_snapshots("t", keep_last=1)
    assert expired  # old main ancestors really went away
    future = int(_t.time() * 1000) + 10_000
    m = cat.load_table_as_of("t", future)
    assert m.snapshot_id == cat.list_refs("t")["main"]["snapshot_id"]
    # the unpublished branch head is still never eligible
    assert m.snapshot_id != cat.list_refs("t")["keepout"]["snapshot_id"]


def test_drop_main_refused_while_branches_exist(spark, cat):
    """ADVICE r10 (low): dropping the pinned main would unpin the table
    and instantly publish every unpublished branch snapshot — refuse it
    while branches exist, direct the operator to fast_forward."""
    cat.create_branch("t", "audit")
    upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(500, "staged")], ["id", "val"]),
        keys=["id"],
        to_branch="audit",
    )
    with pytest.raises(ValueError, match="fast_forward"):
        cat.drop_ref("t", "main")
    assert 500 not in _rows(spark, cat)  # isolation intact

    # publish, drop the branch; main now at the storage head — the
    # drop becomes provably a no-op for readers and is allowed
    head = cat.list_refs("t")["audit"]["snapshot_id"]
    cat.fast_forward("t", "main", head)
    cat.drop_ref("t", "audit")
    cat.drop_ref("t", "main")
    assert "main" not in cat.list_refs("t")
    assert _rows(spark, cat)[500] == "staged"


def test_drop_main_refused_below_storage_head(spark, cat):
    """Even with no branches left, dropping a main pinned BELOW the
    storage head would jump readers to an unpublished snapshot."""
    cat.create_branch("t", "audit")
    upsert(
        spark,
        cat,
        "t",
        spark.createDataFrame([(600, "staged")], ["id", "val"]),
        keys=["id"],
        to_branch="audit",
    )
    cat.drop_ref("t", "audit")  # discard the branch, not publish it
    with pytest.raises(ValueError, match="storage head"):
        cat.drop_ref("t", "main")
    assert 600 not in _rows(spark, cat)


def test_per_ref_retention_ages_out_refs_and_lineage(spark, cat):
    """VERDICT r10 #5: Iceberg's per-ref retention.  A branch past its
    max_ref_age_ms is dropped by expire_snapshots and its EXCLUSIVE
    lineage expires with it; a within-policy branch and a no-policy tag
    survive; a tag with its own age expires; main is unchanged."""
    import time as _t

    # 'stale' ages out almost immediately; 'fresh' effectively never
    cat.create_branch("t", "stale", retention={"max_ref_age_ms": 50})
    cat.create_branch("t", "fresh", retention={"max_ref_age_ms": 10**12})
    cat.create_tag("t", "oldtag", retention={"max_ref_age_ms": 50})
    cat.create_tag("t", "keeptag")
    # branch commit: allocates v2, exclusive to 'stale'
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(900, "staged")], ["id", "val"]),
        keys=["id"], to_branch="stale",
    )
    assert cat.list_refs("t")["stale"]["snapshot_id"] == 2
    # retention survives the ref MOVE of the branch commit
    assert cat.list_refs("t")["stale"]["max_ref_age_ms"] == 50
    # main commits push the positional window past the branch lineage
    for i in range(3):
        upsert(
            spark, cat, "t",
            spark.createDataFrame([(i, f"m{i}")], ["id", "val"]),
            keys=["id"],
        )
    _t.sleep(0.12)  # let the 50 ms ref ages elapse
    expired = cat.expire_snapshots("t", keep_last=2)
    refs = cat.list_refs("t")
    assert "stale" not in refs and "oldtag" not in refs  # aged out
    assert "fresh" in refs and "keeptag" in refs         # within policy
    assert 2 in expired  # the aged branch's exclusive lineage went too
    assert refs["main"]["snapshot_id"] == 5              # main unchanged
    assert 900 not in _rows(spark, cat)


def test_branch_lineage_trimmed_by_snapshot_age_policy(spark, cat):
    """max_snapshot_age_ms / min_snapshots_to_keep trim a branch's
    retained LINEAGE: intermediate staged commits age out while the
    branch head always survives (min floor)."""
    import time as _t

    cat.create_branch(
        "t", "work",
        retention={"min_snapshots_to_keep": 1, "max_snapshot_age_ms": 1},
    )
    for i, v in enumerate(["s1", "s2"]):
        upsert(
            spark, cat, "t",
            spark.createDataFrame([(910 + i, v)], ["id", "val"]),
            keys=["id"], to_branch="work",
        )
    head = cat.list_refs("t")["work"]["snapshot_id"]
    assert head == 3  # v2, v3 staged on the branch
    for i in range(2):
        upsert(
            spark, cat, "t",
            spark.createDataFrame([(i, f"m{i}")], ["id", "val"]),
            keys=["id"],
        )
    _t.sleep(0.05)
    expired = cat.expire_snapshots("t", keep_last=2)
    assert 2 in expired      # intermediate branch commit aged out
    assert head not in expired
    assert "work" in cat.list_refs("t")
    assert _rows(spark, cat, ref="work")[911] == "s2"  # head readable


def test_min_snapshots_floor_alone_never_trims_lineage(spark, cat):
    """ADVICE r11: min_snapshots_to_keep WITHOUT max_snapshot_age_ms is
    a floor, not a trimmer (Iceberg semantics) — declaring only the
    floor must keep the branch's FULL lineage, or a later fast_forward
    ancestry walk could lose young ancestors."""
    cat.create_branch("t", "work", retention={"min_snapshots_to_keep": 1})
    for i, v in enumerate(["s1", "s2"]):
        upsert(
            spark, cat, "t",
            spark.createDataFrame([(920 + i, v)], ["id", "val"]),
            keys=["id"], to_branch="work",
        )
    for i in range(3):  # push the positional window past the lineage
        upsert(
            spark, cat, "t",
            spark.createDataFrame([(i, f"m{i}")], ["id", "val"]),
            keys=["id"],
        )
    expired = cat.expire_snapshots("t", keep_last=2)
    # v2 (the intermediate branch commit) would have been trimmed under
    # the pre-fix exactly-N semantics; the floor alone must pin it
    assert 2 not in expired and 3 not in expired
    # the full staged lineage remains loadable (ancestry intact)
    assert cat.load_table_at("t", 2) is not None
    assert _rows(spark, cat, ref="work")[921] == "s2"


def test_cherry_pick_publishes_append_after_main_moved(spark, cat, tmp_path):
    """cherry_pick (round 11; Iceberg's cherrypick_snapshot): when main
    advanced past the branch's fork, fast_forward refuses — cherry-pick
    replays the branch's APPEND onto the current head as a new commit;
    non-append staged commits are rejected."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.catalog import cherry_pick
    from iceberg_compaction_spark.sources.ingest import add_files

    cat.create_branch("t", "backfill")
    # append-only branch commit via add_files (storage v2)
    extra = str(tmp_path / "extra")
    os.makedirs(extra)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([700, 701], type=pa.int64()),
                "val": ["b700", "b701"],
            }
        ),
        os.path.join(extra, "imp.parquet"),
    )
    staged = add_files(cat, "t", extra, to_branch="backfill")
    # main moves past the fork (v3)
    upsert(
        spark, cat, "t",
        spark.createDataFrame([(5, "moved")], ["id", "val"]),
        keys=["id"],
    )
    with pytest.raises(ValueError, match="fast-forward"):
        cat.fast_forward("t", "main", staged.snapshot_id)

    published = cherry_pick(cat, "t", staged.snapshot_id)
    rows = _rows(spark, cat)
    assert rows[700] == "b700" and rows[701] == "b701"
    assert rows[5] == "moved"  # main's own commit survives
    assert published.snapshot_id == cat.list_refs("t")["main"]["snapshot_id"]
    # re-picking the same snapshot: duplicate-file guard
    with pytest.raises(ValueError, match="already contains"):
        cherry_pick(cat, "t", staged.snapshot_id)

    # a NON-append staged commit (upsert writes an eq-delete) refuses
    cat.create_branch("t", "audit2")
    m = upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "staged1")], ["id", "val"]),
        keys=["id"], to_branch="audit2",
    )
    with pytest.raises(ValueError, match="append-only"):
        cherry_pick(cat, "t", m.snapshot_id)


def _mk_partitioned(tmp_path, spark):
    """FileCatalog table 'p' identity-partitioned on lang with two
    cells (en, fr)."""
    from iceberg_compaction_spark.sources.ingest import (
        overwrite_partitions,
    )

    root = str(tmp_path / "ptbl")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "lang": ["seed"],
                "id": pa.array([0], type=pa.int64()),
                "val": ["seed"],
            }
        ),
        os.path.join(root, "seed.parquet"),
    )
    m = Manifest.from_parquet_dir(root, sequence_number=1)
    m.partition_spec = [
        {"source": "lang", "transform": "identity", "name": "lang"}
    ]
    for t in m.data_files:
        t.partition = ("seed",)
    cat = FileCatalog(warehouse=str(tmp_path / "pwh"))
    cat.create_table("p", m)
    # populate en + fr through the DML itself (fan-out writer)
    overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame(
            [("en", 1, "e1"), ("en", 2, "e2"), ("fr", 1, "f1")],
            ["lang", "id", "val"],
        ),
    )
    return cat


def _prows(spark, cat, ref=None):
    m = cat.load_table_ref("p", ref) if ref else cat.load_table("p")
    return {
        (r["lang"], r["id"]): r["val"]
        for r in read_table_mor(spark, m).collect()
    }


def test_overwrite_partitions_replaces_only_written_cells(spark, tmp_path):
    from iceberg_compaction_spark.sources.ingest import (
        overwrite_partitions,
    )

    cat = _mk_partitioned(tmp_path, spark)
    assert _prows(spark, cat) == {
        ("seed", 0): "seed",
        ("en", 1): "e1",
        ("en", 2): "e2",
        ("fr", 1): "f1",
    }
    before = cat.load_table("p")
    en_files = {
        t.data_file_path
        for t in before.data_files
        if tuple(t.partition) in {("en",), ("seed",)}
        or str(t.partition[0]) in ("en", "seed")
    }
    overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame(
            [("fr", 7, "f7"), ("fr", 8, "f8")], ["lang", "id", "val"]
        ),
    )
    got = _prows(spark, cat)
    # fr replaced WHOLE; en and seed byte-identical (same file paths)
    assert got == {
        ("seed", 0): "seed",
        ("en", 1): "e1",
        ("en", 2): "e2",
        ("fr", 7): "f7",
        ("fr", 8): "f8",
    }
    after = cat.load_table("p")
    assert after.operation == "overwrite"
    kept = {
        t.data_file_path
        for t in after.data_files
        if str(t.partition[0]) in ("en", "seed")
    }
    assert kept == en_files
    # empty batch: dynamic overwrite replaces nothing, no commit
    head = cat.load_table("p").snapshot_id
    overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame([], "lang string, id long, val string"),
    )
    assert cat.load_table("p").snapshot_id == head


def test_cherry_pick_replays_staged_overwrite_past_moved_main(
    spark, tmp_path
):
    """VERDICT r11 #3: a WAP flow stages a partition overwrite on a
    branch; main then moves in an UNRELATED partition — fast_forward
    refuses (fork passed), but cherry-pick replays the replace-
    partitions snapshot: both writes land."""
    from iceberg_compaction_spark.sources.catalog import cherry_pick
    from iceberg_compaction_spark.sources.ingest import (
        overwrite_partitions,
    )

    cat = _mk_partitioned(tmp_path, spark)
    cat.create_branch("p", "audit")
    staged = overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame(
            [("fr", 7, "f7"), ("fr", 8, "f8")], ["lang", "id", "val"]
        ),
        to_branch="audit",
    )
    # main moves in lang=en (unrelated cell)
    overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame([("en", 9, "e9")], ["lang", "id", "val"]),
    )
    with pytest.raises(ValueError):
        cat.fast_forward("p", "main", staged.snapshot_id)
    published = cherry_pick(cat, "p", staged.snapshot_id)
    assert published.operation == "overwrite"
    assert _prows(spark, cat) == {
        ("seed", 0): "seed",
        ("en", 9): "e9",       # main's move preserved
        ("fr", 7): "f7",       # staged overwrite replayed
        ("fr", 8): "f8",
    }


def test_cherry_pick_overwrite_rejects_conflicting_cell(spark, tmp_path):
    """Main moved in the SAME partition the staged overwrite replaces:
    a genuine conflict — replaying would drop main's write — rejected
    loudly; the head stays put."""
    from iceberg_compaction_spark.sources.catalog import cherry_pick
    from iceberg_compaction_spark.sources.ingest import (
        overwrite_partitions,
    )

    cat = _mk_partitioned(tmp_path, spark)
    cat.create_branch("p", "audit")
    staged = overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame(
            [("fr", 7, "f7")], ["lang", "id", "val"]
        ),
        to_branch="audit",
    )
    overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame([("fr", 5, "f5")], ["lang", "id", "val"]),
    )
    head = cat.load_table("p").snapshot_id
    with pytest.raises(ValueError, match="changed on the target"):
        cherry_pick(cat, "p", staged.snapshot_id)
    assert cat.load_table("p").snapshot_id == head
    assert _prows(spark, cat)[("fr", 5)] == "f5"


def test_cherry_pick_overwrite_into_previously_empty_cell(spark, tmp_path):
    """A staged overwrite that WRITES a new cell (empty at the fork):
    replayable only while the cell is still empty on the head; a head
    write into it since the fork conflicts."""
    from iceberg_compaction_spark.sources.catalog import cherry_pick
    from iceberg_compaction_spark.sources.ingest import (
        overwrite_partitions,
    )

    cat = _mk_partitioned(tmp_path, spark)
    cat.create_branch("p", "audit")
    staged = overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame([("de", 1, "d1")], ["lang", "id", "val"]),
        to_branch="audit",
    )
    # clean replay while de is untouched on main
    cherry_pick(cat, "p", staged.snapshot_id)
    assert _prows(spark, cat)[("de", 1)] == "d1"

    # second staged overwrite of de; main then writes de too -> conflict
    staged2 = overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame([("de", 2, "d2")], ["lang", "id", "val"]),
        to_branch="audit",
    )
    overwrite_partitions(
        spark, cat, "p",
        spark.createDataFrame([("de", 3, "d3")], ["lang", "id", "val"]),
    )
    with pytest.raises(ValueError, match="changed on the target"):
        cherry_pick(cat, "p", staged2.snapshot_id)


def test_torn_refs_orphan_does_not_brick_writers(cat):
    """ADVICE r13 (catalog.py _refs_cas): a permanently unreadable
    NEWEST refs.v<K>.json (an old-engine crash orphan) must not wedge
    ref writers — the CAS derives its next version from the highest
    LISTED version, skipping past the occupied path, while readers
    keep falling back to the last readable state."""
    cat.create_branch("t", "audit")
    k, refs = cat._refs_state("t")
    assert "audit" in refs
    # plant an empty (torn) orphan ABOVE the current version
    orphan = cat._refs_vpath("t", k + 1)
    with open(orphan, "wb"):
        pass
    # reader: falls back to the readable state, never raises
    k2, refs2 = cat._refs_state("t")
    assert (k2, refs2) == (k, refs)
    # writer: must succeed promptly, landing PAST the orphan
    cat.create_tag("t", "pin")
    k3, refs3 = cat._refs_state("t")
    assert k3 >= k + 2 and "pin" in refs3 and "audit" in refs3
    # the orphan stays on disk (immutable history) but is never read
    assert os.path.getsize(orphan) == 0


def test_transiently_lagging_ref_gets_grace_before_skip(cat):
    """ADVICE r14 (catalog.py _refs_cas): a listed-but-unreadable
    NEWEST refs.v<K>.json that is merely read-after-write LAG (not a
    torn orphan) must become visible within the staged-skip grace —
    the writer backs off across the first attempts (multi-second total
    budget) instead of skipping past a committed mutation after
    ~160 ms.  Here the lagging version materializes ~0.25 s in; the
    writer must build ON it, not shadow it."""
    import json as _json
    import threading
    import time as _time

    cat.create_branch("t", "audit")
    k, refs = cat._refs_state("t")
    lag_path = cat._refs_vpath("t", k + 1)
    lagged = dict(refs)
    lagged["lagged"] = dict(refs["audit"])  # a committed-but-lagging ref
    with open(lag_path, "wb"):
        pass  # listed, unreadable: visibility lag in progress
    t = threading.Thread(
        target=lambda: (
            _time.sleep(0.25),
            open(lag_path, "w").write(_json.dumps(lagged)),
        ),
        daemon=True,
    )
    t.start()
    cat.create_tag("t", "pin")  # must wait out the lag, then build on it
    t.join()
    _, final = cat._refs_state("t")
    assert "lagged" in final, "lagging committed ref was lost (skipped)"
    assert "pin" in final and "audit" in final
