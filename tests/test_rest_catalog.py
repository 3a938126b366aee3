"""REST-catalog backend: the Iceberg REST protocol client/server pair,
exercised over real HTTP — the seam the reference's integration suite
drives via an iceberg-rest container
(integration-tests/src/integration_tests.rs:38-579)."""

import os
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.commit import CommitConflict
from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import CompactionConfig
from iceberg_compaction_spark.sources.catalog import (
    FileCatalog,
    TableAlreadyExists,
    TableNotFound,
)
from iceberg_compaction_spark.sources.manifest import Manifest
from iceberg_compaction_spark.sources.rest_catalog import (
    RestCatalog,
    serve_rest_catalog,
)


@pytest.fixture()
def server(tmp_path):
    backing = FileCatalog(warehouse=str(tmp_path / "warehouse"))
    with serve_rest_catalog(backing) as srv:
        yield srv


@pytest.fixture()
def client(server):
    return RestCatalog(uri=server.uri)


@pytest.fixture()
def fragmented(tmp_path):
    """8 small files of 16 rows each, no deletes."""
    root = str(tmp_path / "data")
    os.makedirs(root)
    n = 0
    for f in range(8):
        ids = list(range(n, n + 16))
        n += 16
        pq.write_table(
            pa.table({"id": pa.array(ids, type=pa.int64())}),
            os.path.join(root, f"part{f}.parquet"),
        )
    return Manifest.from_parquet_dir(root, sequence_number=1)


def test_config_handshake(client):
    cfg = client.fetch_config()
    assert "defaults" in cfg and "overrides" in cfg


def test_create_load_roundtrip_over_http(client, fragmented):
    created = client.create_table("events", fragmented)
    assert created.snapshot_id == 1
    assert client.list_tables() == ["events"]
    assert client.table_exists("events")
    assert not client.table_exists("nope")
    loaded = client.load_table("events")
    assert loaded.snapshot_id == 1
    assert loaded.paths() == fragmented.paths()
    with pytest.raises(TableAlreadyExists):
        client.create_table("events", fragmented)
    with pytest.raises(TableNotFound):
        client.load_table("nope")


def test_commit_cas_and_conflict(client, fragmented):
    client.create_table("t", fragmented)
    nxt = Manifest.from_dict(fragmented.to_dict())
    nxt.snapshot_id = 2
    committed = client.commit_table("t", 1, nxt)
    assert committed.snapshot_id == 2
    assert client.load_table("t").snapshot_id == 2
    # stale expected head -> spec CommitFailedException -> CommitConflict
    again = Manifest.from_dict(fragmented.to_dict())
    again.snapshot_id = 2
    with pytest.raises(CommitConflict):
        client.commit_table("t", 1, again)


def test_concurrent_commit_exactly_one_winner(client, fragmented):
    client.create_table("t", fragmented)
    base = client.load_table("t")

    def make_next():
        m = Manifest.from_dict(base.to_dict())
        m.snapshot_id = base.snapshot_id + 1
        return m

    outcomes = [None, None]
    barrier = threading.Barrier(2)

    def run(i):
        # separate client objects: two independent engines
        c = RestCatalog(uri=client.uri)
        try:
            barrier.wait()
            outcomes[i] = c.commit_table("t", base.snapshot_id, make_next())
        except CommitConflict as e:
            outcomes[i] = e

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wins = [o for o in outcomes if isinstance(o, Manifest)]
    losses = [o for o in outcomes if isinstance(o, CommitConflict)]
    assert len(wins) == 1 and len(losses) == 1, outcomes
    assert client.load_table("t").snapshot_id == 2


def test_bearer_token_auth(tmp_path, fragmented):
    backing = FileCatalog(warehouse=str(tmp_path / "wh2"))
    with serve_rest_catalog(backing, token="s3cret") as srv:
        good = RestCatalog(uri=srv.uri, token="s3cret")
        good.create_table("t", fragmented)
        assert good.table_exists("t")
        bad = RestCatalog(uri=srv.uri, token="wrong")
        with pytest.raises(RuntimeError, match="401"):
            bad.load_table("t")


def test_compaction_through_rest_catalog(spark, client, fragmented):
    """The reference's catalog-driven integration flow, over HTTP:
    load -> compact -> CAS commit -> re-run is a no-op fixed point
    (integration_tests.rs:311-319)."""
    client.create_table("t", fragmented)
    c = Compaction(
        spark=spark, config=CompactionConfig.small_files(min_group_file_count=2)
    )
    m2, stats = c.compact_catalog(client, "t")
    assert m2.snapshot_id == 2
    assert stats.input_files_count == 8
    assert stats.output_files_count == 1
    assert sum(t.record_count for t in m2.data_files) == 128
    assert client.load_table("t").snapshot_id == 2

    m3, stats2 = c.compact_catalog(client, "t")
    assert m3.snapshot_id == 2
    assert stats2.input_files_count == 0


def test_rest_backend_runs_full_maintenance_service(spark, client, fragmented):
    """Backend parity: the table-service pass (auto-compact + expire +
    orphan cleanup) runs over the REST client exactly as over the
    FileCatalog — history, time travel, and maintenance all over HTTP."""
    from iceberg_compaction_spark.plans.auto import (
        AutoCompactionConfig,
        AutoPlanReason,
    )
    from iceberg_compaction_spark.service import MaintenancePolicy, maintain

    client.create_table("t", fragmented)
    rows_before = spark.read.parquet(*client.load_table("t").paths()).count()

    r = maintain(
        spark,
        client,
        "t",
        MaintenancePolicy(
            auto=AutoCompactionConfig(min_small_files_count=2),
            keep_snapshots=1,
            orphan_older_than_s=0,
        ),
    )
    assert r.compaction.reason == AutoPlanReason.RECOMMENDED
    assert r.expired_snapshots == [1]
    assert len(r.orphans_removed) == 8
    assert client.table_history("t") == [2]
    live = client.load_table_at("t", 2)
    assert spark.read.parquet(*live.paths()).count() == rows_before
    with pytest.raises(TableNotFound):
        client.load_table_at("t", 1)


def test_commit_status_unknown_reconciles(client, fragmented, monkeypatch):
    """Lost-response commits: the POST reaches the server but the
    response dies on the wire. The client must reconcile by reload —
    recognizing its own landed commit (snapshot id + uuid'd path set) —
    instead of double-committing or dropping a success."""
    import urllib.error

    client.create_table("t", fragmented)

    real_request = RestCatalog._request

    def lossy(self, method, url, body=None):
        out = real_request(self, method, url, body)
        if method == "POST" and url.endswith("/tables/t"):
            raise urllib.error.URLError("connection reset by peer")
        return out

    nxt = Manifest.from_dict(fragmented.to_dict())
    nxt.snapshot_id = 2
    monkeypatch.setattr(RestCatalog, "_request", lossy)
    committed = client.commit_table("t", 1, nxt)  # reconciled, not raised
    monkeypatch.setattr(RestCatalog, "_request", real_request)
    assert committed.snapshot_id == 2
    assert client.load_table("t").snapshot_id == 2


def test_commit_status_unknown_landed_then_buried(
    client, fragmented, monkeypatch
):
    """Lost-response commit where ANOTHER writer commits on top before
    the reconcile reload: head != ours is NOT proof the commit was lost.
    The client must find its snapshot in the retained history (matching
    path set) and return success — retrying a landed upsert appends its
    data file twice; a landed compaction retry fails permanently."""
    import urllib.error

    client.create_table("t", fragmented)
    real_request = RestCatalog._request

    def lossy_then_buried(self, method, url, body=None):
        out = real_request(self, method, url, body)
        if method == "POST" and url.endswith("/tables/t"):
            # our commit landed; before we can reload, another writer
            # commits v3 on top
            nxt3 = Manifest.from_dict(fragmented.to_dict())
            nxt3.snapshot_id = 3
            monkeypatch.setattr(RestCatalog, "_request", real_request)
            client.commit_table("t", 2, nxt3)
            raise urllib.error.URLError("connection reset by peer")
        return out

    nxt = Manifest.from_dict(fragmented.to_dict())
    nxt.snapshot_id = 2
    monkeypatch.setattr(RestCatalog, "_request", lossy_then_buried)
    committed = client.commit_table("t", 1, nxt)  # reconciled via history
    assert committed.snapshot_id == 2
    assert client.load_table("t").snapshot_id == 3  # the later writer's head
    assert client.table_history("t") == [1, 2, 3]


def test_commit_never_sent_raises_retryable(client, fragmented, monkeypatch):
    """If the POST never reached the server, reconciliation finds the
    head unmoved and surfaces retryable CommitConflict."""
    import urllib.error

    client.create_table("t", fragmented)
    real_request = RestCatalog._request

    def dead(self, method, url, body=None):
        if method == "POST" and url.endswith("/tables/t"):
            raise urllib.error.URLError("no route to host")
        return real_request(self, method, url, body)

    nxt = Manifest.from_dict(fragmented.to_dict())
    nxt.snapshot_id = 2
    monkeypatch.setattr(RestCatalog, "_request", dead)
    with pytest.raises(CommitConflict, match="network failure"):
        client.commit_table("t", 1, nxt)
    monkeypatch.setattr(RestCatalog, "_request", real_request)
    assert client.load_table("t").snapshot_id == 1  # nothing landed


def test_refs_over_http(client, fragmented, spark):
    """Tag/branch lifecycle through the REST client: create, resolve,
    WAP fast-forward, immutability errors, expiry pinning."""
    client.create_table("t", fragmented)
    client.create_tag("t", "audit-v1")  # defaults to head (=1)
    assert client.list_refs("t") == {
        "audit-v1": {"type": "tag", "snapshot_id": 1}
    }
    assert client.load_table_ref("t", "audit-v1").snapshot_id == 1

    # advance the table twice via compaction commits
    eng = Compaction(spark=spark, config=CompactionConfig.full())
    for _ in range(2):
        cur = client.load_table("t")
        new, _ = eng.compact_catalog(client, "t")

    client.create_branch("t", "prod", snapshot_id=1)
    head = client.load_table("t").snapshot_id
    client.fast_forward("t", "prod", head)
    assert client.load_table_ref("t", "prod").snapshot_id == head
    with pytest.raises(ValueError):
        client.fast_forward("t", "prod", 1)  # backwards
    with pytest.raises(ValueError):
        client.create_tag("t", "audit-v1")  # exists

    # expiry over HTTP must pin the tagged snapshot
    expired = client.expire_snapshots("t", keep_last=1)
    assert 1 not in expired
    assert client.load_table_ref("t", "audit-v1").snapshot_id == 1

    client.drop_ref("t", "audit-v1")
    with pytest.raises(TableNotFound):
        client.load_table_ref("t", "audit-v1")


def test_metadata_tables_over_rest(spark, client, fragmented):
    """metadata_tables is catalog-generic: the same snapshots / history
    / refs / files builders run over the REST client (HTTP round-trips
    for every load) exactly as over FileCatalog."""
    from iceberg_compaction_spark.sources import metadata_tables as mt

    client.create_table("t", fragmented)
    m2 = Manifest.from_dict(client.load_table("t").to_dict())
    m2.snapshot_id = 2
    m2.operation = "replace"
    m2.data_files = m2.data_files[:4]
    client.commit_table("t", 1, m2)
    client.create_tag("t", "audited", snapshot_id=1)

    snaps = {r[0]: r for r in mt.snapshots_rows(client, "t")}
    assert snaps[1][4] == 8 and snaps[2][4] == 4
    assert mt.history_rows(client, "t") == [
        (1, None, True, False),
        (2, 1, True, True),
    ]
    assert mt.refs_rows(client, "t") == [
            ("audited", "tag", 1, None, None, None)
        ]
    assert len(mt.metadata_rows(client, "t", "files", snapshot_id=1)) == 8
    assert mt.snapshots_df(spark, client, "t").count() == 2


# --- round 9: full-fidelity payloads over the Hadoop-layout backing ----------


def test_full_fidelity_rest_dml_interop(spark, tmp_path):
    """REST server backed by IcebergHadoopCatalog: upsert + delete_where
    through the HTTP client, LoadTableResult carrying REAL TableMetadata
    (metadata-location = the actual v<N>.metadata.json), and an
    independent spec-path read (load_iceberg_table) of what the server
    stores agreeing row-for-row — the a5d51fc interop shape, REST-first
    (reference: integration_tests.rs:38-579)."""
    import json
    import urllib.request

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
        load_iceberg_table,
    )
    from iceberg_compaction_spark.sources.ingest import (
        delete_where,
        read_table_mor,
        upsert,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(10), type=pa.int64()),
                "val": [f"v{i}" for i in range(10)],
            }
        ),
        os.path.join(root, "base.parquet"),
    )
    backing = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "h", Manifest.from_parquet_dir(root, sequence_number=1)
    )
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        assert client.list_tables() == ["h"]

        # DML over HTTP: each commit is a real metadata version
        m2 = upsert(
            spark, client, "h",
            spark.createDataFrame([(3, "new3"), (77, "v77")], ["id", "val"]),
            keys=["id"],
        )
        assert m2.snapshot_id == 2
        m3 = delete_where(spark, client, "h", "id IN (0, 77)")
        assert m3.snapshot_id == 3
        assert client.table_history("h") == [1, 2, 3]

        # the raw LoadTableResult is spec TableMetadata, not an
        # engine-keyed carrier
        raw = json.loads(
            urllib.request.urlopen(
                f"{srv.uri}/v1/namespaces/default/tables/h"
            ).read()
        )
        assert raw["metadata-location"].endswith("v3.metadata.json")
        md = raw["metadata"]
        assert md["format-version"] >= 2
        assert "iceberg-compaction-spark.manifest" not in json.dumps(md)
        assert md["current-snapshot-id"] == 3

        # client view (rebuilt via the spec read path from the served
        # metadata-location)
        via_client = {
            r["id"]: r["val"]
            for r in read_table_mor(spark, client.load_table("h")).collect()
        }
        assert via_client[3] == "new3"
        assert 0 not in via_client and 77 not in via_client
        assert len(via_client) == 9

        # independent engine: read the server's STORAGE directly
        direct = load_iceberg_table(str(tmp_path / "wh" / "h"))
        via_storage = {
            r["id"]: r["val"]
            for r in read_table_mor(spark, direct).collect()
        }
        assert via_storage == via_client

        # time travel through the REST surface still resolves real
        # metadata versions
        v1 = client.load_table_at("h", 1)
        assert {
            r["id"] for r in read_table_mor(spark, v1).collect()
        } == set(range(10))


def test_full_fidelity_rest_metadata_tables(spark, tmp_path):
    """snapshots_df (metadata tables) works over the full-fidelity REST
    client: history + per-snapshot loads resolve through HTTP."""
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )
    from iceberg_compaction_spark.sources.ingest import delete_where
    from iceberg_compaction_spark.sources.metadata_tables import (
        snapshots_df,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array(range(8), type=pa.int64())}),
        os.path.join(root, "b.parquet"),
    )
    backing = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "t", Manifest.from_parquet_dir(root, sequence_number=1)
    )
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        delete_where(spark, client, "t", "id >= 6")
        rows = {
            r["snapshot_id"]: r["operation"]
            for r in snapshots_df(spark, client, "t").collect()
        }
        assert set(rows) == {1, 2} and rows[2] == "delete"


def test_full_fidelity_commit_uses_spec_wire(spark, tmp_path, monkeypatch):
    """Round 9: on the full-fidelity tier, a structure-preserving commit
    goes POINTER-ONLY — the client writes the Avro manifest list itself
    and the server never sees an engine manifest (commit_table is
    poisoned to prove the path).  Structural changes (schema evolution)
    still take the engine-manifest wire."""
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
        load_iceberg_table,
    )
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(10), type=pa.int64()),
                "val": [f"v{i}" for i in range(10)],
            }
        ),
        os.path.join(root, "base.parquet"),
    )
    backing = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "h", Manifest.from_parquet_dir(root, sequence_number=1)
    )

    def _poisoned(self, *a, **k):
        raise AssertionError(
            "engine-manifest wire used on the full-fidelity tier"
        )

    monkeypatch.setattr(IcebergHadoopCatalog, "commit_table", _poisoned)
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        m2 = upsert(
            spark, client, "h",
            spark.createDataFrame([(3, "new3"), (77, "v77")], ["id", "val"]),
            keys=["id"],
        )
        assert m2.snapshot_id == 2
        # properties ride the set-properties update; the snapshot's
        # manifest-list is the CLIENT-written Avro, readable by the
        # independent spec path
        direct = load_iceberg_table(str(tmp_path / "wh" / "h"))
        got = {
            r["id"]: r["val"]
            for r in read_table_mor(spark, direct).collect()
        }
        assert got[3] == "new3" and got[77] == "v77" and len(got) == 11

        # CAS conflict surfaces as retryable through the spec wire too
        stale = client.load_table("h")
        good = Manifest.from_dict(stale.to_dict())
        good.snapshot_id = stale.next_snapshot()
        good.sequence_number = stale.sequence_number + 1
        client.commit_table("h", stale.snapshot_id, good)
        loser = Manifest.from_dict(stale.to_dict())
        loser.snapshot_id = stale.next_snapshot()
        with pytest.raises(CommitConflict):
            client.commit_table("h", stale.snapshot_id, loser)


def test_full_fidelity_schema_evolution_takes_spec_wire(
    spark, tmp_path, monkeypatch
):
    """Round 10 (VERDICT r9 #3): a structural commit — rename, sort
    order, format upgrade — over the full-fidelity tier rides the
    spec's own update types (add-schema/set-current-schema/
    add-sort-order/set-default-sort-order/upgrade-format-version) with
    the pointer-only add-snapshot; the engine-manifest carrier is
    POISONED to prove no fallback, and an independent spec-path read of
    the server's storage sees every change."""
    import json as _json
    import urllib.request as _rq

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
        load_iceberg_table,
    )
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(6), type=pa.int64()),
                "val": [f"v{i}" for i in range(6)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    backing = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "h", Manifest.from_parquet_dir(root, sequence_number=1)
    )

    def _poisoned(self, *a, **k):
        raise AssertionError(
            "engine-manifest wire used for a structural commit"
        )

    monkeypatch.setattr(IcebergHadoopCatalog, "commit_table", _poisoned)
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)

        # 1) rename: add-schema + set-current-schema on the wire
        cur = client.load_table("h")
        m2 = Manifest.from_dict(cur.to_dict())
        m2.evolve_schema(
            [
                {**f, "name": "renamed_val"} if f["name"] == "val" else f
                for f in m2.schema_fields
            ]
        )
        m2.snapshot_id = cur.next_snapshot()
        m2.sequence_number = cur.sequence_number + 1
        m2.operation = "replace"
        client.commit_table("h", cur.snapshot_id, m2)
        fresh = load_iceberg_table(str(tmp_path / "wh" / "h"))
        assert [f["name"] for f in fresh.schema_fields] == [
            "id",
            "renamed_val",
        ]
        assert fresh.schema_id == m2.schema_id

        # the raw TableMetadata keeps the schema HISTORY (both ids) and
        # a monotonic last-column-id — and never carries the engine key
        raw = _json.loads(
            _rq.urlopen(
                f"{srv.uri}/v1/namespaces/default/tables/h"
            ).read()
        )
        md = raw["metadata"]
        assert {s["schema-id"] for s in md["schemas"]} >= {
            cur.schema_id,
            m2.schema_id,
        }
        assert md["current-schema-id"] == m2.schema_id
        assert int(md["last-column-id"]) >= 2
        assert "iceberg-compaction-spark.manifest" not in _json.dumps(md)

        # 2) declared sort order: add-sort-order + set-default-sort-order
        cur = client.load_table("h")
        m3 = Manifest.from_dict(cur.to_dict())
        m3.sort_order = [{"source": "id", "direction": "desc"}]
        m3.snapshot_id = cur.next_snapshot()
        m3.sequence_number = cur.sequence_number + 1
        m3.operation = "replace"
        client.commit_table("h", cur.snapshot_id, m3)
        after = load_iceberg_table(str(tmp_path / "wh" / "h"))
        assert after.sort_order and after.sort_order[0]["source"] == "id"
        assert after.sort_order[0]["direction"] == "desc"

        # 3) format upgrade v2 -> v3 rides upgrade-format-version
        cur = client.load_table("h")
        assert cur.format_version == 2
        m4 = Manifest.from_dict(cur.to_dict())
        m4.format_version = 3
        m4.snapshot_id = cur.next_snapshot()
        m4.sequence_number = cur.sequence_number + 1
        m4.operation = "replace"
        client.commit_table("h", cur.snapshot_id, m4)
        assert load_iceberg_table(
            str(tmp_path / "wh" / "h")
        ).format_version == 3
        # rows unchanged through all three structural commits
        got = {
            r["id"]
            for r in read_table_mor(
                spark, client.load_table("h")
            ).collect()
        }
        assert got == set(range(6))


def test_branch_targeted_dml_over_rest(spark, tmp_path):
    """Round 10: to_branch flows through the REST wire — the
    requirement's ``ref`` and set-snapshot-ref's ``ref-name`` carry the
    branch (the spec's own branch-write shape); the FileCatalog backing
    allocates the snapshot and moves the branch ref, main provably
    untouched until fast-forward."""
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(10), type=pa.int64()),
                "val": [f"v{i}" for i in range(10)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    backing = FileCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "t", Manifest.from_parquet_dir(root, sequence_number=1)
    )
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        client.create_branch("t", "audit")
        m2 = upsert(
            spark, client, "t",
            spark.createDataFrame([(3, "b3"), (77, "b77")], ["id", "val"]),
            keys=["id"], to_branch="audit",
        )
        # main untouched through the HTTP surface
        assert client.load_table("t").snapshot_id == 1
        assert client.list_refs("t")["audit"]["snapshot_id"] == m2.snapshot_id
        staged = {
            r["id"]: r["val"]
            for r in read_table_mor(
                spark, client.load_table_ref("t", "audit")
            ).collect()
        }
        assert staged[3] == "b3" and staged[77] == "b77" and len(staged) == 11
        # publish over HTTP
        client.fast_forward("t", "main", m2.snapshot_id)
        got = {
            r["id"]: r["val"]
            for r in read_table_mor(spark, client.load_table("t")).collect()
        }
        assert got == staged

        # a commit to a missing branch surfaces the catalog error
        with pytest.raises(Exception, match="no such"):
            upsert(
                spark, client, "t",
                spark.createDataFrame([(1, "x")], ["id", "val"]),
                keys=["id"], to_branch="nope",
            )


def test_rest_streaming_follows_main_lineage(spark, tmp_path):
    """Round 10: lineage over HTTP — the snapshots listing carries
    parent stamps, RestCatalog walks them, and a streaming reader with
    catalog=rest never emits an unpublished branch snapshot."""
    from iceberg_compaction_spark.sources.datasource import register

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(10), type=pa.int64()),
                "val": [f"v{i}" for i in range(10)],
            }
        ),
        os.path.join(root, "base.parquet"),
    )
    backing = FileCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "t", Manifest.from_parquet_dir(root, sequence_number=1)
    )
    register(spark)
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        client.create_branch("t", "audit")

        def stream_rows(tag):
            out = str(tmp_path / "sink")
            q = (
                spark.readStream.format("iceberg-table")
                .option("catalog", "rest")
                .option("uri", srv.uri)
                .option("table", "t")
                .load()
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            files = (
                [n for n in os.listdir(out) if n.endswith(".parquet")]
                if os.path.isdir(out)
                else []
            )
            return spark.read.parquet(out).collect() if files else []

        assert stream_rows("a") == []

        # branch append over HTTP: invisible to the main stream
        ids = list(range(300, 305))
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{i}" for i in ids],
                }
            ),
            os.path.join(root, "staged.parquet"),
        )
        head = client.load_table_ref("t", "audit")
        m2 = Manifest.from_parquet_dir(root, sequence_number=2)
        m2.snapshot_id = head.snapshot_id + 1
        m2.operation = "append"
        m2 = client.commit_table(
            "t", head.snapshot_id, m2, to_branch="audit"
        )
        assert client.snapshot_parents("t")[m2.snapshot_id] == 1
        assert stream_rows("b") == []

        # publish: the staged rows flow through the same checkpoint
        client.fast_forward("t", "main", m2.snapshot_id)
        rows = stream_rows("c")
        assert sorted(r["id"] for r in rows) == ids


def test_full_fidelity_branch_commit_takes_spec_wire(
    spark, tmp_path, monkeypatch
):
    """Round 11 (VERDICT r10 #2): an audit-BRANCH commit over the
    full-fidelity tier rides the SPEC WIRE — pointer-only add-snapshot
    + structural updates + set-snapshot-ref with the branch's name —
    so a conforming external client watching the server can follow the
    branch, exactly the consumer WAP exists for.  The engine-manifest
    carrier is POISONED to prove no fallback; an independent spec-path
    read of the BRANCH's version file sees the data AND a structural
    change, while main's metadata stays untouched."""
    import json as _json

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
        load_iceberg_table,
    )
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(6), type=pa.int64()),
                "val": [f"v{i}" for i in range(6)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    backing = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "h", Manifest.from_parquet_dir(root, sequence_number=1)
    )

    def _poisoned(self, *a, **k):
        raise AssertionError(
            "engine-manifest wire used for a branch commit on the "
            "full-fidelity tier"
        )

    monkeypatch.setattr(IcebergHadoopCatalog, "commit_table", _poisoned)
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        client.create_branch("h", "audit")

        # 1) DATA on the branch: upsert rides the pointer-only wire
        m2 = upsert(
            spark,
            client,
            "h",
            spark.createDataFrame(
                [(2, "staged2"), (66, "staged66")], ["id", "val"]
            ),
            keys=["id"],
            to_branch="audit",
        )
        # main untouched; branch sees the staged rows
        main_read = {
            r["id"]: r["val"]
            for r in read_table_mor(spark, client.load_table("h")).collect()
        }
        assert 66 not in main_read and main_read[2] == "v2"
        branch_read = {
            r["id"]: r["val"]
            for r in read_table_mor(
                spark, client.load_table_ref("h", "audit")
            ).collect()
        }
        assert branch_read[2] == "staged2" and branch_read[66] == "staged66"

        # independent spec-path read of the BRANCH version file straight
        # from the server's storage (no engine manifest anywhere in it)
        branch_sid = backing.list_refs("h")["audit"]["snapshot_id"]
        assert branch_sid == m2.snapshot_id
        vpath = os.path.join(
            str(tmp_path / "wh" / "h"),
            "metadata",
            f"v{branch_sid}.metadata.json",
        )
        raw = _json.loads(open(vpath, "rb").read())
        assert "iceberg-compaction-spark.manifest" not in _json.dumps(raw)
        assert raw["refs"]["audit"]["snapshot-id"] == branch_sid
        assert raw["refs"]["main"]["snapshot-id"] == 1
        assert (
            raw["snapshots"][0]["parent-snapshot-id"] == 1
        )  # lineage stamped
        direct = load_iceberg_table(vpath)
        got = {
            r["id"]: r["val"] for r in read_table_mor(spark, direct).collect()
        }
        assert got[2] == "staged2" and got[66] == "staged66" and len(got) == 7

        # 2) STRUCTURAL change on the branch: rename rides
        # add-schema/set-current-schema against the BRANCH base
        cur = client.load_table_ref("h", "audit")
        m3 = Manifest.from_dict(cur.to_dict())
        m3.evolve_schema(
            [
                {**f, "name": "renamed_val"} if f["name"] == "val" else f
                for f in m3.schema_fields
            ]
        )
        m3.snapshot_id = cur.next_snapshot()
        m3.sequence_number = cur.sequence_number + 1
        m3.operation = "replace"
        # the spec's mechanism for resolving files that carry no parquet
        # field ids after a rename: schema.name-mapping.default, riding
        # the same set-properties update
        m3.properties["schema.name-mapping.default"] = _json.dumps(
            [
                {"field-id": 1, "names": ["id"]},
                {"field-id": 2, "names": ["val"]},
            ]
        )
        m3 = client.commit_table("h", cur.snapshot_id, m3, to_branch="audit")
        new_sid = backing.list_refs("h")["audit"]["snapshot_id"]
        branch_md = _json.loads(
            open(
                os.path.join(
                    str(tmp_path / "wh" / "h"),
                    "metadata",
                    f"v{new_sid}.metadata.json",
                ),
                "rb",
            ).read()
        )
        names = [
            f["name"]
            for s in branch_md["schemas"]
            if s["schema-id"] == branch_md["current-schema-id"]
            for f in s["fields"]
        ]
        assert names == ["id", "renamed_val"]
        # main's metadata keeps the OLD schema
        main_md = _json.loads(
            open(
                os.path.join(
                    str(tmp_path / "wh" / "h"),
                    "metadata",
                    "v1.metadata.json",
                ),
                "rb",
            ).read()
        )
        assert main_md["current-snapshot-id"] == 1

        # 3) publish: fast-forward main to the audited branch head;
        # readers now see staged data under the evolved schema
        client.fast_forward("h", "main", new_sid)
        pub = {
            r["id"]: r["renamed_val"]
            for r in read_table_mor(spark, client.load_table("h")).collect()
        }
        assert pub[66] == "staged66" and len(pub) == 7


def test_spec_wire_main_commit_on_pinned_main_table(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10 (medium): commit_snapshot must mirror commit_table's
    pinned-main regime.  Once a branch pins main on the hadoop tier —
    and a branch commit has taken the next storage version — a
    spec-wire MAIN commit must allocate the next free version and move
    the main ref (previously it CAS-checked max(history) and either
    409'd forever or landed an invisible version file)."""
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(5), type=pa.int64()),
                "val": [f"v{i}" for i in range(5)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    backing = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    backing.create_table(
        "h", Manifest.from_parquet_dir(root, sequence_number=1)
    )

    def _poisoned(self, *a, **k):
        raise AssertionError("engine-manifest wire used")

    monkeypatch.setattr(IcebergHadoopCatalog, "commit_table", _poisoned)
    with serve_rest_catalog(backing) as srv:
        client = RestCatalog(uri=srv.uri)
        client.create_branch("h", "audit")
        # branch commit takes storage v2; main stays pinned at v1
        upsert(
            spark,
            client,
            "h",
            spark.createDataFrame([(70, "staged")], ["id", "val"]),
            keys=["id"],
            to_branch="audit",
        )
        assert backing.list_refs("h")["audit"]["snapshot_id"] == 2
        assert backing.list_refs("h")["main"]["snapshot_id"] == 1

        # MAIN spec-wire commit on the now-pinned table: allocates v3,
        # moves the main ref, leaves the branch untouched
        m = upsert(
            spark,
            client,
            "h",
            spark.createDataFrame([(80, "published")], ["id", "val"]),
            keys=["id"],
        )
        refs = backing.list_refs("h")
        assert refs["main"]["snapshot_id"] == m.snapshot_id == 3
        assert refs["audit"]["snapshot_id"] == 2
        main_read = {
            r["id"]: r["val"]
            for r in read_table_mor(spark, client.load_table("h")).collect()
        }
        assert main_read[80] == "published" and 70 not in main_read
        branch_read = {
            r["id"]: r["val"]
            for r in read_table_mor(
                spark, client.load_table_ref("h", "audit")
            ).collect()
        }
        assert branch_read[70] == "staged" and 80 not in branch_read
        # the main commit's parent is main's previous head, not the
        # interleaved branch allocation
        assert backing.snapshot_parents("h")[3] == 1


def test_per_ref_retention_over_rest(spark, client, fragmented):
    """Per-ref retention rides the REST ref actions (kebab-case wire
    fields) and is enforced by maintenance through the client: an aged
    branch is dropped by expire_snapshots, a within-policy one
    survives."""
    import time as _t

    client.create_table("t", fragmented)
    client.create_branch("t", "stale", retention={"max_ref_age_ms": 40})
    client.create_branch("t", "fresh", retention={"max_ref_age_ms": 10**12})
    assert client.list_refs("t")["stale"]["max_ref_age_ms"] == 40
    # a couple of main commits so expiration has something to do
    for i in range(2):
        cur = client.load_table("t")
        nxt = Manifest.from_dict(cur.to_dict())
        nxt.snapshot_id = cur.next_snapshot()
        client.commit_table("t", cur.snapshot_id, nxt)
    _t.sleep(0.08)
    client.expire_snapshots("t", keep_last=2)
    refs = client.list_refs("t")
    assert "stale" not in refs and "fresh" in refs


def test_branch_commit_status_unknown_landed_then_buried(
    client, fragmented, monkeypatch
):
    """ADVICE r10 (low): the BRANCH-commit unknown-status reconcile must
    walk the branch lineage, not just compare the branch head — if our
    commit landed and another writer committed on top of the branch
    during the outage, declaring it lost would make the caller's retry
    re-commit and duplicate the upsert's data file."""
    import urllib.error

    from iceberg_compaction_spark.plans.datamodel import FileScanTask

    def with_extra(tag):
        m = Manifest.from_dict(fragmented.to_dict())
        m.data_files.append(
            FileScanTask(
                data_file_path=f"/fake/{tag}.parquet",
                length=10,
                record_count=1,
                sequence_number=2,
            )
        )
        return m

    client.create_table("t", fragmented)
    client.create_branch("t", "audit")
    real_request = RestCatalog._request

    def lossy_then_buried(self, method, url, body=None):
        out = real_request(self, method, url, body)
        if method == "POST" and url.endswith("/tables/t"):
            # ours landed; another writer commits on the branch before
            # we can reload
            monkeypatch.setattr(RestCatalog, "_request", real_request)
            c2 = RestCatalog(uri=client.uri)
            head = c2.list_refs("t")["audit"]["snapshot_id"]
            c2.commit_table("t", head, with_extra("other"),
                            to_branch="audit")
            raise urllib.error.URLError("connection reset by peer")
        return out

    ours = with_extra("ours")
    ours.snapshot_id = 2
    monkeypatch.setattr(RestCatalog, "_request", lossy_then_buried)
    committed = client.commit_table("t", 1, ours, to_branch="audit")
    assert "/fake/ours.parquet" in committed.paths()
    assert "/fake/other.parquet" not in committed.paths()
    # the branch head is the LATER writer's commit, built on ours
    head = client.load_table_ref("t", "audit")
    assert "/fake/other.parquet" in head.paths()
    parents = client.snapshot_parents("t")
    assert parents[head.snapshot_id] == committed.snapshot_id


def test_statistics_roundtrip_over_rest(spark, client, fragmented):
    """compute_table_stats / compute_partition_stats commit their
    registrations over the REST wire; the manifest carrier round-trips
    both statistics lists and read-back works through the client."""
    from iceberg_compaction_spark.operators.stats import (
        compute_partition_stats,
        compute_table_stats,
        read_partition_stats,
        read_table_ndv,
    )

    client.create_table("t", fragmented)
    _, ndv = compute_table_stats(spark, client, "t", columns=["id"])
    assert ndv == {"id": 128}
    head = client.load_table("t")
    [entry] = head.statistics_files
    assert os.path.exists(entry["statistics-path"])
    assert read_table_ndv(head) == {"id": 128.0}
    _, rows = compute_partition_stats(client, "t")
    head = client.load_table("t")
    assert head.partition_statistics_files[0]["snapshot-id"] == (
        head.snapshot_id - 1
    )
    back = read_partition_stats(head)
    assert len(back) == 1 and back[0]["data_record_count"] == 128
    # both stats commits were row-preserving replace snapshots
    assert head.operation == "replace"


# ---------------------------------------------------------------------------
# round 13: namespace CRUD + multi-table transactions (verdict task #4)
# ---------------------------------------------------------------------------


def test_namespace_lifecycle_over_http(client, fragmented):
    """Create / list / load / exists / drop namespaces over the wire;
    tables in distinct namespaces are isolated; a non-empty namespace
    refuses to drop (spec NamespaceNotEmptyException)."""
    assert client.list_namespaces() == ["default"]
    client.create_namespace("analytics", properties={"owner": "data-eng"})
    assert client.list_namespaces() == ["analytics", "default"]
    assert client.namespace_exists("analytics")
    assert not client.namespace_exists("nope")
    assert client.load_namespace("analytics") == {"owner": "data-eng"}
    with pytest.raises(TableAlreadyExists):
        client.create_namespace("analytics")

    # a table in the new namespace is invisible from default (and vice
    # versa); same unqualified name can exist in both
    ns_client = RestCatalog(uri=client.uri, namespace="analytics")
    ns_client.create_table("t", fragmented)
    client.create_table("t", fragmented)
    assert ns_client.list_tables() == ["t"]
    assert client.list_tables() == ["t"]
    m2 = _bump_rest(ns_client.load_table("t"))
    ns_client.commit_table("t", 1, m2)
    assert ns_client.load_table("t").snapshot_id == 2
    assert client.load_table("t").snapshot_id == 1  # default untouched

    # non-empty -> 409 NamespaceNotEmptyException -> ValueError
    with pytest.raises(ValueError):
        client.drop_namespace("analytics")
    # creating a table in a namespace that doesn't exist -> 404
    ghost = RestCatalog(uri=client.uri, namespace="ghost")
    with pytest.raises(TableNotFound):
        ghost.create_table("t", fragmented)
    # the default namespace cannot be dropped
    with pytest.raises(ValueError):
        client.drop_namespace("default")


def test_drop_empty_namespace(client):
    client.create_namespace("tmp")
    assert client.namespace_exists("tmp")
    client.drop_namespace("tmp")
    assert not client.namespace_exists("tmp")
    assert client.list_namespaces() == ["default"]


def _bump_rest(base):
    m = Manifest.from_dict(base.to_dict())
    m.snapshot_id = base.snapshot_id + 1
    m.sequence_number = base.sequence_number + 1
    return m


def test_transaction_commits_two_tables_atomically(client, fragmented):
    """Both tables move in ONE transaction."""
    client.create_table("a", fragmented)
    client.create_table("b", fragmented)
    client.commit_transaction(
        [
            ("a", 1, _bump_rest(client.load_table("a"))),
            ("b", 1, _bump_rest(client.load_table("b"))),
        ]
    )
    assert client.load_table("a").snapshot_id == 2
    assert client.load_table("b").snapshot_id == 2


def test_transaction_stale_requirement_changes_nothing(client, fragmented):
    """A stale expectation on the SECOND table fails the whole
    transaction with retryable CommitConflict and the FIRST table's
    head unmoved — the 'both move or neither' guarantee."""
    client.create_table("a", fragmented)
    client.create_table("b", fragmented)
    # advance b out from under the transaction's expectation
    client.commit_table("b", 1, _bump_rest(client.load_table("b")))
    with pytest.raises(CommitConflict):
        client.commit_transaction(
            [
                ("a", 1, _bump_rest(client.load_table("a"))),
                ("b", 1, _bump_rest(client.load_table("b"))),  # stale: b@2
            ]
        )
    assert client.load_table("a").snapshot_id == 1  # nothing applied
    assert client.load_table("b").snapshot_id == 2


def test_transaction_over_hadoop_backing(tmp_path, fragmented):
    """The multi-table transaction rides the full-fidelity tier too."""
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    backing = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    with serve_rest_catalog(backing) as srv:
        c = RestCatalog(uri=srv.uri)
        c.create_table("x", fragmented)
        c.create_table("y", fragmented)
        c.commit_transaction(
            [
                ("x", 1, _bump_rest(c.load_table("x"))),
                ("y", 1, _bump_rest(c.load_table("y"))),
            ]
        )
        assert c.load_table("x").snapshot_id == 2
        assert c.load_table("y").snapshot_id == 2
        # and a stale txn still changes nothing
        with pytest.raises(CommitConflict):
            c.commit_transaction(
                [
                    ("x", 2, _bump_rest(c.load_table("x"))),
                    ("y", 1, _bump_rest(c.load_table("y"))),
                ]
            )
        assert c.load_table("x").snapshot_id == 2
        assert c.load_table("y").snapshot_id == 2


def test_transaction_duplicate_table_rejected(client, fragmented):
    client.create_table("a", fragmented)
    m = _bump_rest(client.load_table("a"))
    with pytest.raises(ValueError):
        client.commit_transaction([("a", 1, m), ("a", 2, m)])


# ---------------------------------------------------------------------------
# round 14 (VERDICT r13 #2): list pagination + OAuth token endpoint
# ---------------------------------------------------------------------------


def test_paginated_table_listing_over_http(tmp_path, fragmented):
    """>1 page over real HTTP: a small server-side page cap forces the
    client through the pageToken loop; the assembled listing is
    complete, duplicate-free, and raw pages carry next-page-token."""
    import json
    import urllib.request

    backing = FileCatalog(warehouse=str(tmp_path / "whp"))
    with serve_rest_catalog(backing, max_page_size=3) as srv:
        cli = RestCatalog(uri=srv.uri)
        names = [f"t{i:02d}" for i in range(8)]
        for n in names:
            cli.create_table(n, fragmented)
        # raw first page: capped at 3 with a continuation token
        with urllib.request.urlopen(
            f"{srv.uri}/v1/namespaces/default/tables?pageSize=3"
        ) as resp:
            page1 = json.loads(resp.read())
        assert len(page1["identifiers"]) == 3
        assert page1.get("next-page-token")
        # client with an explicit pageSize walks every page
        cli_paged = RestCatalog(uri=srv.uri, page_size=3)
        assert cli_paged.list_tables() == names
        # client with NO pageSize still sees everything (server caps
        # each reply and hands back a token; the client follows it)
        assert cli.list_tables() == names


def test_paginated_namespace_listing_over_http(tmp_path):
    backing = FileCatalog(warehouse=str(tmp_path / "whn"))
    with serve_rest_catalog(backing, max_page_size=2) as srv:
        cli = RestCatalog(uri=srv.uri, page_size=2)
        for ns in ("alpha", "beta", "gamma", "delta"):
            cli.create_namespace(ns)
        assert cli.list_namespaces() == [
            "alpha", "beta", "default", "delta", "gamma",
        ]


def test_oauth_client_credentials_flow(tmp_path, fragmented):
    """The spec's POST /v1/oauth/tokens: a client configured with only
    a credential pair obtains its bearer token lazily, uses it for
    real calls, re-grants once on 401 (token revocation / server
    restart), and bad credentials are refused."""
    backing = FileCatalog(warehouse=str(tmp_path / "who"))
    with serve_rest_catalog(backing, credential="svc:hunter2") as srv:
        cli = RestCatalog(uri=srv.uri, credential="svc:hunter2")
        assert cli.token is None
        cli.create_table("t", fragmented)  # first call triggers grant
        assert cli.token is not None
        assert cli.table_exists("t")
        # bad credential: loud 401 at grant time
        bad = RestCatalog(uri=srv.uri, credential="svc:wrong")
        with pytest.raises(RuntimeError, match="401"):
            bad.list_tables()
        # no token at all: requests are refused
        anon = RestCatalog(uri=srv.uri)
        with pytest.raises(RuntimeError, match="401"):
            anon.list_tables()
        # revoke every issued token (simulates expiry/restart): the
        # client transparently re-grants ONCE and succeeds
        old = cli.token
        srv._httpd.RequestHandlerClass.issued_tokens.clear()
        assert cli.load_table("t").snapshot_id >= 1
        assert cli.token != old


def test_oauth_token_natural_expiry_triggers_regrant(tmp_path, fragmented):
    """ADVICE r14: issued tokens expire server-side after the
    advertised expires_in (issue timestamps recorded, stale entries
    dropped so the set stays bounded), and the client's 401 re-grant
    path runs on NATURAL expiry — not only on explicit revocation."""
    backing = FileCatalog(warehouse=str(tmp_path / "whe"))
    with serve_rest_catalog(
        backing, credential="svc:pw", token_expires_in=3600
    ) as srv:
        cli = RestCatalog(uri=srv.uri, credential="svc:pw")
        cli.create_table("t", fragmented)
        handler = srv._httpd.RequestHandlerClass
        old = cli.token
        assert old in handler.issued_tokens
        # age the token past expires_in (no sleeping: rewind its
        # recorded issue time) — the next call 401s, the client
        # re-grants transparently, and the stale entry is dropped
        handler.issued_tokens[old] -= 3601
        assert cli.load_table("t").snapshot_id >= 1
        assert cli.token != old
        assert old not in handler.issued_tokens
        assert cli.token in handler.issued_tokens


def test_oauth_rejects_unsupported_grant(tmp_path):
    import urllib.error
    import urllib.request

    backing = FileCatalog(warehouse=str(tmp_path / "whg"))
    with serve_rest_catalog(backing, credential="a:b") as srv:
        req = urllib.request.Request(
            f"{srv.uri}/v1/oauth/tokens",
            data=b"grant_type=password&username=u&password=p",
            method="POST",
        )
        req.add_header(
            "Content-Type", "application/x-www-form-urlencoded"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400


def test_config_prefix_route_handshake(tmp_path, fragmented):
    """The spec's route prefix: a prefixed server advertises it via
    /v1/config overrides (which clients MUST apply); a client that
    does the config handshake works end-to-end through the prefixed
    routes, while unprefixed or wrong-prefixed catalog paths 404."""
    import json
    import urllib.error
    import urllib.request

    backing = FileCatalog(warehouse=str(tmp_path / "whpfx"))
    with serve_rest_catalog(backing, prefix="tenant1") as srv:
        cli = RestCatalog(uri=srv.uri)
        cfg = cli.fetch_config()  # unprefixed by spec
        assert cfg["overrides"]["prefix"] == "tenant1"
        assert cli.prefix == "tenant1"
        cli.create_table("t", fragmented)
        assert cli.list_tables() == ["t"]
        assert cli.load_table("t").snapshot_id == 1
        # raw prefixed route works
        with urllib.request.urlopen(
            f"{srv.uri}/v1/tenant1/namespaces/default/tables"
        ) as resp:
            assert [
                i["name"] for i in json.loads(resp.read())["identifiers"]
            ] == ["t"]
        # unprefixed and wrong-prefixed catalog routes are 404
        for path in (
            "/v1/namespaces/default/tables",
            "/v1/tenant2/namespaces/default/tables",
        ):
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(f"{srv.uri}{path}")
            assert ei.value.code == 404, path
        # a client that skips the handshake gets the 404 (loud, not
        # silently wrong-tenant)
        naive = RestCatalog(uri=srv.uri)
        with pytest.raises(Exception):
            naive.load_table("t")


def test_head_endpoints_re_grant_on_401(tmp_path, fragmented):
    """Code-review r14: the token-rotation recovery must cover the
    HEAD probes too — table_exists/namespace_exists re-grant once on
    401 like every JSON endpoint."""
    backing = FileCatalog(warehouse=str(tmp_path / "whh"))
    with serve_rest_catalog(backing, credential="svc:pw") as srv:
        cli = RestCatalog(uri=srv.uri, credential="svc:pw")
        cli.create_table("t", fragmented)
        # revoke all issued tokens (rotation/restart)
        srv._httpd.RequestHandlerClass.issued_tokens.clear()
        assert cli.table_exists("t") is True  # transparent re-grant
        srv._httpd.RequestHandlerClass.issued_tokens.clear()
        assert cli.namespace_exists("default") is True
        srv._httpd.RequestHandlerClass.issued_tokens.clear()
        assert cli.table_exists("nope") is False


# ---------------------------------------------------------------------------
# round 15 (VERDICT r14 #8): server-side scan planning — the spec's
# plan / plan-id / tasks surface, feature-detected via config endpoints
# ---------------------------------------------------------------------------


def test_scan_planning_server_side_end_to_end(spark, tmp_path, fragmented):
    """An HTTP client drives a table scan fully through SERVER-side
    planning: the filter ships as the spec's JSON expression, the
    server prunes files against their column bounds (6 of 8 never
    cross the wire), and the planned manifest reads through the
    ordinary engine read path to the exact filtered result."""
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    backing = FileCatalog(warehouse=str(tmp_path / "whp"))
    with serve_rest_catalog(backing) as srv:
        cli = RestCatalog(uri=srv.uri)
        cli.create_table("t", fragmented)
        assert cli.supports_scan_planning() is True
        planned = cli.plan_table_scan("t", where="id >= 96")
        # files hold ids [0,16) ... [112,128): bounds prove only 2 match
        assert len(planned.data_files) == 2
        assert all(
            t.column_bounds["id"][1] >= 96 for t in planned.data_files
        )
        df = read_table_mor(spark, planned).where("id >= 96")
        assert sorted(r["id"] for r in df.collect()) == list(range(96, 128))
        # unfiltered plan returns everything
        assert len(cli.plan_table_scan("t").data_files) == 8


def test_scan_planning_chunked_plan_tasks(tmp_path, fragmented):
    """A server bounding its responses chunks the plan into opaque
    plan-tasks; the client fetches every chunk via POST .../tasks and
    the union is the full plan.  Unknown plan-tasks are a loud 404."""
    backing = FileCatalog(warehouse=str(tmp_path / "whc"))
    with serve_rest_catalog(backing, plan_task_size=3) as srv:
        cli = RestCatalog(uri=srv.uri)
        cli.create_table("t", fragmented)
        planned = cli.plan_table_scan("t")
        assert len(planned.data_files) == 8
        assert len({t.data_file_path for t in planned.data_files}) == 8
        # raw: the plan response itself carries handles, not tasks
        raw = cli._request(
            "POST",
            cli._url("namespaces", "default", "tables", "t", "plan"),
            {},
        )
        assert raw["status"] == "completed"
        assert len(raw["plan-tasks"]) == 3  # ceil(8 / 3)
        assert "file-scan-tasks" not in raw
        with pytest.raises(RuntimeError, match="404"):
            cli._request(
                "POST",
                cli._url("namespaces", "default", "tables", "t", "tasks"),
                {"plan-task": "nope:0"},
            )


def test_scan_planning_async_lifecycle(tmp_path, fragmented):
    """plan_async servers answer 'submitted'; the client polls GET
    /plan/{plan-id} to completion; DELETE cancels and a later fetch is
    404."""
    backing = FileCatalog(warehouse=str(tmp_path / "wha"))
    with serve_rest_catalog(backing, plan_async=True) as srv:
        cli = RestCatalog(uri=srv.uri)
        cli.create_table("t", fragmented)
        planned = cli.plan_table_scan("t", where="id < 16")
        assert len(planned.data_files) == 1
        # raw lifecycle: submit -> fetch -> cancel -> 404
        raw = cli._request(
            "POST",
            cli._url("namespaces", "default", "tables", "t", "plan"),
            {},
        )
        assert raw["status"] == "submitted" and raw["plan-id"]
        pid = raw["plan-id"]
        got = cli._request(
            "GET",
            cli._url("namespaces", "default", "tables", "t", "plan", pid),
        )
        assert got["status"] == "completed"
        assert len(got["file-scan-tasks"]) == 8
        cli.cancel_plan("t", pid)
        with pytest.raises(RuntimeError, match="404"):
            cli._request(
                "GET",
                cli._url(
                    "namespaces", "default", "tables", "t", "plan", pid
                ),
            )


def test_scan_planning_feature_detection(tmp_path, fragmented):
    """A server without the capability advertises no plan endpoints;
    the client raises ScanPlanningUnsupported (fall back to
    client-side planning) and the routes themselves 404."""
    from iceberg_compaction_spark.sources.rest_catalog import (
        ScanPlanningUnsupported,
    )

    backing = FileCatalog(warehouse=str(tmp_path / "whn"))
    with serve_rest_catalog(backing, scan_planning=False) as srv:
        cli = RestCatalog(uri=srv.uri)
        cli.create_table("t", fragmented)
        assert cli.supports_scan_planning() is False
        with pytest.raises(ScanPlanningUnsupported):
            cli.plan_table_scan("t")
        with pytest.raises(Exception, match="not enabled"):
            cli._request(
                "POST",
                cli._url("namespaces", "default", "tables", "t", "plan"),
                {},
            )


def test_scan_planning_rejects_inexpressible_filter(tmp_path, fragmented):
    """Filter shapes the planner cannot express (or-trees) are a loud
    400 — the spec lets a server reject plans; silent full-scan would
    misreport pruning."""
    backing = FileCatalog(warehouse=str(tmp_path / "whr"))
    with serve_rest_catalog(backing) as srv:
        cli = RestCatalog(uri=srv.uri)
        cli.create_table("t", fragmented)
        bad = {
            "type": "or",
            "left": {"type": "eq", "term": "id", "value": ["int", 1]},
            "right": {"type": "eq", "term": "id", "value": ["int", 2]},
        }
        with pytest.raises(RuntimeError, match="400"):
            cli._request(
                "POST",
                cli._url("namespaces", "default", "tables", "t", "plan"),
                {"filter": bad},
            )


def test_scan_planning_snapshot_pinned(tmp_path, fragmented):
    """snapshot-id pins planning to a historical snapshot: a later
    append is invisible to the pinned plan."""
    import os as _os

    backing = FileCatalog(warehouse=str(tmp_path / "whs"))
    root = _os.path.dirname(fragmented.data_files[0].data_file_path)
    with serve_rest_catalog(backing) as srv:
        cli = RestCatalog(uri=srv.uri)
        m1 = cli.create_table("t", fragmented)
        ids = list(range(128, 144))
        pq.write_table(
            pa.table({"id": pa.array(ids, type=pa.int64())}),
            _os.path.join(root, "part8.parquet"),
        )
        m2 = Manifest.from_parquet_dir(root, sequence_number=2)
        m2.snapshot_id = m1.snapshot_id + 1
        m2.operation = "append"
        cli.commit_table("t", m1.snapshot_id, m2)
        assert len(cli.plan_table_scan("t").data_files) == 9
        pinned = cli.plan_table_scan("t", snapshot_id=m1.snapshot_id)
        assert len(pinned.data_files) == 8
