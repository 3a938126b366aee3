"""``rewrite_manifests`` — small-file compaction for the table's OWN
metadata (Iceberg's ``rewrite_manifests`` maintenance procedure).

Why it exists: every real-Iceberg append commits ONE new manifest and
carries the prior ones forward in the next manifest list, so after
O(10^4) commits the CURRENT snapshot's manifest list points at O(10^4)
small Avro manifests — scan planning then opens O(commits) files before
it reads a single row.  That is exactly the small-files problem the
reference engine solves for data (``core/src/compaction/mod.rs`` —
bin-packed rewrite of undersized files), applied here to the metadata
tier: merge undersized manifests into size-targeted ones, re-point ONE
new manifest list, and commit a metadata-only ``replace`` snapshot.

Scope per catalog tier:

- **Full-fidelity tier** (``IcebergHadoopCatalog`` and the REST server
  behind it): the real operation.  Manifest entries are copied at the
  AVRO level with the SOURCE manifest's writer schema — partition
  structs, bounds, and stats written by other engines round-trip
  byte-faithfully (the engine's own entry schema carries an empty
  partition record, so a Manifest round-trip would drop them).
- **REST client** (``RestCatalog`` against a full-fidelity server):
  the same operation over the spec wire — the client writes the merged
  Avro to shared storage itself (engines always write data AND
  metadata files directly; the REST catalog's job is only to CAS the
  pointer) and commits pointer-only ``add-snapshot`` +
  ``set-snapshot-ref`` with an ``assert-ref-snapshot-id`` requirement.
  Against an engine-manifest-tier server (no physical Avro) it reports
  the fixed point.
- **Engine tier** (``FileCatalog``): each version file IS one
  self-contained JSON manifest — the current snapshot is always
  already consolidated, so the operation reports the fixed point and
  commits nothing (the version TRAIL is retention's job:
  ``expire_snapshots``).

Safety: the commit rides the same CAS as every other commit
(``commit_snapshot`` locally, the spec requirement over the wire);
losers retry from a fresh head and unlink their orphaned Avro.  Old
manifests stay on disk referenced by RETAINED prior versions —
``expire_snapshots``' reference-counted Avro cleanup removes them only
when no retained version still points at them, and
``remove_orphan_files`` never touches Avro at all.

Iceberg semantics preserved (spec "Manifests" + RewriteManifests):
- merged entries become status=EXISTING with their ORIGINAL
  ``snapshot_id`` kept — file attribution survives the rewrite;
- v2 sequence-number inheritance is made EXPLICIT at copy time (a null
  entry seq inherits the source manifest-list entry's), because
  inheritance is only defined for ADDED entries and the copies are
  EXISTING;
- manifests are only merged WITHIN a (content, partition-spec-id)
  group — data and delete manifests never mix, nor do specs;
- a manifest at-or-above the target size is kept verbatim (its list
  entry is carried over unchanged), and a merge that would not REDUCE
  a group's manifest count keeps the originals (no-progress guard) —
  so repeated runs strictly converge to a fixed point.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from iceberg_compaction_spark.sources.avro_io import (
    read_avro_file,
    write_avro_file,
)

_EXISTING, _DELETED = 0, 2  # manifest_entry.status (spec table)

DEFAULT_TARGET_MANIFEST_SIZE = 8 * 1024 * 1024  # Iceberg's
# commit.manifest.target-size-bytes default
TARGET_SIZE_PROP = "commit.manifest.target-size-bytes"


@dataclass
class ManifestRewriteStats:
    """What one rewrite pass did (mirrors the shape of
    CompactionStats/DeleteRewriteStats for MaintenanceReport)."""

    input_manifests: int = 0       # manifests in the head snapshot's list
    rewritten_manifests: int = 0   # of those, merged away
    kept_manifests: int = 0        # carried over verbatim (>= target size
    #                                or a group too small to merge)
    output_manifests: int = 0      # new size-targeted manifests written
    rewritten_entries: int = 0     # live entries copied (EXISTING)
    committed: bool = False        # False = fixed point, nothing to do
    snapshot_id: int | None = None  # the replace snapshot, when committed


def _group_key(mf: dict) -> tuple:
    return (int(mf.get("content", 0)), int(mf.get("partition_spec_id", 0)))


def _plan_groups(
    mf_entries: list[dict], target: int, min_count: int
) -> tuple[list[dict], dict]:
    """Split the manifest list into (kept entries, groups to merge).
    A group merges only when >= ``min_count`` of its manifests sit
    BELOW the target size — one small manifest has nothing to merge
    with, and at-target manifests are already right-sized."""
    groups: dict = {}
    for mf in mf_entries:
        groups.setdefault(_group_key(mf), []).append(mf)
    kept: list[dict] = []
    to_merge: dict = {}
    for key, mfs in groups.items():
        small = [m for m in mfs if int(m["manifest_length"]) < target]
        if len(small) < max(2, min_count):
            kept.extend(mfs)
            continue
        kept.extend(m for m in mfs if int(m["manifest_length"]) >= target)
        to_merge[key] = small
    return kept, to_merge


def _schema_sig(schema: dict) -> str:
    """Canonical fingerprint of a writer schema — sub-grouping key so
    manifests written under DIFFERENT schemas (schema evolution between
    commits: extra stats fields, a different partition struct) are
    never merged into one file; copying entry A with entry B's schema
    would drop or invent fields."""
    import json as _json

    return _json.dumps(schema, sort_keys=True)


def _copy_live_entries(mfs: list[dict]) -> list[tuple[dict, list, int, list]]:
    """Per writer-schema sub-group: (schema, live entries as EXISTING
    with explicit seqs, source bytes, the source manifest-list entries).
    DELETED tombstones are dropped — they exist to subtract files from
    OLDER manifests, and a merged manifest set built from the live
    state needs no subtraction."""
    groups: dict = {}
    for mf in mfs:
        mschema, entries = read_avro_file(_strip_uri(mf["manifest_path"]))
        sig = _schema_sig(mschema)
        if sig not in groups:
            groups[sig] = [mschema, [], 0, []]
        g = groups[sig]
        g[2] += int(mf["manifest_length"])
        g[3].append(mf)
        inherit_seq = int(mf.get("sequence_number", 0) or 0)
        inherit_sid = mf.get("added_snapshot_id")
        for e in entries:
            if int(e.get("status", 0)) == _DELETED:
                continue
            e = dict(e)
            e["status"] = _EXISTING
            if e.get("sequence_number") is None:
                e["sequence_number"] = inherit_seq
            if e.get("file_sequence_number") is None:
                e["file_sequence_number"] = inherit_seq
            if e.get("snapshot_id") is None:
                e["snapshot_id"] = inherit_sid
            g[1].append(e)
    return [tuple(g) for g in groups.values()]


def _strip_uri(p: str) -> str:
    return p[len("file://"):] if p.startswith("file://") else p


def _uri(p: str) -> str:
    return p if "://" in p else f"file://{os.path.abspath(p)}"


def _write_merged(
    mdir: str,
    io,
    key: tuple,
    schema: dict,
    entries: list[dict],
    src_bytes: int,
    target: int,
    snap_id: int,
) -> list[dict]:
    """Bin the copied entries into size-targeted manifests; returns the
    new manifest-list entries.  Sizing uses the measured source
    bytes-per-entry (the honest estimator at metadata scale — the
    entries being re-binned ARE the sample), re-checked nowhere: a
    drifting estimate yields an off-target manifest that the NEXT pass
    keeps (>= target) or re-merges (< target), so the fixed point
    still holds."""
    content, spec_id = key
    bpe = max(1.0, src_bytes / max(1, len(entries)))
    per = max(1, int(target / bpe))
    out: list[dict] = []
    for i in range(0, len(entries), per):
        chunk = entries[i: i + per]
        mpath = io.join(mdir, f"{uuid.uuid4().hex}-rw-m{len(out)}.avro")
        write_avro_file(
            mpath,
            schema,
            chunk,
            metadata={
                "format-version": "2",
                # spec manifest key: "data" or "deletes" by content
                "content": "data" if content == 0 else "deletes",
            },
        )
        seqs = [int(e["sequence_number"]) for e in chunk]
        out.append(
            {
                "manifest_path": _uri(mpath),
                "manifest_length": io.size(mpath),
                "partition_spec_id": spec_id,
                "content": content,
                "sequence_number": max(seqs),
                "min_sequence_number": min(seqs),
                # the snapshot performing the rewrite "adds" the new
                # manifest (spec); entry-level snapshot_id keeps the
                # files' ORIGINAL attribution
                "added_snapshot_id": snap_id,
                "added_files_count": 0,
                "existing_files_count": len(chunk),
                "deleted_files_count": 0,
                "added_rows_count": 0,
                "existing_rows_count": sum(
                    int(e["data_file"]["record_count"]) for e in chunk
                ),
                "deleted_rows_count": 0,
            }
        )
    return out


def _plan_rewrite(
    io,
    mdir: str,
    md: dict,
    head: int,
    target_override: int | None,
    min_count: int,
) -> tuple[ManifestRewriteStats, dict | None, list[str]]:
    """The tier-independent core: plan + write the merged manifests and
    the new manifest list for ``md``'s current snapshot.  Returns
    (stats, proposed add-snapshot dict or None at the fixed point,
    written paths).  The COMMIT is the caller's (catalog-local CAS or
    the REST wire); on any commit failure the caller must unlink the
    written paths before retrying."""
    snap = next(
        (
            s
            for s in md.get("snapshots") or []
            if s["snapshot-id"] == md.get("current-snapshot-id", head)
        ),
        None,
    )
    if snap is None or not snap.get("manifest-list"):
        return ManifestRewriteStats(), None, []
    target = target_override or int(
        (md.get("properties") or {}).get(
            TARGET_SIZE_PROP, DEFAULT_TARGET_MANIFEST_SIZE
        )
    )
    list_schema, mf_entries = read_avro_file(
        _strip_uri(snap["manifest-list"])
    )
    kept, to_merge = _plan_groups(mf_entries, target, min_count)
    stats = ManifestRewriteStats(
        input_manifests=len(mf_entries), kept_manifests=len(kept)
    )
    if not to_merge:
        return stats, None, []  # fixed point: nothing below target

    proposed = head + 1
    written: list[str] = []
    new_entries: list[dict] = []
    import contextlib as _ctx

    for key in sorted(to_merge):
        # sub-group by WRITER SCHEMA: manifests written under different
        # schemas (schema evolution between commits) never merge into
        # one file — copying entry A through entry B's schema would
        # drop or invent fields
        for schema, entries, src_bytes, src_mfs in _copy_live_entries(
            to_merge[key]
        ):
            if not entries:
                # all-tombstone manifests merge to nothing: dropping
                # them from the list IS the rewrite
                stats.rewritten_manifests += len(src_mfs)
                continue
            merged = _write_merged(
                mdir, io, key, schema, entries, src_bytes, target,
                proposed,
            )
            if len(merged) >= len(src_mfs):
                # no-progress guard: a merge that does not REDUCE the
                # sub-group's manifest count would churn forever
                # (sub-target outputs re-merged every pass) — keep the
                # originals and unlink the attempt
                for m in merged:
                    with _ctx.suppress(FileNotFoundError, OSError):
                        io.remove(_strip_uri(m["manifest_path"]))
                kept.extend(src_mfs)
                stats.kept_manifests += len(src_mfs)
                continue
            stats.rewritten_manifests += len(src_mfs)
            stats.rewritten_entries += len(entries)
            written.extend(
                _strip_uri(m["manifest_path"]) for m in merged
            )
            new_entries.extend(merged)
    if not (new_entries or stats.rewritten_manifests):
        return stats, None, []  # every group hit the no-progress guard
    list_path = io.join(mdir, f"snap-{proposed}-1-{uuid.uuid4().hex}.avro")
    write_avro_file(
        list_path,
        _list_out_schema(list_schema, new_entries),
        kept + new_entries,
        metadata={"format-version": "2"},
    )
    written.append(list_path)
    stats.output_manifests = len(new_entries)
    new_snap = {
        "snapshot-id": proposed,
        "parent-snapshot-id": head,
        # metadata-only: the row set is unchanged, so the sequence
        # number does not advance (delete-applies comparisons stay
        # identical)
        "sequence-number": int(md.get("last-sequence-number", 0)),
        "timestamp-ms": _now_ms(),
        "manifest-list": _uri(list_path),
        "summary": {
            "operation": "replace",
            "manifests-replaced": str(stats.rewritten_manifests),
            "manifests-created": str(len(new_entries)),
            "manifests-kept": str(len(kept)),
        },
    }
    return stats, new_snap, written


def _unlink_all(io, paths: list[str]) -> None:
    import contextlib as _ctx

    for p in paths:
        with _ctx.suppress(FileNotFoundError, OSError):
            io.remove(p)


def rewrite_manifests(
    catalog,
    name: str,
    target_manifest_size_bytes: int | None = None,
    min_count_to_merge: int = 2,
    to_branch: str | None = None,
) -> ManifestRewriteStats:
    """One rewrite pass over ``name``'s head snapshot (of ``to_branch``
    when given).  See module doc; returns what happened.  On catalogs
    whose versions are self-contained JSON manifests (the engine tier,
    or a REST client against an engine-manifest server) this reports
    the fixed point without committing."""
    import json as _json

    from iceberg_compaction_spark.commit import CommitManager

    if hasattr(catalog, "_spec_base_md"):  # RestCatalog client
        return CommitManager().commit_with_retry(
            lambda: _rest_attempt(
                catalog,
                name,
                target_manifest_size_bytes,
                min_count_to_merge,
                to_branch,
            )
        )
    if not hasattr(catalog, "commit_snapshot"):
        # engine tier: one JSON == one consolidated manifest, always
        return ManifestRewriteStats(input_manifests=1, kept_manifests=1)

    io = catalog._io
    mdir = catalog._mdir(name)

    def attempt() -> ManifestRewriteStats:
        refs = catalog.list_refs(name)
        target_ref = to_branch or "main"
        if to_branch is not None and to_branch not in refs:
            raise KeyError(f"no such branch: {to_branch!r}")
        head = (
            refs[target_ref]["snapshot_id"]
            if target_ref in refs
            else catalog._current_version(name)
        )
        md = _json.loads(io.read_bytes(catalog._vpath(name, head)))
        stats, new_snap, written = _plan_rewrite(
            io, mdir, md, head, target_manifest_size_bytes,
            min_count_to_merge,
        )
        if new_snap is None:
            return stats
        try:
            out = catalog.commit_snapshot(
                name,
                expected_snapshot_id=head,
                snapshot=new_snap,
                ref=to_branch,
            )
        except BaseException:
            # a lost CAS (or any failure) leaves this attempt's Avro
            # unreferenced forever — nothing else cleans metadata/, so
            # unlink before the retry re-plans from the fresh head
            _unlink_all(io, written)
            raise
        stats.committed = True
        stats.snapshot_id = int(out["current-snapshot-id"])
        return stats

    return CommitManager().commit_with_retry(attempt)


def _rest_attempt(
    client,
    name: str,
    target_override: int | None,
    min_count: int,
    to_branch: str | None,
) -> ManifestRewriteStats:
    """One spec-wire rewrite attempt through a RestCatalog client: the
    merged Avro is written to the server's shared metadata dir (learned
    from LoadTableResult's metadata-location) and the commit is a
    pointer-only ``add-snapshot`` + ``set-snapshot-ref`` under an
    ``assert-ref-snapshot-id`` requirement — the exact shape Spark's
    own rewrite_manifests produces against a REST catalog.  409 maps to
    CommitConflict, so the shared retry loop re-plans from the fresh
    head."""
    from iceberg_compaction_spark.sources.fileio import fileio_for

    # a load populates the tier info (mdir) and raises the documented
    # errors for a missing table/branch
    if to_branch is not None:
        client.load_table_ref(name, to_branch)
    else:
        client.load_table(name)
    if client._tier.get(name) is None:
        # engine-manifest server: no physical Avro reachable client-side
        return ManifestRewriteStats(input_manifests=1, kept_manifests=1)
    md = client._spec_base_md(name, to_branch)
    if md is None:
        return ManifestRewriteStats(input_manifests=1, kept_manifests=1)
    head = int(md["current-snapshot-id"])
    mdir = client._tier[name]["mdir"]
    mdir_local = _strip_uri(mdir)
    io = fileio_for(mdir_local)
    stats, new_snap, written = _plan_rewrite(
        io, mdir_local, md, head, target_override, min_count
    )
    if new_snap is None:
        return stats
    target_ref = to_branch or "main"
    body = {
        "requirements": [
            {
                "type": "assert-ref-snapshot-id",
                "ref": target_ref,
                "snapshot-id": head,
            }
        ],
        "updates": [
            {"action": "add-snapshot", "snapshot": new_snap},
            {
                "action": "set-snapshot-ref",
                "ref-name": target_ref,
                "type": "branch",
                "snapshot-id": new_snap["snapshot-id"],
            },
        ],
    }
    try:
        out = client._request(
            "POST",
            client._url("namespaces", client.namespace, "tables", name),
            body,
        )
    except BaseException:
        _unlink_all(io, written)
        raise
    client._note_tier(name, out, ref=to_branch is not None)
    stats.committed = True
    stats.snapshot_id = int(
        (out.get("metadata") or {}).get(
            "current-snapshot-id", new_snap["snapshot-id"]
        )
    )
    return stats


def _list_out_schema(list_schema: dict, new_entries: list[dict]) -> dict:
    """Writer schema for the REWRITTEN manifest list: the SOURCE list's
    schema when possible, so KEPT entries written by other engines
    round-trip with every field they carried (partition summaries —
    field-id 507, the manifest-level pruning tier — key_metadata, v1
    extras); the engine's schema is a field SUBSET of real Iceberg's,
    so writing with it would silently strip those.

    The source schema is usable iff (a) the NEW merged entries can
    satisfy every non-nullable source field (fields the engine doesn't
    produce must be nullable — e.g. ``partitions`` is optional in the
    spec) and (b) every field the engine's own reader relies on exists
    in it (a v1 list without ``content`` could not represent a merged
    DELETE manifest).  Otherwise fall back to the engine schema —
    correct, just narrower (current behavior, documented)."""
    engine = _manifest_file_schema()
    fields = (
        list_schema.get("fields")
        if isinstance(list_schema, dict)
        else None
    )
    if not fields:
        return engine
    src_names = {f["name"] for f in fields}
    need = {f["name"] for f in engine["fields"]}
    if not need <= src_names:
        return engine  # source list can't carry the engine's fields
    sample = new_entries[0] if new_entries else {}

    def _nullable(t) -> bool:
        return isinstance(t, list) and "null" in t

    for f in fields:
        if f["name"] not in need and not _nullable(f["type"]):
            # a required source field the engine doesn't produce: the
            # new entries couldn't be written under this schema
            if sample.get(f["name"]) is None:
                return engine
    return list_schema


def _manifest_file_schema() -> dict:
    from iceberg_compaction_spark.sources.iceberg_meta import (
        _MANIFEST_FILE_SCHEMA,
    )

    return _MANIFEST_FILE_SCHEMA


def _now_ms() -> int:
    import time as _time

    return int(_time.time() * 1000)
