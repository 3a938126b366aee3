"""Property-based tests (hypothesis) for the pure planning math — the
invariants the reference pins with stress loops, generalized to random
inputs: packing conservation, split balance/determinism, output-file
sizing bounds."""

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_compaction_spark.plans.packer import ListPacker
from iceberg_compaction_spark.plans.parallelism import (
    default_max_file_size,
    default_min_file_size,
    expected_output_files,
    input_split_size,
    write_max_file_size,
)
from iceberg_compaction_spark.plans.datamodel import FileScanTask
from iceberg_compaction_spark.sources.scan import split_n_vecs

weights = st.lists(st.integers(min_value=0, max_value=10**12), max_size=60)


@settings(max_examples=200, deadline=None)
@given(weights, st.integers(min_value=0, max_value=10**12), st.integers(1, 5))
def test_packer_conserves_items(ws, target, lookback):
    packer = ListPacker(target_weight=target, lookback=lookback)
    bins = packer.pack(list(enumerate(ws)), lambda it: it[1])
    flat = sorted(i for b in bins for (i, _w) in b)
    assert flat == list(range(len(ws)))  # every item exactly once
    for b in bins:
        assert b  # no empty bins


@settings(max_examples=200, deadline=None)
@given(weights, st.integers(min_value=1, max_value=10**12), st.integers(1, 5))
def test_packer_respects_target_unless_single_oversize(ws, target, lookback):
    packer = ListPacker(target_weight=target, lookback=lookback)
    for b in packer.pack_decreasing(list(enumerate(ws)), lambda it: it[1]):
        total = sum(w for (_i, w) in b)
        assert total <= target or len(b) == 1


@settings(max_examples=100, deadline=None)
@given(weights, st.integers(min_value=1, max_value=16))
def test_split_n_vecs_conserves_and_bounds(ws, n):
    tasks = [FileScanTask(data_file_path=f"/f{i}", length=w) for i, w in enumerate(ws)]
    groups = split_n_vecs(tasks, n)
    assert len(groups) == n
    flat = sorted(t.data_file_path for g in groups for t in g)
    assert flat == sorted(t.data_file_path for t in tasks)
    # balance bound for the greedy heap: max group <= min group + max item
    if ws:
        totals = [sum(t.length for t in g) for g in groups]
        assert max(totals) <= min(totals) + max(ws)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**14),
    st.integers(min_value=1, max_value=2 * 10**9),
)
def test_expected_output_files_sizing_bounds(input_size, target):
    n = expected_output_files(input_size, target)
    assert n >= 1
    if input_size < target:
        assert n == 1
    else:
        # the remainder rules keep the average below write-max and above
        # half a target (ceil(input/target) can halve the average in the
        # worst case, e.g. input=7 target=6 -> 2 files of 3.5)
        avg = input_size / n
        assert avg <= write_max_file_size(target, default_max_file_size(target)) + 1
        assert avg >= target / 2


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**14),
    st.integers(min_value=1, max_value=2 * 10**9),
)
def test_input_split_size_clamped(input_size, target):
    s = input_split_size(input_size, target)
    assert s >= target
    assert s <= max(
        target, write_max_file_size(target, default_max_file_size(target))
    )


@settings(max_examples=500, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=8, max_value=32),
    st.integers(min_value=0, max_value=6),
    st.data(),
)
def test_simhash_band_pigeonhole_guarantee(fp, bits, max_hamming, data):
    """Any fingerprint within `max_hamming` bit flips of another must
    share at least one of the max_hamming+1 disjoint bands — the
    no-false-negative guarantee simhash_banded_pairs relies on."""
    from iceberg_compaction_spark.operators.dedup import _band_layout

    fp &= (1 << bits) - 1
    n_flips = data.draw(st.integers(min_value=0, max_value=max_hamming))
    positions = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=bits - 1),
            min_size=n_flips,
            max_size=n_flips,
            unique=True,
        )
    )
    fp2 = fp
    for p in positions:
        fp2 ^= 1 << p
    layout = _band_layout(bits, max_hamming + 1)
    shared = any(
        (fp >> off) & ((1 << w) - 1) == (fp2 >> off) & ((1 << w) - 1)
        for off, w in layout
    )
    assert shared


@settings(max_examples=100, deadline=None)
@st.composite
def _manifests(draw):
    from iceberg_compaction_spark.plans.datamodel import (
        EQUALITY_DELETE,
        POSITION_DELETE,
        DeleteFile,
    )

    n = draw(st.integers(0, 5))
    tasks = []
    for i in range(n):
        deletes = []
        for j in range(draw(st.integers(0, 2))):
            eq = draw(st.booleans())
            deletes.append(
                DeleteFile(
                    path=f"/t/del{i}_{j}.parquet",
                    content=EQUALITY_DELETE if eq else POSITION_DELETE,
                    file_size_in_bytes=draw(st.integers(1, 10**9)),
                    sequence_number=draw(st.integers(0, 100)),
                    equality_ids=("id",) if eq else (),
                )
            )
        tasks.append(
            FileScanTask(
                data_file_path=f"/t/d{i}.parquet",
                length=draw(st.integers(1, 10**12)),
                record_count=draw(st.integers(0, 10**9)),
                sequence_number=draw(st.integers(0, 100)),
                partition=tuple(
                    draw(
                        st.lists(
                            st.one_of(st.integers(), st.text(max_size=5)),
                            max_size=2,
                        )
                    )
                ),
                deletes=deletes,
            )
        )
    from iceberg_compaction_spark.sources.manifest import Manifest

    return Manifest(
        table_root="/t",
        snapshot_id=draw(st.integers(0, 1000)),
        sequence_number=draw(st.integers(0, 1000)),
        schema_id=draw(st.integers(0, 10)),
        format_version=draw(st.sampled_from([2, 3])),
        data_files=tasks,
        properties=draw(
            st.dictionaries(st.text(max_size=8), st.text(max_size=8), max_size=3)
        ),
    )


def _roundtrip(m):
    from iceberg_compaction_spark.sources.manifest import Manifest

    return Manifest.from_dict(m.to_dict())


@settings(max_examples=100, deadline=None)
@given(_manifests())
def test_manifest_dict_roundtrip_exact(m):
    """The catalog wire format (to_dict/from_dict — also what the REST
    payloads carry) must round-trip every field exactly, including
    per-task delete attachments and no properties aliasing."""
    r = _roundtrip(m)
    assert r.to_dict() == m.to_dict()
    assert r.snapshot_id == m.snapshot_id
    assert r.sequence_number == m.sequence_number
    assert r.schema_id == m.schema_id
    assert r.format_version == m.format_version
    assert [t.data_file_path for t in r.data_files] == [
        t.data_file_path for t in m.data_files
    ]
    for a, b in zip(r.data_files, m.data_files):
        assert a.sequence_number == b.sequence_number
        assert a.record_count == b.record_count
        assert [(d.path, d.content, d.sequence_number) for d in a.deletes] == [
            (d.path, d.content, d.sequence_number) for d in b.deletes
        ]
    # properties must be a COPY, not an alias
    r.properties["__mut"] = "x"
    assert "__mut" not in m.properties
