"""ListPacker (L6) behavior tests.

Same observable contract as the reference's packer tests
(core/src/file_selection/packer.rs:134-427): FFD packing, zero target =>
single bin, oversize items get their own bin, lookback limits which bins
are considered.
"""

from iceberg_compaction_spark.plans.packer import ListPacker


def w(x):
    return x


def test_empty():
    assert ListPacker(100).pack([], w) == []
    assert ListPacker(0).pack([], w) == []


def test_zero_target_single_bin():
    assert ListPacker(0).pack([5, 10, 200], w) == [[5, 10, 200]]


def test_simple_packing():
    bins = ListPacker(10).pack_decreasing([6, 4, 5, 5], w)
    # FFD: sorted desc 6,5,5,4 -> [6,?] 5 doesn't fit with lookback on [6]? 6+5>10 new bin [5], 5 fits [5,5], 4 fits? 5+5+4>10 -> new [4]
    assert sorted(sum(b) for b in bins) == [4, 6, 10]


def test_oversize_item_own_bin():
    bins = ListPacker(10).pack_decreasing([25, 3, 2], w)
    assert [25] in bins
    assert sorted(x for b in bins for x in b) == [2, 3, 25]


def test_lookback_one_only_checks_newest_bin():
    # order: 9, 2 -> bin [9]; 2 doesn't fit -> [2]; then 1 fits newest [2,1]
    bins = ListPacker(10, lookback=1).pack([9, 2, 1], w)
    assert bins == [[9], [2, 1]]


def test_larger_lookback_reuses_older_bins():
    bins = ListPacker(10, lookback=2).pack([9, 2, 1], w)
    # with lookback 2 the 1 can land in [9] (checked newest-first: [2] has room too)
    assert bins == [[9], [2, 1]] or bins == [[9, 1], [2]]
    assert sorted(x for b in bins for x in b) == [1, 2, 9]


def test_all_fit_single_bin():
    assert ListPacker(100).pack_decreasing([10, 20, 30], w) == [[30, 20, 10]]


def test_deterministic():
    items = [7, 3, 9, 1, 5, 5, 2, 8]
    ref = ListPacker(10).pack_decreasing(items, w)
    for _ in range(50):
        assert ListPacker(10).pack_decreasing(items, w) == ref
