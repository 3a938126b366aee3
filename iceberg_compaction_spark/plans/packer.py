"""First-Fit-Decreasing list packer (L6).

Same observable behavior as the reference's `ListPacker`
(core/src/file_selection/packer.rs:31-132): pack items into bins of
`target_weight` using first-fit-decreasing with a configurable lookback
(the reference uses lookback=1 — only the most recently opened bin is
considered).  `target_weight=0` means a single bin.  Items larger than the
target get their own bin.

This is pure driver-side metadata math — at 100 TB a table is ~1e5 files,
trivially packable in Python; no Spark job needed.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import TypeVar

T = TypeVar("T")


class ListPacker:
    def __init__(self, target_weight: int, lookback: int = 1) -> None:
        if lookback < 1:
            raise ValueError("lookback must be >= 1")
        self.target_weight = target_weight
        self.lookback = lookback

    def pack(
        self, items: Sequence[T], weight_fn: Callable[[T], int]
    ) -> list[list[T]]:
        """Pack in the given order (first-fit with lookback)."""
        if self.target_weight == 0:
            return [list(items)] if items else []
        bins: list[tuple[list[T], int]] = []  # (items, current weight)
        for item in items:
            w = weight_fn(item)
            placed = False
            for i in range(len(bins) - 1, max(-1, len(bins) - 1 - self.lookback), -1):
                contents, cur = bins[i]
                if cur + w <= self.target_weight:
                    contents.append(item)
                    bins[i] = (contents, cur + w)
                    placed = True
                    break
            if not placed:
                bins.append(([item], w))
        return [b[0] for b in bins]

    def pack_decreasing(
        self, items: Sequence[T], weight_fn: Callable[[T], int]
    ) -> list[list[T]]:
        """First-fit-decreasing: sort by weight desc (stable), then pack."""
        ordered = sorted(items, key=weight_fn, reverse=True)
        return self.pack(ordered, weight_fn)
