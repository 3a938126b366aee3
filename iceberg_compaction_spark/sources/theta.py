"""Theta sketches: Apache DataSketches-compatible distinct-counting for
the ``apache-datasketches-theta-v1`` puffin blob type (Iceberg puffin
spec, "blob types") — the NDV payload ``compute_table_stats`` writes
into a table's registered StatisticsFile.

Everything here derives from PUBLIC specifications:

- MurmurHash3 x64 128 — Austin Appleby's public-domain reference
  algorithm, the hash the DataSketches library uses (seed 9001 is the
  library's ``DEFAULT_UPDATE_SEED``).
- The compact theta sketch serial format (serial version 3) — the
  Apache DataSketches documented binary layout: an 8-byte preamble
  (preLongs / serVer / family / flags / seedHash), an optional
  retained-count long, an optional theta long, then the retained
  64-bit hash values in ascending order.
- Value-to-bytes conversion — Iceberg's single-value binary
  serialization (Iceberg table spec, Appendix D), which the puffin spec
  names as the theta blob's update encoding: ints 4-byte LE, longs /
  timestamps 8-byte LE, float/double IEEE LE, strings UTF-8.

The sketch itself is the classic KMV/theta estimator: keep the k
smallest distinct 63-bit hashes; if fewer than k values were ever seen
the sketch is EXACT (theta = 2^63, estimate = retained count),
otherwise theta is the (k+1)-th smallest hash and the estimate is
``retained * 2^63 / theta``.  Union (the distributed merge) is
``min`` over thetas + re-trim — which is why per-executor partial
sketches combine losslessly into one table-level sketch.

Interop, proven in tests/test_theta.py against the datasketches-java
library Spark bundles: murmur output is bit-identical to the Java
``MurmurHash3`` for every input length; EXACT-mode serialized sketches
are BYTE-IDENTICAL to ``UpdateSketch.compact(true, null)``; Java
``Sketches.heapifySketch`` reads this module's estimation-mode output
and returns the same estimate.  (Estimation-mode bytes differ
legitimately: the Java QuickSelect sketch retains between k and 2k
entries at compaction; this module trims strictly to the k smallest.
Both are valid compact sketches under the same estimator.)

Reference parity note: the reference engine (nimtable/iceberg-compaction)
has no statistics surface at all — this module tracks the broader
Iceberg maintenance tier (``compute_table_stats``) the repo's SURVEY
covers beyond the reference.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

MASK64 = (1 << 64) - 1
DEFAULT_UPDATE_SEED = 9001
THETA_MAX = 1 << 63  # "theta = 1.0" in the sketch's [0, 1) hash space
DEFAULT_LG_K = 12  # 4096 nominal entries, the DataSketches default

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128 (Appleby reference algorithm).  Returns the
    two 64-bit lanes; DataSketches' update hash is lane 1 >>> 1."""
    length = len(data)
    h1 = seed & MASK64
    h2 = seed & MASK64
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    if t > 8:
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        t = 8
    if t > 0:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1, h2


def compute_seed_hash(seed: int = DEFAULT_UPDATE_SEED) -> int:
    """DataSketches ``Util.computeSeedHash``: the low 16 bits of the
    murmur hash of the seed itself (as one 8-byte LE long, seed 0).
    Stored in every serialized sketch so a reader can reject a sketch
    built under a different seed."""
    h = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if h == 0:
        raise ValueError(f"seed {seed} hashes to the reserved seedHash 0")
    return h


def hash_update(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> int:
    """One update's 63-bit hash: murmur lane 1, top bit cleared (the
    DataSketches ``>>> 1``).  0 is reserved and never retained."""
    return murmur3_x64_128(data, seed)[0] >> 1


# ---- vectorized fast path for 8-byte fixed-width values --------------------
#
# An 8-byte input is a pure murmur TAIL (no 16-byte body block), so the
# whole hash is branch-free arithmetic — vectorizable with numpy uint64.
# This is the path the executor-side sketch build takes for long/int/
# date/timestamp columns; strings fall back to the scalar loop.


def _fmix64_vec(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def _hash_tail_vec(
    k1: np.ndarray, nbytes: int, seed: int
) -> np.ndarray:
    """Shared tail+final mix for ≤8-byte fixed-width inputs, given the
    zero-extended little-endian tail word per value."""
    with np.errstate(over="ignore"):
        k1 = k1 * np.uint64(_C1)
        k1 = (k1 << np.uint64(31)) | (k1 >> np.uint64(33))  # rotl 31
        k1 = k1 * np.uint64(_C2)
        h1 = np.uint64(seed) ^ k1
        h2 = np.full_like(h1, np.uint64(seed))
        h1 = h1 ^ np.uint64(nbytes)
        h2 = h2 ^ np.uint64(nbytes)
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix64_vec(h1)
        h2 = _fmix64_vec(h2)
        h1 = h1 + h2
        return h1 >> np.uint64(1)


def hash_longs_vec(
    values: np.ndarray, seed: int = DEFAULT_UPDATE_SEED
) -> np.ndarray:
    """Vectorized ``hash_update(struct.pack('<q', v))`` over an int64
    array — identical output to the scalar path (asserted in tests)."""
    return _hash_tail_vec(values.astype(np.int64).view(np.uint64), 8, seed)


def hash_ints_vec(
    values: np.ndarray, seed: int = DEFAULT_UPDATE_SEED
) -> np.ndarray:
    """Vectorized ``hash_update(struct.pack('<i', v))`` over an int32
    array (4-byte single-value serialization: int/date columns)."""
    k1 = values.astype(np.int32).view(np.uint32).astype(np.uint64)
    return _hash_tail_vec(k1, 4, seed)


# ---- Iceberg single-value serialization (table spec Appendix D) ------------


def single_value_bytes(value, iceberg_type: str) -> bytes:
    """Binary single-value serialization of one column value — the
    encoding the puffin spec names for theta updates.  ``iceberg_type``
    uses Iceberg type names (int/long/float/double/string/boolean/
    date/timestamp/timestamptz/binary)."""
    t = iceberg_type.lower()
    if t == "int" or t == "date":
        return struct.pack("<i", int(value))
    if t in ("long", "timestamp", "timestamptz", "time"):
        return struct.pack("<q", int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "string":
        return str(value).encode("utf-8")
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t == "binary":
        return bytes(value)
    raise ValueError(f"unsupported type for theta update: {iceberg_type}")


# ---- the sketch ------------------------------------------------------------

_FAMILY_COMPACT = 3
_SER_VER = 3
_FLAG_READ_ONLY = 1 << 1
_FLAG_EMPTY = 1 << 2
_FLAG_COMPACT = 1 << 3
_FLAG_ORDERED = 1 << 4


@dataclass
class ThetaSketch:
    """A compact, ordered theta sketch: retained 63-bit hashes (sorted,
    all < theta) + theta.  Build with :meth:`update_hashes`, merge
    partials with :meth:`union`, ship as :meth:`serialize` bytes."""

    lg_k: int = DEFAULT_LG_K
    theta: int = THETA_MAX
    hashes: list[int] = field(default_factory=list)
    seed: int = DEFAULT_UPDATE_SEED

    @property
    def k(self) -> int:
        return 1 << self.lg_k

    def update_hashes(self, new_hashes) -> "ThetaSketch":
        """Fold pre-hashed update values in (dedup + trim to k)."""
        s = set(self.hashes)
        theta = self.theta
        for h in new_hashes:
            h = int(h)
            if 0 < h < theta:
                s.add(h)
        return self._trim(s, theta)

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        """Theta union: min(theta), keep survivors, re-trim to k.

        Mixed-k unions are valid theta algebra (DataSketches unions
        accept any k and trim to the union gadget's k): the result uses
        min(k), which keeps the estimate unbiased — only seeds must
        match (different seeds hash the same value differently, so
        their hash sets are incomparable)."""
        if other.seed != self.seed:
            raise ValueError("union of incompatible sketches (seed)")
        theta = min(self.theta, other.theta)
        s = {h for h in self.hashes if h < theta}
        s.update(h for h in other.hashes if h < theta)
        out = ThetaSketch(
            lg_k=min(self.lg_k, other.lg_k), seed=self.seed, theta=theta
        )
        return out._trim(s, theta)

    def _trim(self, s: set, theta: int) -> "ThetaSketch":
        """Re-trim a survivor set to THIS sketch's k."""
        if len(s) > self.k:
            ordered = sorted(s)
            theta = min(theta, ordered[self.k])
            ordered = ordered[: self.k]
        else:
            ordered = sorted(s)
        return ThetaSketch(
            lg_k=self.lg_k, theta=theta, hashes=ordered, seed=self.seed
        )

    def estimate(self) -> float:
        """NDV estimate: retained / (theta / 2^63).  Exact when the
        sketch never filled (theta still 2^63)."""
        if self.theta >= THETA_MAX:
            return float(len(self.hashes))
        return len(self.hashes) * (THETA_MAX / self.theta)

    def is_exact(self) -> bool:
        return self.theta >= THETA_MAX

    # ---- DataSketches compact format (serial version 3) ----

    def serialize(self) -> bytes:
        seed_hash = compute_seed_hash(self.seed)
        if not self.hashes:
            flags = (
                _FLAG_READ_ONLY | _FLAG_EMPTY | _FLAG_COMPACT | _FLAG_ORDERED
            )
            return struct.pack(
                "<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0, flags,
                seed_hash,
            )
        flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
        if self.theta >= THETA_MAX:  # exact mode: no theta long
            pre = struct.pack(
                "<BBBBBBH", 2, _SER_VER, _FAMILY_COMPACT, 0, 0, flags,
                seed_hash,
            ) + struct.pack("<If", len(self.hashes), 1.0)
        else:
            pre = (
                struct.pack(
                    "<BBBBBBH", 3, _SER_VER, _FAMILY_COMPACT, 0, 0, flags,
                    seed_hash,
                )
                + struct.pack("<If", len(self.hashes), 1.0)
                + struct.pack("<q", self.theta)
            )
        return pre + b"".join(struct.pack("<q", h) for h in self.hashes)

    @staticmethod
    def deserialize(
        blob: bytes, seed: int = DEFAULT_UPDATE_SEED, lg_k: int = DEFAULT_LG_K
    ) -> "ThetaSketch":
        if len(blob) < 8:
            raise ValueError("theta blob too short")
        (
            pre_longs,
            ser_ver,
            family,
            lg_nom,
            _,
            flags,
            seed_hash,
        ) = struct.unpack_from("<BBBBBBH", blob, 0)
        # Recover the true k when the image carries it: this engine's
        # serialize() stays byte-identical to datasketches-java (byte 3
        # = 0, proven in test_theta.py), so lg_k rides OUTSIDE the blob
        # as a puffin/statistics property — but sketches from writers
        # that do stamp lgNomLongs (datasketches-C++ update images)
        # round-trip their own k; 0 falls back to the caller's lg_k
        # (ADVICE r12 — a non-default-k sketch used to round-trip with
        # the wrong k and then fail or mis-trim in union()).
        if lg_nom:
            lg_k = lg_nom
        if ser_ver != _SER_VER or family != _FAMILY_COMPACT:
            raise ValueError(
                f"not a compact theta sketch (serVer={ser_ver}, "
                f"family={family})"
            )
        if seed_hash != compute_seed_hash(seed):
            raise ValueError("theta sketch seedHash mismatch")
        if flags & _FLAG_EMPTY:
            return ThetaSketch(lg_k=lg_k, seed=seed)
        count = struct.unpack_from("<I", blob, 8)[0] if pre_longs >= 2 else 1
        theta = (
            struct.unpack_from("<q", blob, 16)[0]
            if pre_longs >= 3
            else THETA_MAX
        )
        off = 8 * pre_longs
        hashes = list(struct.unpack_from(f"<{count}q", blob, off))
        return ThetaSketch(lg_k=lg_k, theta=theta, hashes=hashes, seed=seed)
