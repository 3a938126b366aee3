"""Skew-aware join utilities for the 100 TB path.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``) splits
oversized shuffle partitions at runtime and is the first line of defense.
These helpers cover the cases AQE can't fix:

- ``salted_inner_join``: explicit key salting for a shuffle join whose
  hot keys would overwhelm single reducers even after AQE splitting
  (AQE splits partitions, but one *key* still lands in one partition for
  aggregations layered on the join output).  The big side gets a random
  salt in [0, n); the small side is exploded n-fold so every
  (key, salt) bucket can match.  n multiplies the small side — keep it
  ≤ ~32 and the small side per-key rows modest.
- ``skewed_keys``: find hot keys by sampled frequency so salting can be
  applied to ONLY the hot keys (two-path join: salted hot keys union
  plain cold keys) — the standard production pattern when the hot-key
  set is small and the small side is too big to explode wholesale.

These compose with the MOR equality-delete join when delete keys are
pathologically hot (e.g. one device id accounts for half the deletes);
the anti-join semantics are preserved because every salted copy of a
delete row still matches exactly the data rows it matched before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def salted_inner_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the keys salted ``n_salts`` ways.

    ``big`` gains a uniform random salt per row; ``small`` is exploded to
    all salts, so the join key becomes (key..., salt) — hot keys spread
    over ``n_salts`` reducers instead of one.  Supported ``how``:
    inner / left_semi / left_anti (the joins our engine issues).
    """
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(f"unsupported join type for salting: {how}")
    salt = (F.rand(seed=42) * n_salts).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def skewed_keys(
    df: DataFrame,
    on: list[str],
    threshold_rows: int,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Distinct key combos whose (estimated) frequency exceeds
    ``threshold_rows``.

    With ``sample_fraction`` the count runs on a sample and scales up —
    at 100 TB the exact pass is itself a full shuffle, while a 1% sample
    finds any key hot enough to matter (hot means millions of rows).
    """
    src = df.select(*on)
    scale = 1.0
    if sample_fraction is not None:
        src = src.sample(fraction=sample_fraction, seed=42)
        scale = 1.0 / sample_fraction
    return (
        src.groupBy(*on)
        .agg((F.count(F.lit(1)) * F.lit(scale)).alias("__est_rows"))
        .where(F.col("__est_rows") >= threshold_rows)
        .select(*on)
    )


def two_path_left_anti(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    hot: DataFrame,
    n_salts: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Left-anti join with salting applied only to hot keys.

    ``hot`` is a (small, broadcastable) DataFrame of hot key combos —
    typically from :func:`skewed_keys`.  Rows with cold keys take the
    plain anti-join; rows with hot keys take the salted anti-join; the
    union is the exact anti-join result (the two key populations are
    disjoint).
    """
    hot_b = F.broadcast(hot.dropDuplicates())
    big_hot = big.join(hot_b, on=on, how="left_semi")
    big_cold = big.join(hot_b, on=on, how="left_anti")
    small_hot = small.join(hot_b, on=on, how="left_semi")

    cold_out = big_cold.join(small, on=on, how="left_anti")
    hot_out = salted_inner_join(big_hot, small_hot, on, n_salts, how="left_anti")
    return cold_out.unionByName(hot_out)
