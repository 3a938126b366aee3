"""Oracle verification for EVERY registered query.

The driver's correctness gate compares the FIRST 50 ``queries()``
entries against their DuckDB oracles; round 4 proved that checking only
the tail here leaves in-window entries invisible to pytest (the
ann_kmeans_iteration miss shipped with a 244-green suite).  This suite
now runs the rows/columns/value-hash comparison for ALL entries at
sf0.001 — in-window and tail alike — so a red driver row can no longer
coexist with a green pytest run.

Budgeting (r16, VERDICT r15 item 2a): the full 146-entry sweep pushed
the DEFAULT suite past the driver's verify wall-clock budget, so the
sweep is marked ``oracle_tail`` and deselected by default (pytest.ini).
Run it with ``pytest -m oracle_tail``; the same comparison also runs
for all 146 entries in ``tools/oracle_check.py`` (sf0.001 and sf0.01),
which is the round-close gate of record.  The static oracle-convention
check below stays in the default run (it is instant).
"""

import hashlib

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
# sketch-based queries whose output is approximate by construction
APPROX_NO_ORACLE = {"events_hourly_users_approx"}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        if v == v.to_integral_value():
            return str(int(v))
        return f"{float(v):.10g}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _table_hash(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _all_names():
    from iceberg_compaction_spark import registry

    return list(registry.QUERIES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.oracle_tail
@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, duck, name):
    from iceberg_compaction_spark import registry

    sdf = registry.QUERIES[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    if name in APPROX_NO_ORACLE:
        # approximate-by-construction: value oracle impossible; error
        # bound vs the exact twin is pinned in test_extensions.py —
        # here just assert the query runs and produces rows
        assert len(srows) > 0
        return
    assert name in registry.ORACLES, (
        f"query {name} has no oracle — either add one or mark it "
        "approximate (APPROX_NO_ORACLE) with a pinned error-bound test"
    )
    # Arrow fetch, like the driver: surfaces HUGEINT degradation
    atbl = duck.sql(registry.ORACLES[name]).arrow()
    ocols = [c.lower() for c in atbl.column_names]
    orows = [tuple(d.values()) for d in atbl.to_pylist()]

    assert len(srows) == len(orows), f"{name}: row counts differ"
    assert sorted(scols) == sorted(ocols), (
        f"{name}: columns differ: {scols} vs {ocols}"
    )
    assert _table_hash(scols, srows) == _table_hash(ocols, orows), (
        f"{name}: value hash mismatch"
    )


def test_no_bare_bigint_sums_in_oracles():
    """DuckDB SUM(BIGINT) returns HUGEINT (decimal128 over Arrow), which
    the driver's value hash renders differently from Spark's int64 even
    when the values are equal — the exact mismatch that made
    ann_kmeans_iteration red in round 4 while this suite was green (the
    local Decimal normalization masks it).  Enforce the repo convention
    statically: every SUM in an oracle must be wrapped in CAST(...).
    """
    import re

    from iceberg_compaction_spark import registry

    offenders = []
    for name, sql in registry.ORACLES.items():
        # \b so list_sum(...) (an elementwise list function, not the
        # SQL aggregate) doesn't false-positive
        for m in re.finditer(r"\bSUM\s*\(", sql, flags=re.IGNORECASE):
            if sql[max(0, m.start() - 1)].isalnum() or sql[
                max(0, m.start() - 1)
            ] == "_":
                continue
            prefix = sql[max(0, m.start() - 5):m.start()]
            if not prefix.upper().endswith("CAST("):
                offenders.append(name)
                break
    assert not offenders, (
        f"bare SUM( in oracle SQL (wrap in CAST(... AS BIGINT)): {offenders}"
    )
