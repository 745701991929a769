"""Oracle parity tests: every §2 query with a DuckDB twin must match
on row count, column names, and order-insensitive value hash — the
same comparison the external driver runs (SURVEY.md §5.1)."""

import decimal
import hashlib

import pytest

from github_issues_lakehouse_spark import queries as Q

from .conftest import SF_DIR

QUERIES = Q.queries()
ORACLES = Q.oracle_sql()


def canon(rows, cols, strict=False, decfloat=False):
    # Strict typed rendering — keep in sync with tools/verify_local.py.
    # None gets a sentinel distinct from '' (an ''-vs-NULL divergence must
    # FAIL here, as it does at the driver), and floats never collapse to
    # ints (so a bigint-vs-HUGEINT/float engine asymmetry also fails).
    # strict=True hashes full float repr with no 9dp rounding — the
    # mode that exposes sub-1e-9 engine drift (VERDICT r3 task 4).
    # decfloat=True renders Decimal via repr(float(v)) — the r4 driver
    # canon class that strips trailing fractional zeros.
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if v is None:
                vals.append("\x00NULL")
            elif isinstance(v, bool):
                vals.append(str(v))
            elif isinstance(v, float):
                vals.append("nan" if v != v else (repr(v) if strict else repr(round(v, 9))))
            elif isinstance(v, decimal.Decimal) and decfloat:
                vals.append(repr(float(v)))
            elif isinstance(v, (bytes, bytearray)):
                vals.append("0x" + bytes(v).hex())
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.md5("\x02".join(out).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [list(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = [list(r) for r in res.fetchall()]
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    # both canon modes must agree (the driver's hash may be unrounded)
    assert canon(srows, sdf.columns) == canon(drows, dcols)
    assert canon(srows, sdf.columns, strict=True) == canon(drows, dcols, strict=True)
    # decimal-render invariance (VERDICT r4 task 2): the driver's canon
    # renders Decimal without trailing fractional zeros, so each side's
    # hash must not change when Decimals are floated. A trailing-zero
    # decimal value anywhere fails HERE before it fails at the driver.
    assert canon(srows, sdf.columns, strict=True) == canon(
        srows, sdf.columns, strict=True, decfloat=True
    ), "Spark result has trailing-zero Decimal values (r4 driver-FAIL class)"
    assert canon(drows, dcols, strict=True) == canon(
        drows, dcols, strict=True, decfloat=True
    ), "Oracle result has trailing-zero Decimal values (r4 driver-FAIL class)"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


@pytest.mark.parametrize(
    "name",
    [
        # every timestamp-arithmetic flavor: LTZ events (windows, date
        # grouping), NTZ orders (date rendering, month keys), and the
        # resolution-hours epoch math in the gold mart
        "windowed_agg_events",
        "daily_gapfill_events",
        "bronze_issues",
        "null_semantics_orders",
        "date_arith_orders",
        "gold_kpi_global",
        # r2 third-batch timestamp operators: day bucketing in the
        # concurrency sweep, epoch-microsecond RANGE frames
        "concurrent_sessions",
        "trailing_window_user_value",
    ],
)
def test_oracle_match_under_foreign_timezone(name, spark, duck):
    """The external driver runs queries in ITS session, not ours —
    which may not be UTC. Every query must produce oracle-identical
    results under a hostile session timezone (non-whole-hour offset
    zones shift even hourly window boundaries)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")  # +05:30
    try:
        sdf = QUERIES[name](spark, SF_DIR)
        srows = [list(r) for r in sdf.collect()]
        res = duck.execute(ORACLES[name])
        dcols = [d[0] for d in res.description]
        drows = [list(r) for r in res.fetchall()]
        assert sorted(sdf.columns) == sorted(dcols)
        assert len(srows) == len(drows)
        assert canon(srows, sdf.columns) == canon(drows, dcols)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
