"""Oracle parity tests: every §2 query with a DuckDB twin must match
on row count, column names, and order-insensitive value hash — the
same comparison the external driver runs (SURVEY.md §5.1)."""

import hashlib

import pytest

from github_issues_lakehouse_spark import queries as Q

from .conftest import SF_DIR

QUERIES = Q.queries()
ORACLES = Q.oracle_sql()


def canon(rows, cols):
    # Strict typed rendering — keep in sync with tools/verify_local.py.
    # None gets a sentinel distinct from '' (an ''-vs-NULL divergence must
    # FAIL here, as it does at the driver), and floats never collapse to
    # ints (so a bigint-vs-HUGEINT/float engine asymmetry also fails).
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
                vals.append("nan" if v != v else repr(round(v, 9)))
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
    assert canon(srows, sdf.columns) == canon(drows, dcols)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0
