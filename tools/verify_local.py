"""Local stand-in for the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
same SF, compare row count, sorted column names, and an
order-insensitive value hash.

Usage: python tools/verify_local.py [sf_dir] [query ...]

Modes (env VERIFY_CANON, VERDICT r3 task 4 + r4 task 2):
- ``rounded`` (default): floats rounded to 9dp before hashing — the
  historical local gate.
- ``strict``: full ``repr(float)``, no rounding. The driver's canon
  may hash raw values, so a query that passes only in rounded mode is
  carrying sub-1e-9 environment drift — exactly the r3 driver-FAIL
  signature — and must be rewritten with fixed-point arithmetic.
- ``decfloat``: like strict, but Decimal values are rendered through
  ``repr(float(v))`` — the r4 driver-FAIL class: the driver's canon
  renders ``Decimal('49341.00')`` float-style (``49341.0``) while
  Spark's str keeps scale, so any trailing-zero decimal flips the
  hash whenever the two engines return decimals at different scales
  or one engine floats them. A query passing rounded+strict but not
  decfloat is exactly the r4 signature.
- ``both``: rounded AND strict must agree.
- ``all``: rounded AND strict AND decfloat must agree (the r5 bar).
"""

from __future__ import annotations

import decimal
import hashlib
import os
import sys
import time
import traceback

sys.path.insert(0, ".")


def canon(rows, cols, strict=False, decfloat=False):
    """Order-insensitive canonical form: sort columns by name, render
    every value to a stable TYPED string, sort rows.

    Strict typed rendering — keep in sync with tests/test_oracle.py.
    None gets a sentinel distinct from '' (an ''-vs-NULL divergence must
    FAIL here, as it does at the driver), and floats never collapse to
    ints (so a bigint-vs-HUGEINT/float engine asymmetry also fails).
    ``decfloat`` additionally renders Decimal via repr(float(v)) to
    reproduce the driver's trailing-zero-stripping decimal canon."""
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)

    def fresh_con():
        """DuckDB connection with the gate's resource posture: a
        spill directory so blocking operators (the all-pairs cosine
        oracles at sf0.1) spill instead of raising OOM, and a memory
        ceiling that leaves headroom beside the Spark JVM. A 300-key
        single-process run otherwise accumulates enough allocator
        pressure that a heavy oracle ~290 keys in can fail
        (r9: banded_neardup_recall DUCKDB ERROR at sf0.1 in the full
        sweep, PASS in isolation and with its heavy neighbors)."""
        c = duckdb.connect()
        c.execute("SET temp_directory='/tmp/duck_spill'")
        c.execute("SET memory_limit='24GB'")
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    con = fresh_con()

    qs = Q.queries()
    oracles = Q.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            # a long-run resource failure is a harness artifact, not
            # an engine verdict: retry ONCE on a fresh connection and
            # only FAIL if the oracle fails clean too
            traceback.print_exc()
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
            try:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                print(f"# {name}: oracle retried on a fresh connection", file=sys.stderr)
            except Exception:
                print(f"FAIL  {name}: DUCKDB ERROR")
                traceback.print_exc()
                n_fail += 1
                continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            mode = os.environ.get("VERIFY_CANON", "rounded")
            mismatched = []
            modes = {
                "both": ("rounded", "strict"),
                "all": ("rounded", "strict", "decfloat"),
            }.get(mode, (mode,))
            for m in modes:
                strict = m in ("strict", "decfloat")
                decfloat = m == "decfloat"
                h1 = canon([list(r) for r in srows], scols, strict=strict, decfloat=decfloat)
                h2 = canon([list(r) for r in drows], dcols, strict=strict, decfloat=decfloat)
                if h1 != h2:
                    mismatched.append(m)
                elif decfloat:
                    # The r4 driver FAILs were invisible cross-engine
                    # locally (both engines returned Decimal at the
                    # same scale) — the driver's canon floats decimals
                    # on one side. So also require each side's hash to
                    # be INVARIANT to decimal rendering: a
                    # trailing-zero decimal anywhere ('49341.00' vs
                    # '49341.0') fails here before it fails there.
                    h1s = canon([list(r) for r in srows], scols, strict=True)
                    h2s = canon([list(r) for r in drows], dcols, strict=True)
                    if h1 != h1s or h2 != h2s:
                        mismatched.append("decfloat-invariance")
            if mismatched:
                problems.append(f"value-hash mismatch ({'+'.join(mismatched)})")
                # show a sample diff
                s_set = {}
                d_set = {}
                idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
                idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                for r in srows:
                    key = tuple(str(list(r)[i]) for i in idx_s)
                    s_set[key] = r
                for r in drows:
                    key = tuple(str(list(r)[i]) for i in idx_d)
                    d_set[key] = r
                only_s = [s_set[k] for k in list(s_set.keys() - d_set.keys())[:3]]
                only_d = [d_set[k] for k in list(d_set.keys() - s_set.keys())[:3]]
                for r in only_s:
                    print(f"    spark-only: {r}")
                for r in only_d:
                    print(f"    duck-only:  {r}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}  ({time.time()-t0:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
