"""Round-7 cross-engine property tests for the determinism core.

Each test runs MANY deterministic pseudo-random cases through Spark
and DuckDB in ONE job per engine (a per-example Spark job would be
minutes per property) and compares against a plain-Python reference —
the three-way parity proof pattern.
"""

import hashlib

from pyspark.sql import functions as F


def _rng_ints(tag: str, n: int, lo: int, hi: int) -> list[int]:
    """Deterministic md5-stream integers in [lo, hi] — no RNG state,
    reproducible across runs and machines."""
    span = hi - lo + 1
    return [
        lo + int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:15], 16) % span
        for i in range(n)
    ]


def test_ppm_three_way_parity_across_magnitudes(spark, duck):
    """floor(part*1e6/total) via the two-level BIGINT split: the Spark
    DIV spelling, the DuckDB // spelling, and Python's exact integer
    floor agree on 300 cases spanning part/total magnitudes from 1 to
    the documented ~9.2e12 share bound (part <= total)."""
    from github_issues_lakehouse_spark.functions.exact import ppm_expr, ppm_sql

    cases = []
    for i, (t_mag, frac) in enumerate(
        zip(
            _rng_ints("ppm-tot", 300, 1, 12),
            _rng_ints("ppm-frac", 300, 0, 1_000_000),
        )
    ):
        total = max(1, 10**t_mag + _rng_ints(f"ppm-jit{i}", 1, 0, 10**t_mag)[0])
        part = (total * frac) // 1_000_000
        cases.append((i, part, total))

    want = {i: (p * 1_000_000) // t for i, p, t in cases}

    sdf = spark.createDataFrame(cases, "i long, p long, t long")
    got_spark = {
        r.i: r.v
        for r in sdf.selectExpr(
            "i", f"CAST({ppm_expr('p', 't')} AS BIGINT) AS v"
        ).collect()
    }
    assert got_spark == want

    duck.execute("CREATE OR REPLACE TABLE _ppm_cases(i BIGINT, p BIGINT, t BIGINT)")
    duck.executemany("INSERT INTO _ppm_cases VALUES (?, ?, ?)", cases)
    got_duck = {
        i: v
        for i, v in duck.execute(
            f"SELECT i, CAST({ppm_sql('p', 't')} AS BIGINT) FROM _ppm_cases"
        ).fetchall()
    }
    assert got_duck == want


def test_srm_chi2_three_way_parity_any_ratio(spark, duck):
    """The count-based SRM chi-square (ADVICE r6 fix) at ARBITRARY
    target ratios, not just 50/50: the Spark DECIMAL(38,0) DIV
    spelling, the DuckDB HUGEINT // spelling, and exact Python agree
    on 120 (n_a, n_b, target_permille) cases including million-user
    arms (where the pre-fix share-based formula was blind)."""
    cases = []
    for i in range(120):
        n_a = _rng_ints(f"srm-a{i}", 1, 1, 2_000_000)[0]
        n_b = _rng_ints(f"srm-b{i}", 1, 1, 2_000_000)[0]
        tgt = _rng_ints(f"srm-t{i}", 1, 1, 999)[0]
        cases.append((i, n_a, n_b, tgt))

    def py(n, total, exp_permille):
        d = 1000 * n - total * exp_permille
        return (1_000_000 * d * d) // (1000 * total * exp_permille)

    want = {}
    for i, n_a, n_b, tgt in cases:
        total = n_a + n_b
        want[i] = py(n_a, total, tgt) + py(n_b, total, 1000 - tgt)

    contrib = (
        "CAST(CAST(1000000 AS DECIMAL(38,0))"
        " * CAST(1000 * {n} - (n_a + n_b) * {e} AS DECIMAL(38,0))"
        " * CAST(1000 * {n} - (n_a + n_b) * {e} AS DECIMAL(38,0))"
        " DIV (CAST(1000 AS DECIMAL(38,0))"
        " * CAST(n_a + n_b AS DECIMAL(38,0))"
        " * CAST({e} AS DECIMAL(38,0))) AS BIGINT)"
    )
    expr = (
        contrib.format(n="n_a", e="tgt")
        + " + "
        + contrib.format(n="n_b", e="(1000 - tgt)")
    )
    sdf = spark.createDataFrame(cases, "i long, n_a long, n_b long, tgt long")
    got_spark = {r.i: r.v for r in sdf.selectExpr("i", f"{expr} AS v").collect()}
    assert got_spark == want

    dcontrib = (
        "(1000000::HUGEINT"
        " * (1000::HUGEINT * {n} - (n_a + n_b)::HUGEINT * {e})"
        " * (1000::HUGEINT * {n} - (n_a + n_b)::HUGEINT * {e}))"
        " // (1000::HUGEINT * (n_a + n_b) * {e})"
    )
    dexpr = (
        f"CAST({dcontrib.format(n='n_a', e='tgt')}"
        f" + {dcontrib.format(n='n_b', e='(1000 - tgt)')} AS BIGINT)"
    )
    duck.execute(
        "CREATE OR REPLACE TABLE _srm_cases(i BIGINT, n_a BIGINT, n_b BIGINT, tgt BIGINT)"
    )
    duck.executemany("INSERT INTO _srm_cases VALUES (?, ?, ?, ?)", cases)
    got_duck = {
        i: v for i, v in duck.execute(f"SELECT i, {dexpr} FROM _srm_cases").fetchall()
    }
    assert got_duck == want


def test_band_keys_parity_on_random_vectors(spark, duck, tmp_path):
    """Hyperplane band keys agree Spark-vs-DuckDB on 200 random
    64-dim vectors — the sign of a left-associated float fold is the
    one place the banded family could silently diverge between
    engines (a flipped sign bit changes candidate sets, not just a
    rendered value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.similarity import (
        _hyperplanes,
        embedding_band_postings,
    )

    dim, n_planes, bands = 64, 48, 8
    vecs = []
    for i in range(200):
        raw = _rng_ints(f"vec{i}", dim, -(10**6), 10**6)
        vecs.append([v / 1e6 for v in raw])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
            "label": pa.array(["x"] * 200),
        }
    )
    path = str(tmp_path / "vecs.parquet")
    pq.write_table(tbl, path)

    sdf = spark.read.parquet(path)
    got_spark = {
        (r.vec_id, r.band_id): r.band_val
        for r in embedding_band_postings(sdf, n_planes, bands, dim).collect()
    }

    bits_per_band = n_planes // bands
    planes = _hyperplanes(dim, n_planes)

    def band_val_sql(b: int) -> str:
        parts = []
        for i in range(bits_per_band):
            plane = planes[b * bits_per_band + i]
            terms = " + ".join(
                f"v[{d + 1}] * ({coef!r})" for d, coef in enumerate(plane)
            )
            parts.append(f"CASE WHEN ({terms}) >= 0 THEN {1 << i} ELSE 0 END")
        return " + ".join(parts)

    sel = ", ".join(
        f"CAST({band_val_sql(b)} AS BIGINT) AS b{b}" for b in range(bands)
    )
    rows = duck.execute(
        f"SELECT vec_id, {sel} FROM (SELECT vec_id,"
        f" CAST(embedding AS DOUBLE[]) AS v FROM '{path}')"
    ).fetchall()
    got_duck = {}
    for row in rows:
        for b in range(bands):
            got_duck[(row[0], b)] = row[1 + b]
    assert got_duck == got_spark and len(got_spark) == 200 * bands
