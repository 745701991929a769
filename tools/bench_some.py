"""Isolated re-measurement of named queries: best-of-N count() with the
bench's methodology (clearCache between repeats, warmup run first), plus
the Spark JOB COUNT per query (the fixed-overhead driver at small SF).

Usage: SPARK_GRAFT_SF_DIR=... python tools/bench_some.py <query> [query ...]
       python tools/bench_some.py @targets.txt
Prints one line per query: name, best sec, n_rows, n_jobs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("@"):
            with open(a[1:]) as f:
                names += [ln.strip() for ln in f if ln.strip()]
        else:
            names.append(a)
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-some")
    sc = spark.sparkContext
    qs = Q.queries()
    out = {}

    # pinned control (bench.py's discipline): q1 is a fixed sub-second
    # scan-agg; its time brackets each measurement so a contended host
    # window carries its own evidence in the artifact
    control = qs["q1_pricing_summary"]
    control(spark, sf_dir).count()  # warm the control plan

    def _control_sec() -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        control(spark, sf_dir).count()
        return round(time.time() - t0, 3)

    for name in names:
        fn = qs[name]
        ctl0 = _control_sec()
        # warmup (codegen compile + staging caches), untimed
        spark.catalog.clearCache()
        fn(spark, sf_dir).count()
        best, n, jobs_best = float("inf"), 0, -1
        for _ in range(repeats):
            spark.catalog.clearCache()
            sc.setJobGroup(f"bench:{name}", name)
            tracker = sc.statusTracker()
            before = set(tracker.getJobIdsForGroup(f"bench:{name}"))
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            after = set(tracker.getJobIdsForGroup(f"bench:{name}"))
            sc.setJobGroup("", "")
            if dt < best:
                best, jobs_best = dt, len(after - before)
        ctl1 = _control_sec()
        out[name] = {
            "sec": round(best, 3),
            "rows": n,
            "jobs": jobs_best,
            "control": [ctl0, ctl1],
        }
        print(
            f"# {name}: {best:.2f}s ({n} rows, {jobs_best} jobs, "
            f"ctl {ctl0:.2f}/{ctl1:.2f})",
            file=sys.stderr,
        )
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
