"""Capture .explain('formatted') output for named queries into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default round r11;
optimization-round evidence: the judge checks plan claims against these
files).

Usage: python tools/capture_plans.py <suffix> <query> [query ...]
       python tools/capture_plans.py <suffix> @targets.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names: list[str] = []
    for a in sys.argv[2:]:
        if a.startswith("@"):
            with open(a[1:]) as f:
                names += [ln.strip() for ln in f if ln.strip()]
        else:
            names.append(a)

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    qs = Q.queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"# wrote {name}_{suffix}.txt ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
