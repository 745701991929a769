"""Compare a bench JSON line against the per-query baseline in
BASELINE_QUERIES.json and flag regressions.

    python bench.py > /tmp/bench.json      # also writes BENCH_QUERIES.json
    python tools/regress_bench.py BENCH_QUERIES.json [threshold]
    python tools/regress_bench.py BENCH_QUERIES.json --rebase rN

The baseline is ONE machine-readable file (VERDICT r5 task 6):
BASELINE_QUERIES.json maps query -> {"sec": baseline seconds,
"round": provenance}. BASELINE.md keeps the published r1 narrative
table and points here. ``--rebase rN`` folds any query MISSING from
the baseline into it at its current measurement, stamped with the
given round — it never overwrites an existing (harder) baseline.

Prints per-query ratio vs baseline, sorted worst-first; exits 1 if
any query exceeds the threshold (default 1.5x, BASELINE.md's stated
regression bar). Host noise note: BASELINE.md documents multi-second
CPU-steal spikes on this VM — re-measure a flagged query in
isolation before treating it as real.
"""

from __future__ import annotations

import json
import os
import re
import sys

BASELINE_JSON = "BASELINE_QUERIES.json"


def baseline_table(path: str = "BASELINE.md") -> dict[str, float]:
    if os.path.exists(BASELINE_JSON):
        with open(BASELINE_JSON) as f:
            return {q: v["sec"] for q, v in json.load(f).items()}
    ref: dict[str, float] = {}
    for m in re.finditer(r"^\| ([a-z0-9_]+) \| ([0-9.]+) \|$", open(path).read(), re.M):
        ref[m.group(1)] = float(m.group(2))
    return ref


def rebase(data: dict, round_tag: str) -> None:
    base = {}
    if os.path.exists(BASELINE_JSON):
        with open(BASELINE_JSON) as f:
            base = json.load(f)
    added = [q for q in data["queries"] if q not in base]
    for q in added:
        base[q] = {"sec": data["queries"][q], "round": round_tag}
    with open(BASELINE_JSON, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"rebased: {len(added)} new queries stamped {round_tag}; {len(base)} total")


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdin"
    rebase_tag = None
    threshold = 1.5
    if len(sys.argv) > 2:
        if sys.argv[2] == "--rebase":
            rebase_tag = sys.argv[3] if len(sys.argv) > 3 else "r?"
        else:
            threshold = float(sys.argv[2])
    text = open(bench_path).read()
    try:
        data = json.loads(text)  # a JSON document (BENCH_QUERIES.json)
    except json.JSONDecodeError:
        data = None  # bench stdout: last JSON line wins
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    data = json.loads(line)
                except json.JSONDecodeError:
                    pass
    if data is None:
        print("no JSON line found", file=sys.stderr)
        sys.exit(2)
    if rebase_tag is not None:
        rebase(data, rebase_tag)
        return
    ref = baseline_table()
    rows = []
    for q, sec in data["queries"].items():
        base = ref.get(q)
        rows.append((sec / base if base else None, q, base, sec))
    rows.sort(key=lambda r: -(r[0] or 0))
    bad = 0
    for ratio, q, base, sec in rows:
        tag = ""
        if ratio is not None and ratio > threshold:
            tag = "  <-- REGRESSION"
            bad += 1
        r = f"{ratio:5.2f}x" if ratio is not None else "  new "
        b = f"{base:6.2f}" if base is not None else "     -"
        print(f"{q:34s} base {b}  now {sec:6.2f}  {r}{tag}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
