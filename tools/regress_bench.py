"""Compare a bench JSON line against the per-query reference numbers
in BASELINE.md and flag regressions.

    python bench.py > /tmp/bench.json      # also writes BENCH_QUERIES.json
    python tools/regress_bench.py BENCH_QUERIES.json [threshold]

(bench.py's stdout line carries only the 22 r1-baseline queries to
stay inside the driver's tail capture; the FULL per-query map this
tool wants is the BENCH_QUERIES.json side file.)

Prints per-query ratio vs baseline, sorted worst-first; exits 1 if
any query exceeds the threshold (default 1.5x, BASELINE.md's stated
regression bar). Host noise note: BASELINE.md documents multi-second
CPU-steal spikes on this VM — re-measure a flagged query in
isolation before treating it as real.
"""

from __future__ import annotations

import json
import re
import sys


def baseline_table(path: str = "BASELINE.md") -> dict[str, float]:
    ref: dict[str, float] = {}
    for m in re.finditer(r"^\| ([a-z0-9_]+) \| ([0-9.]+) \|$", open(path).read(), re.M):
        ref[m.group(1)] = float(m.group(2))
    return ref


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdin"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
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
