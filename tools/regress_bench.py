"""Compare a bench JSON line against the per-query baseline in
BASELINE_QUERIES.json and flag regressions.

    python bench.py > /tmp/bench.json      # also writes BENCH_QUERIES.json
    python tools/regress_bench.py BENCH_QUERIES.json [threshold]
    python tools/regress_bench.py BENCH_QUERIES.json --rebase rN
    python tools/regress_bench.py BENCH_QUERIES.json --confirm

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

``--confirm`` (VERDICT r7 task 4) implements that re-measure ritual
machine-checkably: every flagged line is re-run ISOLATED and WARM
(one fresh session, codegen warm-up at sf0.001, best of
BENCH_REPEATS samples with the cache cleared between), the flag is
kept only if the re-measure still exceeds the threshold, and the
post-confirmation list is printed as one JSON line (quote THAT in
VERIFY_SNAPSHOT instead of hand-adjudicating). Flags that evaporate
on a quiet re-run were host noise by the repo's documented
run-twice rule — on identical code a real regression reproduces.

Variance bands (VERDICT r8 task 5): a baseline stamped on a HOT run
under-states the query's true floor, so sub-second lines flag round
after round with disjoint culprits (pii/kmv on the quiet close,
holt/sla_mom on the driver host — four rounds of churn). A baseline
entry may carry ``band_hi_sec``: the measured upper edge of the
query's isolated-fresh-session variance on UNCHANGED code (max of
>=6 warm samples, +10%% headroom). ``--confirm`` reports a
re-measure that exceeds the ratio cap but stays inside the band as
the distinct verdict WITHIN_BAND — a hot-stamped-baseline artifact,
not an actionable regression — and exits 0 for it. The ratio cap
itself is never overwritten; bands only annotate adjudication.

Contention annotations (VERDICT r9 task 2): bench.py interleaves a
pinned control query (``bench.CONTROL_QUERY``) through the headline
pass and stamps BENCH_QUERIES.json with per-line nearest-control
ratios (``contention``) plus the list of lines measured in a
contended window (``contended``). A flag whose own window the
control proves slow prints as ``host-contended window`` and is
quoted in the --confirm JSON under ``contended_at_measure`` — the
artifact now adjudicates the r5-r9 host-noise flag class by itself;
the isolated --confirm re-run remains the decider.
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


def confirm_flags(
    flagged: list[tuple[str, float, float]], threshold: float
) -> tuple[list[dict], list[dict]]:
    """Re-run each flagged query isolated+warm in one fresh session;
    return (confirmed, within_band): flags still over threshold AND
    past the baseline's measured variance band, vs flags whose
    re-measure stays inside the band of the hot-stamped baseline."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import time

    from bench import _extra_queries
    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.session import get_spark

    bands: dict[str, float] = {}
    if os.path.exists(BASELINE_JSON):
        with open(BASELINE_JSON) as f:
            bands = {
                q: v["band_hi_sec"]
                for q, v in json.load(f).items()
                if "band_hi_sec" in v
            }

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "2")))
    spark = get_spark(app_name="regress-confirm")
    qs = {**Q.queries(), **_extra_queries()}
    survived: list[dict] = []
    within: list[dict] = []
    for q, base, orig_sec in flagged:
        if q not in qs:
            survived.append(
                {"query": q, "base": base, "sec": orig_sec, "note": "unknown query"}
            )
            continue
        if os.path.isdir(warm_dir):
            qs[q](spark, warm_dir).count()  # codegen warm-up
        best = orig_sec
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[q](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        band = bands.get(q)
        if best <= base * threshold:
            status = "noise"
        elif band is not None and best <= band:
            status = "WITHIN_BAND"
            within.append(
                {
                    "query": q,
                    "base": base,
                    "band_hi_sec": band,
                    "sec": round(best, 3),
                    "flagged_sec": orig_sec,
                }
            )
        else:
            status = "CONFIRMED"
            survived.append(
                {"query": q, "base": base, "sec": round(best, 3), "flagged_sec": orig_sec}
            )
        print(
            f"confirm {q:34s} base {base:6.2f}  flagged {orig_sec:6.2f}"
            f"  isolated {best:6.2f}  -> {status}",
            file=sys.stderr,
        )
    spark.stop()
    return survived, within


def main() -> None:
    args = sys.argv[1:]
    confirm = "--confirm" in args
    args = [a for a in args if a != "--confirm"]
    bench_path = args[0] if args else "/dev/stdin"
    rebase_tag = None
    threshold = 1.5
    if len(args) > 1:
        if args[1] == "--rebase":
            rebase_tag = args[2] if len(args) > 2 else "r?"
        else:
            threshold = float(args[1])
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
    # Contention annotations (VERDICT r9 task 2): bench.py interleaves
    # a pinned control query and stamps each line with the nearest
    # control sample's ratio vs the control floor — a flag whose
    # window the control also shows slow is host contention carrying
    # its own evidence, not a code regression.
    contention: dict[str, float] = data.get("contention", {}) or {}
    ratio_cap = (data.get("control") or {}).get("ratio_cap", 1.5)
    rows = []
    for q, sec in data["queries"].items():
        base = ref.get(q)
        rows.append((sec / base if base else None, q, base, sec))
    rows.sort(key=lambda r: -(r[0] or 0))
    flagged = []
    contended_flags = []
    for ratio, q, base, sec in rows:
        tag = ""
        if ratio is not None and ratio > threshold:
            ctl = contention.get(q)
            if ctl is not None and ctl > ratio_cap:
                tag = f"  <-- REGRESSION (host-contended window: control {ctl:.2f}x)"
                contended_flags.append(q)
            else:
                tag = "  <-- REGRESSION"
            flagged.append((q, base, sec))
        r = f"{ratio:5.2f}x" if ratio is not None else "  new "
        b = f"{base:6.2f}" if base is not None else "     -"
        print(f"{q:34s} base {b}  now {sec:6.2f}  {r}{tag}")
    if confirm and flagged:
        survived, within = confirm_flags(flagged, threshold)
        print(
            json.dumps(
                {
                    "confirm": {
                        "threshold": threshold,
                        "initial_flags": len(flagged),
                        "contended_at_measure": contended_flags,
                        "confirmed": survived,
                        "within_band": within,
                    }
                },
                separators=(",", ":"),
            )
        )
        sys.exit(1 if survived else 0)
    if confirm and not flagged:
        print(json.dumps({"confirm": {"threshold": threshold, "initial_flags": 0, "confirmed": []}}, separators=(",", ":")))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
