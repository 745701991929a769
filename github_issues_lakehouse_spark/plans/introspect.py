"""Physical-plan introspection: the feedback loop that keeps every
operator scale-worthy. Used by tests to pin down plan properties
(pushdown reached the scan, dims broadcast, no cartesian products).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # type: ignore[attr-defined]


def _plan_str(df: DataFrame) -> str:
    try:
        return formatted_plan(df)
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    s = _plan_str(df)
    return "PushedFilters: [" in s and "PushedFilters: []" not in s


def broadcast_join_count(df: DataFrame) -> int:
    return _plan_str(df).count("BroadcastHashJoin")


def assert_no_cartesian(df: DataFrame) -> None:
    s = _plan_str(df)
    if "CartesianProduct" in s:
        raise AssertionError("plan contains CartesianProduct:\n" + s)


def shuffle_count(df: DataFrame) -> int:
    import re

    return len(re.findall(r"\(\d+\) Exchange\b", _plan_str(df)))


def _tree_nodes(s: str) -> list[tuple[int, str, str]]:
    """Parse the formatted-plan tree header into (depth, name, id)
    tuples. Depth comes from the 3-char-per-level ASCII indentation;
    the ``*`` whole-stage-codegen marker is stripped."""
    import re

    lines = s.splitlines()
    start = 0
    for i, line in enumerate(lines):
        if line.startswith("== Physical Plan =="):
            start = i + 1
            break
    node_re = re.compile(r"^([:+\-\s]*)\*?\s*([A-Za-z][\w .]*?)\s*\((\d+)\)")
    out: list[tuple[int, str, str]] = []
    for line in lines[start:]:
        if not line.strip():
            break
        m = node_re.match(line)
        if m:
            out.append((len(m.group(1)) // 3, m.group(2), m.group(3)))
    return out


def _single_partition_window(s: str) -> bool:
    """True when a Window/Sort node consumes an ``Exchange
    SinglePartition`` — the one scale-killer class the r5 advisor
    missed (term_burst_detection's full-vocabulary rank window): the
    entire input moves to ONE task before the operator runs. Fine
    when the input grain is bounded (a per-source aggregate, a top-k
    survivor set); fatal when it's a vocabulary or fact table. The
    snapshot gate records the bounded-grain sites as reviewed."""
    import re

    single_ids = set(
        re.findall(
            r"\((\d+)\) Exchange\s*\n(?:[^\n]+\n){0,3}?Arguments: SinglePartition", s
        )
    )
    if not single_ids:
        return False
    nodes = _tree_nodes(s)
    parents: dict[int, int | None] = {}
    stack: list[tuple[int, int]] = []
    for i, (d, _name, _nid) in enumerate(nodes):
        while stack and stack[-1][0] >= d:
            stack.pop()
        parents[i] = stack[-1][1] if stack else None
        stack.append((d, i))
    passthrough = {"ShuffleQueryStage", "AQEShuffleRead", "InputAdapter", "WholeStageCodegen"}
    bounded = {"TakeOrderedAndProject", "GlobalLimit", "LocalLimit", "CollectLimit"}
    for i, (d, name, nid) in enumerate(nodes):
        if name.split()[0] != "Exchange" or nid not in single_ids:
            continue
        j = parents[i]
        while j is not None and nodes[j][1].split()[0] in passthrough:
            j = parents[j]
        if j is None or nodes[j][1].split()[0] not in ("Sort", "Window", "WindowGroupLimit"):
            continue
        # an Exchange fed by a limit (TakeOrderedAndProject from
        # orderBy().limit(k), or an explicit limit) moves a BOUNDED
        # row set — the repo's own top-k idiom; don't flag it
        k = i + 1
        is_bounded = False
        while k < len(nodes) and nodes[k][0] > d:
            if nodes[k][1].split()[0] in bounded:
                is_bounded = True
                break
            k += 1
        if not is_bounded:
            return True
    return False


def advise(df: DataFrame) -> list[str]:
    """Plan advisor: scan a query's physical plan for the patterns
    that kill it at 100x scale and return human-readable warnings
    (empty list = clean). The same checks the test suite pins for
    the built-in operators, packaged for USER queries run through
    catalog.run_sql / the DataFrame API.

    Heuristics, not proofs — a flagged plan deserves a look, not an
    automatic rejection (e.g. a cartesian against a literal 1-row
    aggregate is fine and is listed as such).
    """
    import re

    s = _plan_str(df)
    warnings: list[str] = []
    if "CartesianProduct" in s or (
        "BroadcastNestedLoopJoin" in s and "Join type: Cross" in s
    ):
        warnings.append(
            "CartesianProduct/cross join: every pair of rows is "
            "materialized — only acceptable when one side is a literal "
            "handful of rows (1-row scalar aggregate, tiny grid)"
        )
    scans = re.findall(r"PushedFilters: \[(.*?)\]", s)
    filters_in_plan = "Filter (" in s or re.search(r"\(\d+\) Filter\b", s)
    if filters_in_plan and scans and all(not f.strip() for f in scans):
        warnings.append(
            "No filter reached any parquet scan (PushedFilters all empty) "
            "while the plan contains Filter nodes — predicates evaluate "
            "after full-table reads; check for casts/UDFs around the "
            "filter column"
        )
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", s))
    if n_ex >= 5:
        warnings.append(
            f"{n_ex} shuffle exchanges — each re-moves the full dataset; "
            "look for repartition/groupBy chains that could share a "
            "partitioning"
        )
    if "SortMergeJoin" in s and "BroadcastHashJoin" not in s and "rows)" not in s:
        warnings.append(
            "SortMergeJoin with no broadcast anywhere — if one side is a "
            "dimension table, broadcast() it explicitly"
        )
    if re.search(r"BatchEvalPython|PythonUDF", s):
        warnings.append(
            "Row-at-a-time Python UDF in the plan — replace with built-in "
            "Column functions or an Arrow-batched pandas UDF"
        )
    if _single_partition_window(s):
        warnings.append(
            "Window/Sort over Exchange SinglePartition — the whole input "
            "moves to ONE task before the operator runs; acceptable only "
            "when the input grain is provably bounded (per-source/bucket "
            "aggregate, top-k survivors). For an unbounded grain use "
            "orderBy().limit() (TakeOrderedAndProject) or the band/carry "
            "two-level prefix-sum"
        )
    return warnings


def lineage_report(df: DataFrame) -> list[dict]:
    """Source-column lineage from the OPTIMIZED physical plan: one
    entry per parquet scan with the table (from the file location),
    the exact columns read (ReadSchema — i.e. what survived column
    pruning) and the predicates pushed into the scan. The audit a
    platform team runs to answer "which source columns does this mart
    actually depend on, and is the scan pruned?" — a scan reading all
    columns for a narrow projection is a pruning bug.
    """
    import re

    p = _plan_str(df)
    out: list[dict] = []
    # formatted explain prints per-scan blocks: Location, then
    # PushedFilters / ReadSchema lines belonging to the same scan
    blocks = re.split(r"\(\d+\) Scan parquet", p)[1:]
    for b in blocks:
        loc = re.search(r"Location:.*?\[(.*?)\]", b)
        schema = re.search(r"ReadSchema: struct<(.*?)>", b, re.S)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", b, re.S)
        table = None
        if loc:
            table = loc.group(1).rstrip("/").rsplit("/", 1)[-1].replace(".parquet", "")
        cols = []
        if schema:
            cols = [
                c.split(":", 1)[0].strip()
                for c in re.split(r",(?![^<]*>)", schema.group(1))
                if c.strip()
            ]
        out.append(
            {
                "table": table,
                "columns": cols,
                "pushed_filters": (pushed.group(1).strip() if pushed else ""),
            }
        )
    return out
