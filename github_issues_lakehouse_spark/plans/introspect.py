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
