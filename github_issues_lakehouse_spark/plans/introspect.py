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
