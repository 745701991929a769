"""Hypothesis property tests (SURVEY.md §5.5): generated inputs
against pure-Python reference semantics. Each example runs ONE Spark
job over a generated batch (not one job per row), so the suite stays
fast despite JVM round-trips."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from github_issues_lakehouse_spark.functions import labels as L

LABEL_POOL = [
    "Bug", "Docs", "Enhancement", "Usage Question",
    "Blocker", "Blocker for rc", "Segfault", "Regression",
    "Needs Triage", "good first issue",
    "component: IO", "module: core", "area:  indexing",
    "Indexing", "Performance", "Window", "randomlabel", "Another Label",
]

label_lists = st.lists(st.sampled_from(LABEL_POOL), max_size=6)


def _ref_ticket_kind(labels, r):
    # reference silver.py:41-50 — first-match kind order
    if any(l in labels for l in r.kind_labels.get("bug", [])):
        return "defect"
    if any(l in labels for l in r.kind_labels.get("docs", [])):
        return "docs"
    if any(l in labels for l in r.kind_labels.get("enhancement", [])):
        return "enhancement"
    if any(l in labels for l in r.kind_labels.get("question", [])):
        return "question"
    return "other"


def _ref_priority(labels, kind, r):
    # reference silver.py:53-74
    if any(l in labels for l in r.priority_tiers.get("P0", [])):
        return "P0"
    if any(l in labels for l in r.priority_tiers.get("P1", [])):
        return "P1"
    if kind == "defect" and r.p2_fallback_if_bug and any(
        l in labels for l in r.kind_labels.get("bug", [])
    ):
        return "P2"
    return "NA"


def _ref_component(labels, r):
    # reference silver.py:77-98
    prefixes = [p.lower().strip() for p in r.component_prefixes]
    meta = set(r.meta_labels())
    for lab in labels:
        low = lab.lower().strip()
        if any(low.startswith(p) for p in prefixes):
            return lab.split(":", 1)[1].strip() if ":" in lab else "other"
    for lab in labels:
        if lab in r.component_allowlist:
            return lab
    for lab in labels:
        if lab not in meta:
            return lab
    return "other"


@settings(max_examples=12, deadline=None)
@given(st.lists(label_lists, min_size=1, max_size=25))
def test_label_rules_match_reference_semantics(spark, batches):
    r = L.LakehouseRules()
    df = spark.createDataFrame(
        [(i, labs) for i, labs in enumerate(batches)], "i long, labels array<string>"
    )
    kind = L.ticket_kind(F.col("labels"), r)
    out = df.select(
        "i",
        kind.alias("kind"),
        L.priority_tier(F.col("labels"), kind, r).alias("tier"),
        L.component(F.col("labels"), r).alias("comp"),
    ).collect()
    for row in out:
        labs = batches[row.i]
        assert row.kind == _ref_ticket_kind(labs, r), labs
        assert row.tier == _ref_priority(labs, row.kind, r), labs
        assert row.comp == _ref_component(labs, r), labs


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),      # key
            st.integers(min_value=0, max_value=100),    # version
            st.text(alphabet="abc", max_size=3),        # payload
        ),
        min_size=1,
        max_size=30,
    )
)
def test_merge_keep_latest_picks_max_version(spark, rows):
    from github_issues_lakehouse_spark.operators.silver import merge_keep_latest

    df = spark.createDataFrame(rows, "k int, ver int, v string")
    got = merge_keep_latest(df, "k", "ver").collect()
    max_ver = {}
    for k, ver, _ in rows:
        max_ver[k] = max(max_ver.get(k, -1), ver)
    assert {r.k for r in got} == set(max_ver)
    assert len(got) == len(max_ver)  # exactly one survivor per key
    for r in got:
        assert r.ver == max_ver[r.k]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from(["w1", "w2", "w3", "w4", "w5"]), max_size=8),
    st.lists(st.sampled_from(["w1", "w2", "w3", "w4", "w5"]), max_size=8),
)
def test_array_jaccard_matches_set_math(spark, a, b):
    """The array_intersect/array_union jaccard used by the dedup
    verifiers equals Python set arithmetic for any input."""
    df = spark.createDataFrame([(a, b)], "a array<string>, b array<string>")
    da, db = F.array_distinct("a"), F.array_distinct("b")
    uni = F.array_size(F.array_union(da, db))
    row = df.select(
        F.array_size(F.array_intersect(da, db)).alias("i"),
        uni.alias("u"),
    ).first()
    sa, sb = set(a), set(b)
    assert row.i == len(sa & sb)
    assert row.u == len(sa | sb)


@given(
    t=st.integers(min_value=1, max_value=9_200_000_000_000_000),
    frac=st.fractions(min_value=0, max_value=1),
)
@settings(max_examples=300, deadline=None)
def test_ppm_sql_equals_integer_floor(duck, t, frac):
    """functions/exact.py ppm_sql == floor(p*1e6/t) over the share
    contract (0 <= p <= t) for totals up to the documented 9.2e15
    bound (DuckDB evaluates the exact integer arithmetic; the Spark
    spelling is covered by the fixed cross-engine cases in
    test_r4_wave)."""
    from github_issues_lakehouse_spark.functions.exact import ppm_sql

    p = int(frac * t)
    got = duck.execute(f"SELECT CAST({ppm_sql(str(p), str(t))} AS BIGINT)").fetchone()[0]
    assert got == (p * 1_000_000) // t
