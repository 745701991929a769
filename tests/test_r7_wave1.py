"""Round-7 wave 1: the registered gap-filled MAD readout (B132b,
VERDICT r6 task 3) and the banded semantic-components scale path
(C146/C147, VERDICT r6 task 4).

Each test recomputes the operator's claim from first principles or an
identity the math guarantees — the oracle gate already proves
Spark == DuckDB; these prove both equal the intended semantics.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from .conftest import SF_DIR

_DAY_NS = 86_400 * 1_000_000_000
_T0 = 1_700_000_000_000_000_000  # fixed epoch anchor (ns)


def test_mad_daily_equals_observed_when_dense(spark):
    """On this corpus every (type, day) cell is populated, so the
    gap-filled grid IS the observed grain and the registered B132b
    key must equal B130 row for row — proving the key rides the same
    tested helper with gapfill as its only delta."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        mad_anomaly_events,
        mad_anomaly_from_counts_daily,
    )

    key = lambda r: (r.event_type, str(r.day))  # noqa: E731
    got = {
        key(r): (r.n_events, r.n_trailing, r.med2, r.mad4, r.robust_z, r.is_anomaly)
        for r in mad_anomaly_from_counts_daily(spark, SF_DIR).collect()
    }
    want = {
        key(r): (r.n_events, r.n_trailing, r.med2, r.mad4, r.robust_z, r.is_anomaly)
        for r in mad_anomaly_events(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def _write_events(tmp_path, rows):
    """rows: list of (day_index, event_type, n_copies) — n_copies
    events on that day for that type."""
    eid, ids, ts, et = 0, [], [], []
    for day, typ, n in rows:
        for i in range(n):
            ids.append(eid)
            ts.append(_T0 + day * _DAY_NS + i * 1_000_000_000)
            et.append(typ)
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array([i % 7 for i in ids], pa.int64()),
            "event_type": pa.array(et),
            "value": pa.array([1.0] * len(ids)),
            "props": pa.array(["{}"] * len(ids)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_mad_gapfill_alarms_after_silence(spark, tmp_path):
    """The semantic B130 cannot express: a type active at n=5/day for
    days 0-9, silent days 10-23, bursting back at n=5 on day 24.
    Observed-only B130's trailing window for day 24 still holds the
    old n=5 days (median 5, deviation 0 -> quiet). The gap-filled
    grid's window is 14 zeros (med2=mad4=0), so the zero-MAD
    convention flags the comeback burst. A steady second type spans
    the same calendar so the grid covers all 25 days."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        mad_anomaly_events,
        mad_anomaly_from_counts_daily,
    )

    rows = [(d, "steady", 3) for d in range(25)]
    rows += [(d, "bursty", 5) for d in range(10)]
    rows += [(24, "bursty", 5)]
    sf_dir = _write_events(tmp_path, rows)

    filled = {
        (r.event_type, str(r.day)): r
        for r in mad_anomaly_from_counts_daily(spark, sf_dir).collect()
    }
    observed = {
        (r.event_type, str(r.day)): r
        for r in mad_anomaly_events(spark, sf_dir).collect()
    }

    import datetime

    d0 = datetime.datetime.fromtimestamp(_T0 / 1e9, datetime.timezone.utc).date()
    burst_key = ("bursty", str(d0 + datetime.timedelta(days=24)))

    # observed-only: window = the ten n=5 days, median 5 -> no alarm
    assert burst_key in observed
    assert observed[burst_key].med2 == 10  # 2 * median(5)
    assert not observed[burst_key].is_anomaly
    # gap-filled: window = 14 zeros -> med2 = mad4 = 0, alarm fires
    assert burst_key in filled
    assert filled[burst_key].med2 == 0 and filled[burst_key].mad4 == 0
    assert filled[burst_key].is_anomaly
    # and the silent days themselves are non-anomalous zeros
    mid_key = ("bursty", str(d0 + datetime.timedelta(days=20)))
    assert filled[mid_key].n_events == 0
    assert mid_key not in observed


def test_banded_pairs_subset_and_recall_identities(spark):
    """Banded pairs are verified with the SAME 6dp exact cosine C6
    uses, so they must be a subset of the exact pair set (precision 1
    by construction); the recall mart's four numbers recompute from
    the two pair sets, including the exact-ppm split."""
    from github_issues_lakehouse_spark.operators.similarity import (
        banded_corpus_pairs,
        banded_neardup_recall,
        neardup_embedding_cosine,
    )

    banded = {
        (r.id_a, r.id_b) for r in banded_corpus_pairs(spark, SF_DIR).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in neardup_embedding_cosine(spark, SF_DIR).collect()
    }
    assert banded <= exact and len(exact) > 0

    [row] = banded_neardup_recall(spark, SF_DIR).collect()
    assert row.n_exact_pairs == len(exact)
    assert row.n_banded_pairs == len(banded)
    assert row.n_caught == len(banded & exact) == len(banded)

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    assert row.recall_ppm == ppm(len(banded), len(exact))


def test_banded_clusters_refine_exact_clusters(spark):
    """Banded pairs are a subset of exact pairs, so banded components
    can only SPLIT exact components, never merge across them: every
    banded cluster's members map into ONE exact cluster, and the
    banded node set is a subset of the exact node set."""
    from github_issues_lakehouse_spark.operators.similarity import (
        embedding_dup_clusters,
        embedding_dup_clusters_banded,
    )

    exact = {
        r.vec_id: r.cluster_id for r in embedding_dup_clusters(spark, SF_DIR).collect()
    }
    banded = {
        r.vec_id: r.cluster_id
        for r in embedding_dup_clusters_banded(spark, SF_DIR).collect()
    }
    assert set(banded) <= set(exact) and len(banded) > 0
    from collections import defaultdict

    members = defaultdict(set)
    for v, c in banded.items():
        members[c].add(exact[v])
    for c, exact_cids in members.items():
        assert len(exact_cids) == 1, f"banded cluster {c} spans exact clusters"


def test_banded_pairs_plan_has_no_n2_stage(spark):
    """The scale contract in the plan itself: no CartesianProduct
    anywhere, and the candidate stage is an equi-join (hash/sort-merge
    on the band key) — the n-squared scorer this operator replaces
    lives only in C133's exact audit."""
    from github_issues_lakehouse_spark.operators.similarity import (
        banded_corpus_pairs,
        embedding_dup_clusters_banded,
    )

    for df in (
        banded_corpus_pairs(spark, SF_DIR),
        embedding_dup_clusters_banded(spark, SF_DIR),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_windowexec_warning_suppressed_in_tuned_session(spark):
    """VERDICT r6 task 5: the ~27 reviewed bounded-grain
    single-partition windows are recorded in the plan-advice snapshot
    (the CI drift gate is the novel-site detector), so the tuned
    session raises the WindowExec logger to ERROR — bench/verify logs
    stay clean and a WindowExec WARN can no longer hide among
    reviewed-site spam."""
    jvm = spark.sparkContext._jvm
    lvl = str(
        jvm.org.apache.logging.log4j.LogManager.getLogger(
            "org.apache.spark.sql.execution.window.WindowExec"
        ).getLevel()
    )
    assert lvl == "ERROR"


def test_embedding_band_skew_audit_matches_python_recompute(spark):
    """Every column of the pricing mart recomputes from the shared
    posting stage in plain Python — bucket counts, extremes, exact
    pair masses, and the cap's trim arithmetic."""
    from collections import Counter

    from github_issues_lakehouse_spark.operators.similarity import (
        embedding_band_postings,
        embedding_band_skew_audit,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    cap = 2000
    posts = embedding_band_postings(
        load_table(spark, SF_DIR, "embeddings")
    ).collect()
    per_band = {}
    for r in posts:
        per_band.setdefault(r.band_id, Counter())[r.band_val] += 1

    got = {r.band_id: r for r in embedding_band_skew_audit(spark, SF_DIR).collect()}
    assert set(got) == set(per_band)
    for b, buckets in per_band.items():
        cs = list(buckets.values())
        r = got[b]
        assert r.n_buckets == len(cs)
        assert r.n_postings == sum(cs)
        assert r.max_bucket == max(cs)
        assert r.n_singleton == sum(1 for c in cs if c == 1)
        assert r.n_over_cap == sum(1 for c in cs if c > cap)
        assert r.postings_dropped == sum(c for c in cs if c > cap)
        assert r.pairs_uncapped == sum(c * (c - 1) // 2 for c in cs)
        assert r.pairs_after_cap == sum(c * (c - 1) // 2 for c in cs if c <= cap)
