"""Markov-chain analytics over per-user event sequences — the
behavioral-model layer above ``event_transitions`` (B42): how
predictable is the next event (entropy rate), and where does user
activity concentrate in the long run (stationary distribution).

Reference parity: generalizes the reference's event-sequence marts
(snapshots/events semantics, src/silver.py ordering rules) to chain
statistics; transition semantics are identical to B42
(LAG over user_id, ordered by ts then event_id).

Engine-parity rules: transition probabilities live in exact integer
ppm (``ppm_expr``); logs are frozen to integer micro-nats per
DISTINCT transition with one round() (the dsir/perplexity
discipline) so per-row float summation order cannot diverge; the
power iteration is a pure BIGINT fixed-point fold, bit-identical on
both engines at every step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import ppm_expr as _ppm
from ..sources.registry import load_table


def _transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_type, to_type, n) with B42's exact transition semantics."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))


def event_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B103 (r5): conditional entropy H(next | current) per event type
    — the predictability readout of the user behavior chain: a state
    whose next event is near-deterministic scores ~0 micro-nats; a
    state that fans out uniformly over k successors scores ~ln(k)e6.
    The quantity sequence models (and sessionization heuristics) care
    about, computed from the same transition counts as B42.

    Per from-state: outgoing transition count, distinct successor
    count, and the entropy in integer MICRO-NATS — each distinct
    transition's -ln(c_xy/c_x) is frozen to one rounded integer
    micro-nat weight, the per-state sum c_xy*w is an exact BIGINT,
    and the final division is integer DIV by c_x. No float ever
    crosses an aggregation boundary.

    Plan/scale: one LAG window over the fact (the only corpus-scale
    stage, shared with B42), then everything at transition-matrix
    grain (|types|^2 rows).
    """
    counts = _transition_counts(spark, sf_dir)
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("c_x"))
    joined = counts.join(totals, "from_type")
    w_micro = F.round(
        -F.lit(1_000_000.0) * F.log(F.col("n").cast("double") / F.col("c_x").cast("double"))
    ).cast("long")
    return (
        joined.withColumn("w", w_micro)
        .groupBy("from_type", "c_x")
        .agg(
            F.count(F.lit(1)).alias("n_succ"),
            F.sum(F.col("n") * F.col("w")).alias("sw"),
        )
        .select(
            "from_type",
            F.col("c_x").cast("long").alias("n_transitions"),
            F.col("n_succ").cast("long").alias("n_successors"),
            F.expr("sw DIV c_x").cast("long").alias("entropy_micro_nats"),
        )
        .orderBy("from_type")
    )


def markov_stationary_events(
    spark: SparkSession, sf_dir: str, n_iter: int = 20
) -> DataFrame:
    """B104 (r5): stationary distribution of the event-type Markov
    chain by fixed-point power iteration — the long-run share of user
    activity each event type absorbs, the chain-level counterpart of
    pagerank_trade_graph (C76) on the behavioral graph.

    Everything is BIGINT fixed point: transition probabilities in
    exact ppm, the distribution in e6 units seeded uniform
    (1e6 DIV k), each iteration

        r'[to] = (sum_from r[from] * p_ppm[from, to]) DIV 1e6

    — bit-identical on both engines at every step (the holt/ewma
    fold discipline), so n_iter=20 needs no tolerance. From-states
    with no observed outgoing transitions get a synthetic self-loop
    (p = 1e6) so no probability mass silently exits the chain;
    integer flooring leaks at most k e6-units per iteration
    (documented, visible in the output sum).

    Plan/scale: the LAG pass is corpus-scale ONCE and fully
    distributed; the k x k ppm matrix (k = |event types|, bounded by
    the type vocabulary — dozens, never data-sized) is then collected
    in ONE bounded collect and folded on the driver, exactly like the
    bloom bitset's justified collect: 20 distributed join jobs on a
    ~25-row table cost ~3 s each in fixed scheduling overhead
    (measured 58 s total) while the driver fold is microseconds and
    arithmetically identical. Output per type: stationary share in
    e6 units and the iteration count.
    """
    counts = _transition_counts(spark, sf_dir)
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("c_x"))
    types = sorted(
        r.t
        for r in load_table(spark, sf_dir, "events")
        .select(F.col("event_type").alias("t"))
        .distinct()
        .collect()
    )
    trans_rows = (
        counts.join(totals, "from_type")
        .select(
            "from_type",
            "to_type",
            F.expr(_ppm("n", "c_x")).cast("long").alias("p_ppm"),
        )
        .collect()
    )
    p = {(r.from_type, r.to_type): r.p_ppm for r in trans_rows}
    # synthetic self-loop for types never seen as a from-state
    froms = {f for f, _ in p}
    for t in types:
        if t not in froms:
            p[(t, t)] = 1_000_000
    k = len(types)
    rank = {t: 1_000_000 // k for t in types}
    for _ in range(n_iter):
        new = {t: 0 for t in types}
        for (f, t), ppm in p.items():
            new[t] += rank[f] * ppm
        rank = {t: v // 1_000_000 for t, v in new.items()}
    return spark.createDataFrame(
        [(t, rank[t], n_iter) for t in types],
        "event_type string, stationary_e6 long, n_iter int",
    ).orderBy("event_type")


def _journey_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(from_state, to_state, n) over per-user conversion JOURNEYS:
    START -> first event of each journey, consecutive events inside a
    journey, transitions into 'purchase' land in the absorbing CONV
    state (and end the journey — later events start a new journey at
    START), and a journey's last non-purchase event exits to NULL.
    One LAG/LEAD window pass over the fact — the only corpus-scale
    stage; output is (|channels|+1) x (|channels|+2) grain."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("t"),
        F.lag("event_type").over(w).alias("prev_t"),
        F.lead("event_type").over(w).alias("next_t"),
    )
    # START rows: first of user, or first after a purchase
    starts = seq.filter(
        F.col("prev_t").isNull() | (F.col("prev_t") == "purchase")
    ).select(
        F.lit("START").alias("from_state"),
        F.when(F.col("t") == "purchase", "CONV").otherwise(F.col("t")).alias(
            "to_state"
        ),
    )
    # channel rows: every non-purchase event emits one outgoing edge
    outs = seq.filter(F.col("t") != "purchase").select(
        F.col("t").alias("from_state"),
        F.when(F.col("next_t").isNull(), "NULL")
        .when(F.col("next_t") == "purchase", "CONV")
        .otherwise(F.col("next_t"))
        .alias("to_state"),
    )
    return (
        starts.unionByName(outs)
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _absorption_ppm(
    p: dict,
    froms: list[str],
    channels: list[str],
    removed: str | set | None,
    n_iter: int,
) -> dict:
    """CONV-absorption probability per from-state in exact ppm by
    fixed-point iteration: v'(s) = p(s,CONV) + sum_c p(s,c)*v(c) DIV
    1e6, with transitions into ``removed`` (one channel or a set —
    the Shapley coalition complement) redirected to NULL (the
    standard removal-effect surgery — no renormalization). Pure
    integer fold, bit-identical on both engines at every step."""
    gone = (
        set()
        if removed is None
        else ({removed} if isinstance(removed, str) else set(removed))
    )
    v = {s: 0 for s in froms}
    for _ in range(n_iter):
        new = {}
        for s in froms:
            acc = p.get((s, "CONV"), 0) * 1_000_000
            for c in channels:
                if c in gone:
                    continue
                acc += p.get((s, c), 0) * v[c]
            new[s] = acc // 1_000_000
        v = new
    return v


def markov_attribution(
    spark: SparkSession,
    sf_dir: str,
    n_iter: int = 15,
) -> DataFrame:
    """B123 (r5): Markov removal-effect conversion attribution
    (Anderl et al. 2014, public) — the data-driven alternative to
    last-touch/position rules (`attribution_touchpoints`): each
    channel's credit is how much the journey chain's conversion
    probability DROPS when that channel is surgically removed
    (edges into it redirect to NULL, no renormalization).

    Everything after the one LAG/LEAD journey pass is exact BIGINT
    fixed point: transition probabilities in ppm, CONV-absorption by
    n_iter truncating iterations (v' = p(s,CONV) + sum p(s,c)*v(c)
    DIV 1e6 — monotone, bounded, bit-identical both engines, so no
    tolerance), attribution = ppm(effect_c, sum effects). The k x k
    matrix is one bounded collect folded on the driver (the
    markov_stationary_events justification: k is the type
    vocabulary, never data-sized; per-iteration distributed joins on
    a ~30-row table cost ~3 s each in pure scheduling overhead).

    Output per channel: base conversion (same every row — the
    readout anchor), conversion with the channel removed, the
    removal effect, and the normalized attribution share, all ppm.
    """
    counts = _journey_transition_counts(spark, sf_dir)
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("c_x"))
    rows = (
        counts.join(totals, "from_state")
        .select(
            "from_state",
            "to_state",
            F.expr(_ppm("n", "c_x")).cast("long").alias("p_ppm"),
        )
        .collect()
    )
    p = {(r.from_state, r.to_state): r.p_ppm for r in rows}
    channels = sorted(
        {f for f, _ in p if f != "START"}
        | {t for _, t in p if t not in ("CONV", "NULL")}
    )
    froms = ["START", *channels]
    base = _absorption_ppm(p, froms, channels, None, n_iter)["START"]
    effects = {}
    for c in channels:
        without = _absorption_ppm(p, froms, channels, c, n_iter)["START"]
        effects[c] = (c, base, without, base - without)
    total_effect = sum(e[3] for e in effects.values())
    out = []
    for c in channels:
        _, b, w0, eff = effects[c]
        share = (
            (eff * 1000 // total_effect) * 1000
            + (eff * 1000 % total_effect) * 1000 // total_effect
            if total_effect > 0
            else None
        )
        out.append((c, b, w0, eff, share))
    return spark.createDataFrame(
        out,
        "channel string, base_conv_ppm long, conv_without_ppm long,"
        " removal_effect_ppm long, attribution_ppm long",
    ).orderBy("channel")


def shapley_attribution(
    spark: SparkSession,
    sf_dir: str,
    n_iter: int = 15,
) -> DataFrame:
    """B125 (r5): EXACT Shapley-value conversion attribution over the
    journey chain — the game-theoretic axiom-fair split (efficiency,
    symmetry, dummy) that the removal-effect heuristic
    (`markov_attribution`) approximates: channel c's credit averages
    its marginal conversion lift v(S ∪ c) − v(S) over every coalition
    S of the other channels, weighted |S|!(k−1−|S|)!/k!.

    Exact BY exhaustion, not sampling: v(S) is the CONV-absorption of
    the chain with every channel OUTSIDE S redirected to NULL — the
    same truncating BIGINT fold as markov_attribution — evaluated for
    ALL 2^k coalitions. k is the event-type vocabulary (single
    digits, bounded by schema not data), so 2^k chains on the ONE
    collected k x k ppm matrix is driver-trivial; the corpus-scale
    work remains the single LAG/LEAD journey pass. Weights stay
    rational: phi is accumulated in e6 * k! units (integer factorial
    weights) and divided once by k! with floor DIV.

    Output per channel: v({c}) alone-conversion, phi in ppm-of-
    conversion units, and the efficiency residual check column
    (sum phi_e6k over channels == v(ALL)*k! - v(EMPTY)*k! exactly by
    the Shapley identity — emitted as its own per-row constant so
    the driver hash pins it).
    """
    from itertools import combinations
    from math import factorial

    counts = _journey_transition_counts(spark, sf_dir)
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("c_x"))
    rows = (
        counts.join(totals, "from_state")
        .select(
            "from_state",
            "to_state",
            F.expr(_ppm("n", "c_x")).cast("long").alias("p_ppm"),
        )
        .collect()
    )
    p = {(r.from_state, r.to_state): r.p_ppm for r in rows}
    channels = sorted(
        {f for f, _ in p if f != "START"}
        | {t for _, t in p if t not in ("CONV", "NULL")}
    )
    froms = ["START", *channels]
    k = len(channels)
    kfact = factorial(k)
    # v(S) for every coalition S (key: frozenset)
    v = {}
    for r in range(k + 1):
        for S in combinations(channels, r):
            gone = set(channels) - set(S)
            v[frozenset(S)] = _absorption_ppm(p, froms, channels, gone, n_iter)[
                "START"
            ]
    phi_e6k = {}
    for c in channels:
        acc = 0
        others = [x for x in channels if x != c]
        for r in range(k):
            w = factorial(r) * factorial(k - 1 - r)
            for S in combinations(others, r):
                fs = frozenset(S)
                acc += w * (v[fs | {c}] - v[fs])
        phi_e6k[c] = acc
    grand = (v[frozenset(channels)] - v[frozenset()]) * kfact
    assert sum(phi_e6k.values()) == grand  # Shapley efficiency, exact
    out = [
        (
            c,
            v[frozenset({c})],
            phi_e6k[c] // kfact,
            v[frozenset(channels)],
            grand // kfact,
        )
        for c in channels
    ]
    return spark.createDataFrame(
        out,
        "channel string, alone_conv_ppm long, shapley_e6 long,"
        " full_conv_ppm long, grand_e6 long",
    ).orderBy("channel")
