"""SQL surface: register the lakehouse tables (and derived marts) as
temp views so users run plain ``spark.sql`` against the engine — the
same entry point the reference's users get from a notebook, but
backed by distributed scans instead of a pandas frame.

Views are lazy: registering them costs nothing; Catalyst plans each
SQL query against the parquet scans directly (pushdown/pruning apply
exactly as in the DataFrame API — same plans, same scale behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.registry import TABLES, load_table

# Views this module registered, per session: {session id: {view: sf_dir}}.
# Lets repeated register_views/run_sql calls be no-ops for the same
# sf_dir, and — critically — stops the engine from silently clobbering
# a user's own temp view that happens to share a table name.
_ENGINE_VIEWS: dict[int, dict[str, str]] = {}


def _register_one(
    spark: SparkSession, name: str, df_factory, sf_dir: str, force: bool
) -> None:
    owned = _ENGINE_VIEWS.setdefault(id(spark), {})
    if owned.get(name) == sf_dir:
        return  # already ours, same data dir — nothing to do
    if name not in owned and not force and spark.catalog.tableExists(name):
        raise ValueError(
            f"temp view {name!r} already exists in this session and was not "
            f"registered by the engine; pass force=True to overwrite it"
        )
    df_factory().createOrReplaceTempView(name)
    owned[name] = sf_dir


def register_views(
    spark: SparkSession, sf_dir: str, *, marts: bool = False, force: bool = False
) -> list[str]:
    """Register every base table as a temp view; with ``marts=True``
    also the derived silver/gold marts (still lazy plans — computed
    only when queried). Idempotent per (session, sf_dir): re-calls are
    no-ops, a different sf_dir re-points the engine's own views, and a
    user-created view with a clashing name raises instead of being
    silently replaced (``force=True`` overrides). Returns the
    registered view names."""
    names = []
    for t in TABLES:
        _register_one(spark, t, lambda t=t: load_table(spark, sf_dir, t), sf_dir, force)
        names.append(t)
    if marts:
        from .operators.gold import kpi_monthly_component_tier, kpi_monthly_global
        from .operators.silver import silver_issues

        def mk_silver():
            return silver_issues(spark, sf_dir)

        def mk_comp():
            return kpi_monthly_component_tier(silver_issues(spark, sf_dir))

        def mk_global():
            return kpi_monthly_global(
                kpi_monthly_component_tier(silver_issues(spark, sf_dir))
            )

        for name, fac in (
            ("silver_issues", mk_silver),
            ("kpi_monthly_component_tier", mk_comp),
            ("kpi_monthly_global", mk_global),
        ):
            _register_one(spark, name, fac, sf_dir, force)
            names.append(name)
    return names


def run_sql(
    spark: SparkSession,
    sf_dir: str,
    sql: str,
    *,
    marts: bool = False,
    force: bool = False,
) -> DataFrame:
    """One-call SQL entry point: register views (idempotent, never
    clobbers user views unless ``force=True``), return the lazy
    DataFrame for ``sql``."""
    register_views(spark, sf_dir, marts=marts, force=force)
    return spark.sql(sql)


# Registry operators whose DataFrames are PURE LAZY PLANS — no driver
# action (count/collect/localCheckpoint) at construction time — so
# registering them as views costs nothing until queried. Iterative
# operators (k-means, PageRank) and scalar-dimension ops are excluded
# on purpose: building their DataFrame runs jobs.
LAZY_QUERY_VIEWS = [
    "corpus_stats",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "vocab_stats",
    "dedup_exact",
    "dedup_keep_best",
    "duplication_profile",
    "source_mixing_weights",
    "training_corpus_filter",
    "dq_violations",
    "gopher_quality_rules",
    "doc_entropy",
    "ttr_stats",
    "char_class_stats",
    "daily_anomaly_events",
    "event_dedup_windowed",
    "sessionize_events",
    "holdout_split",
    # r3 third batch (construction-safe: no driver-side iteration)
    "equi_depth_histogram",
    "table_stats_mart",
    "attribution_touchpoints",
    "ewma_user_value",
    "term_cooccurrence_pmi",
    "feature_hash_counts",
]


def register_query_views(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    *,
    prefix: str = "q_",
    force: bool = False,
) -> list[str]:
    """Expose registry operators as temp views named ``q_<name>`` so a
    SQL-only user drives the engine's marts directly::

        register_query_views(spark, sf_dir)
        spark.sql("SELECT l.lang, avg(q.quality_score) FROM q_lang_id l "
                  "JOIN q_quality_score q USING (doc_id) GROUP BY 1")

    Defaults to ``LAZY_QUERY_VIEWS`` (construction-safe plans). Any
    registry name is accepted explicitly — but operators that run
    driver-side work at construction (iterative algorithms) will pay
    it at registration. Same ownership guard as ``register_views``.
    """
    from . import queries as Q

    reg = Q.queries()
    todo = names if names is not None else LAZY_QUERY_VIEWS
    out = []
    for n in todo:
        if n not in reg:
            raise KeyError(f"unknown registry query {n!r}")
        _register_one(
            spark, f"{prefix}{n}", lambda n=n: reg[n](spark, sf_dir), sf_dir, force
        )
        out.append(f"{prefix}{n}")
    return out


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Expose the engine's core text functions as Spark SQL scalar
    functions (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN` SQL
    UDFs): pure SQL macros, inlined by Catalyst into the calling
    plan — no Python boundary, full codegen, identical semantics to
    the Column implementations in functions/textfns.py (tested
    equal). With ``register_views`` this makes the text pipeline
    fully drivable from SQL alone.
    """
    from .functions.textfns import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    defs = {
        "norm_text": "(t STRING) RETURNS STRING RETURN "
        "trim(regexp_replace(lower(t), '\\\\s+', ' '))",
        "ws_tokens": "(t STRING) RETURNS ARRAY<STRING> RETURN "
        "split(norm_text(t), ' ')",
        "ws_token_count": "(t STRING) RETURNS INT RETURN size(ws_tokens(t))",
        "punct_ratio_f": "(t STRING) RETURNS DOUBLE RETURN "
        "length(regexp_replace(t, '[^\\\\.\\\\,\\\\;\\\\:\\\\!\\\\?]', ''))"
        " / greatest(length(t), 1)",
        "stopword_ratio_f": f"(t STRING) RETURNS DOUBLE RETURN "
        f"size(filter(ws_tokens(t), x -> array_contains(array({stop}), x)))"
        f" / greatest(size(ws_tokens(t)), 1)",
        "repetition_ratio_f": "(t STRING) RETURNS DOUBLE RETURN "
        "1.0 - size(array_distinct(ws_tokens(t))) / greatest(size(ws_tokens(t)), 1)",
        "doc_quality_score": "(t STRING) RETURNS DOUBLE RETURN "
        "(CASE WHEN ws_token_count(t) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.3 END) * 0.3"
        " + (CASE WHEN stopword_ratio_f(t) >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.2"
        " + (1.0 - repetition_ratio_f(t)) * 0.3"
        " + (CASE WHEN punct_ratio_f(t) <= 0.2 THEN 1.0 ELSE 0.6 END) * 0.2",
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(defs)


def register_udtfs(spark: SparkSession) -> list[str]:
    """Register the engine's Python TABLE functions (Spark 4 UDTFs):
    SQL-addressable row-expanding functions for exploratory lateral
    joins — `SELECT d.doc_id, g.gram FROM docs d, LATERAL
    ngrams(d.text, 3) g`.

    UDTFs are the Python slow path (row-at-a-time): right for ad-hoc
    SQL exploration, wrong for the hot path — every production
    operator in this engine expresses the same expansions as JVM
    Column algebra (shingles_from, chunk_documents). The classes are
    defined in function scope so cloudpickle ships them by value and
    foreign-cwd workers never need this package importable.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, gram string")
    class Ngrams:
        def eval(self, text: str, n: int):
            toks = (text or "").lower().split()
            for i in range(max(0, len(toks) - n + 1)):
                yield i, " ".join(toks[i : i + n])

    @udtf(returnType="chunk_idx int, start_tok int, chunk string")
    class SlidingChunks:
        def eval(self, text: str, width: int, stride: int):
            toks = (text or "").split()
            if not toks:
                return
            idx = 0
            for start in range(0, max(1, len(toks) - width + 1), max(1, stride)):
                yield idx, start, " ".join(toks[start : start + width])
                idx += 1

    spark.udtf.register("ngrams", Ngrams)
    spark.udtf.register("sliding_chunks", SlidingChunks)
    return ["ngrams", "sliding_chunks"]
