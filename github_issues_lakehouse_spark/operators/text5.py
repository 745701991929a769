"""Corpus-analysis operators, fifth wave (r3): classic pretraining
quality heuristics and distributional diagnostics over ``documents``.

All pure Column algebra — one scan, map-side-combinable aggregates,
no UDFs — so they hold at 100 TB by construction (the only shuffles
are the final small groupBys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import norm_tokens
from ..sources.registry import load_table
from .relational import r6


def gopher_quality_rules(
    spark: SparkSession,
    sf_dir: str,
    min_words: int = 10,
    max_words: int = 10_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_frac: float = 0.02,
) -> DataFrame:
    """Gopher-style repetition/shape filter rules (Rae et al. 2021,
    "Scaling Language Models", appendix A1.1 — public paper): per-doc
    boolean outcomes for the word-count band, mean-word-length band,
    symbol-to-char ratio, and stopword-presence heuristics, plus the
    conjunctive keep verdict.

    One scan: every rule is a Column over the same tokenization —
    Catalyst collapses the shared subexpressions; adding a rule adds
    an expression, not a pass.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = norm_tokens(F.col("text"))
    n_words = F.array_size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    ) / F.greatest(n_words, F.lit(1))
    n_symbols = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
    symbol_ratio = n_symbols / F.greatest(F.length(F.col("text")), F.lit(1))
    stop = F.array(*[F.lit(s) for s in ("the", "a", "of", "to", "and", "in", "is")])
    stop_frac = F.size(F.array_intersect(toks, stop)) / F.lit(7.0)

    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    ok_sym = symbol_ratio <= max_symbol_ratio
    ok_stop = stop_frac >= min_stopword_frac
    return d.select(
        "doc_id",
        "source",
        n_words.cast("long").alias("n_words"),
        r6(mean_wl).alias("mean_word_len"),
        r6(symbol_ratio).alias("symbol_ratio"),
        r6(stop_frac).alias("stopword_presence"),
        ok_words.alias("pass_word_count"),
        ok_wl.alias("pass_word_length"),
        ok_sym.alias("pass_symbol_ratio"),
        ok_stop.alias("pass_stopwords"),
        (ok_words & ok_wl & ok_sym & ok_stop).alias("keep"),
    )


def doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document unigram Shannon entropy (bits): low entropy =
    repetitive/templated text (the information-theoretic twin of the
    repetition_filter heuristics), high entropy = diverse vocabulary.

    Shape: explode -> per-(doc, term) counts -> per-doc entropy fold.
    Both aggregations are map-side combinable on (doc_id[, term]);
    output is one row per document.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source", F.explode(norm_tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "source", "term").agg(F.count(F.lit(1)).alias("tf"))
    per_doc = tf.groupBy("doc_id", "source").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.log2(F.col("tf"))).alias("sum_flogf"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    # H = log2(N) - (1/N) * sum(f * log2 f)  — one pass, no division
    # inside the aggregate
    h = F.log2(F.col("n_tokens")) - F.col("sum_flogf") / F.col("n_tokens")
    return per_doc.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        r6(h).alias("entropy_bits"),
        r6(h / F.log2(F.greatest(F.col("n_distinct"), F.lit(2)))).alias("entropy_norm"),
    )


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency diagnostic per source: least-squares slope
    of log2(freq) on log2(rank) over that source's term distribution
    (natural text ≈ -1; synthetic/templated corpora deviate — a cheap
    distribution-shift alarm between ingest batches).

    Ranks come from one window over the per-source term counts
    (shuffle on source); the regression is a five-sum fold — no
    second pass, bounded output (one row per source).

    Scale note: the rank window holds one source's VOCABULARY (not
    its corpus) per task — vocabularies grow sublinearly (Heaps'
    law), so this survives far past the corpus sizes that break
    row-level windows; for extreme vocabularies, fit on the top-N
    terms via a TakeOrdered pre-filter (the head of the rank-
    frequency curve determines the slope anyway).
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(norm_tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.col("freq").desc(), F.col("term").asc())
    ranked = tf.withColumn("rank", F.row_number().over(w))
    x = F.log2(F.col("rank").cast("double"))
    y = F.log2(F.col("freq").cast("double"))
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return agg.select(
        "source",
        F.col("n_terms").cast("long").alias("n_terms"),
        r6(slope).alias("zipf_slope"),
        r6(intercept).alias("zipf_intercept"),
    ).orderBy("source")


def term_source_association(
    spark: SparkSession, sf_dir: str, top_k: int = 3, min_df: int = 5
) -> DataFrame:
    """Most source-characteristic terms: for each source, the top-k
    terms by pointwise mutual information between term and source
    (document-frequency based) — the feature-selection mart a
    source-classifier or mixture-debugging pass starts from.

    PMI = log2( P(term | source) / P(term) ) over document frequency.
    Shapes: distinct (doc, term) explode -> two aggregates that share
    the exploded scan (per-source-term df and per-term df) joined on
    term, then a top-k window per source. All keys are low-cardinality
    after aggregation; the explode is the only corpus-sized stage.
    The per-source window input is the min_df-filtered vocabulary
    (sublinear in corpus size); raise ``min_df`` to bound it harder.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    doc_terms = d.select(
        "doc_id", "source", F.explode(F.array_distinct(norm_tokens(F.col("text")))).alias("term")
    )
    n_docs = d.count()  # scalar dimension (driver-side count of a metadata agg)
    st = doc_terms.groupBy("source", "term").agg(F.count(F.lit(1)).alias("df_st"))
    t = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs_s"))
    joined = (
        st.join(t, "term")
        .join(F.broadcast(s), "source")
        .filter(F.col("df_t") >= min_df)
    )
    pmi = F.log2(
        (F.col("df_st") / F.col("n_docs_s")) / (F.col("df_t") / F.lit(float(n_docs)))
    )
    w = Window.partitionBy("source").orderBy(F.round(pmi, 6).desc(), F.col("term").asc())
    return (
        joined.withColumn("pmi", r6(pmi))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            "source",
            F.col("rk").cast("int").alias("rank"),
            "term",
            F.col("df_st").cast("long").alias("df_in_source"),
            F.col("df_t").cast("long").alias("df_total"),
            "pmi",
        )
    )
