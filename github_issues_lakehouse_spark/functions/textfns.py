"""Text-analysis Column expressions (all JVM-side, oracle-friendly).

Language ID, quality scoring, token counting, fingerprinting — the
text-analysis layer a training-data pipeline needs, expressed as
pure Catalyst expressions so they run inside whole-stage codegen
over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker-word lists for the heuristic classifier.
# (A real deployment swaps in fastText/CLD3 behind the same column
# contract; the heuristic keeps the operator deterministic and
# oracle-checkable.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "que"],
    "zh": ["de5", "shi4", "le5", "bu4", "wo3", "ni3", "ta1", "zai4"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "for", "on", "with", "as", "at", "by"]

# BPE-ish tokenizer: words, numbers, or single punctuation — the
# regex GPT-2 style tokenizers reduce to without the merges table.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def norm_tokens(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " ")


def whitespace_token_count(text: Column) -> Column:
    return F.array_size(norm_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    return F.array_size(
        F.filter(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0), lambda x: x != "")
    )


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.array_size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = norm_tokens(text)
    return {lang: _marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """argmax over marker-word hit counts; ties broken by language
    code order (deterministic); zero hits -> 'und'."""
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic tie order
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in reverse so earlier languages win ties
    for lang in reversed(langs):
        s = scores[lang]
        pick = s >= best_score
        best = F.when(s > 0, F.when(pick, F.lit(lang)).otherwise(best)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return best


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^\.\,\;\:\!\?]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    toks = norm_tokens(text)
    return _marker_hits(toks, STOPWORDS_EN) / F.greatest(F.array_size(toks), F.lit(1))


def repetition_ratio(text: Column) -> Column:
    """1 - distinct/total tokens: high = repetitive boilerplate."""
    toks = norm_tokens(text)
    return F.lit(1.0) - F.array_size(F.array_distinct(toks)) / F.greatest(
        F.array_size(toks), F.lit(1)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length sweet spot, some
    stopwords, low repetition, sane punctuation (Gopher/C4-style
    rule-of-thumb filters collapsed to a score)."""
    n_tok = whitespace_token_count(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 10000), 1.0).otherwise(0.3)
    stop_ok = F.when(stopword_ratio(text) >= 0.05, 1.0).otherwise(0.5)
    rep_pen = F.lit(1.0) - repetition_ratio(text)
    punct_pen = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.6)
    return len_ok * 0.3 + stop_ok * 0.2 + rep_pen * 0.3 + punct_pen * 0.2


def fingerprint_md5(text: Column) -> Column:
    """Content fingerprint of normalized text."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary"))


def rolling_hash_fingerprints(text: Column, window: int = 8, keep_every: int = 4) -> Column:
    """Winnowing-style rolling fingerprints: md5 of each ``window``-
    token shingle, keeping every ``keep_every``-th position — a
    deterministic, oracle-reproducible stand-in for mod-p Karp-Rabin
    selection (same output contract: array of shingle fingerprints).
    """
    toks = norm_tokens(text)
    cnt = F.array_size(toks)
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(cnt - (window - 1), F.lit(1))),
        lambda i: (i - 1) % keep_every == 0,
    )
    # slice+array_join touches only `window` tokens per element; the
    # per-position try_element_at form re-evaluates the tokenizer
    # inside the (interpreted) lambda
    return F.transform(
        starts, lambda i: F.md5(F.array_join(F.slice(toks, i, window), " ").cast("binary"))
    )
