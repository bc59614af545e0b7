"""Text analysis operators for a training-data pipeline.

All native Column expressions (codegen'd): language-ID n-gram
heuristic, quality scoring, token counting, rolling-hash document
fingerprinting, and the per-cluster type-entropy metric the reference
*describes* but never implements (README.md:35-38 — SURVEY.md A12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_tokens

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "es": ["el", "la", "los", "que", "de", "en", "un", "por"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit fraction."""
    words = word_tokens(F.lower(text))
    n = F.greatest(F.size(words), F.lit(1))

    def hit_frac(stopwords: list[str]):
        # single-arg lambda: 2-arg lambdas mean (element, index) in F.filter
        sw = tuple(stopwords)
        return F.size(F.filter(words, lambda w: w.isin(*sw))) / n

    return {lang: hit_frac(sw) for lang, sw in LANG_PROFILES.items()}


def lang_id(text: Column, min_score: float = 0.05) -> Column:
    """argmax language by stopword fraction; 'und' (undetermined) below
    threshold. Deterministic tie-break by language code order."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(float(min_score))
    for lang in sorted(scores):  # later entries win only on strict >
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition quality signals."""
    t = F.col(text_col)
    words = word_tokens(t)
    n_words = F.size(words)
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(t, "[a-zA-Z0-9 ]", ""))
    n_distinct = F.size(F.array_distinct(words))
    return df.select(
        "*",
        n_words.cast("long").alias("q_n_words"),
        n_chars.cast("long").alias("q_n_chars"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("q_alpha_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("q_punct_ratio"),
        F.round(n_distinct / F.greatest(n_words, F.lit(1)), 6).alias("q_distinct_ratio"),
        F.round(
            F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double")
            / F.greatest(n_words, F.lit(1)),
            6,
        ).alias("q_avg_word_len"),
    )


def token_count(text: Column) -> Column:
    """BPE-ish token estimate: word tokens + punctuation runs counted
    separately (a cheap upper bound on subword counts)."""
    words = F.size(word_tokens(text))
    punct = F.size(
        F.filter(F.split(text, r"[a-zA-Z0-9\s]+"), lambda p: F.length(p) > 0)
    )
    return (words + punct).cast("long")


def rolling_fingerprint(text: Column, window: int = 16) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over character
    n-gram windows — a 1-permutation MinHash usable as a cheap
    near-identical-document key."""
    n = F.length(text)
    grams = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(window - 1)),
            lambda i: F.xxhash64(F.substr(text, i, F.lit(window))),
        ),
    ).otherwise(F.array(F.xxhash64(text)))
    return F.array_min(grams)


def cluster_type_entropy(
    df: DataFrame, cluster_col: str = "component", type_col: str = "pred_event_type"
) -> DataFrame:
    """Shannon entropy of the type distribution per cluster (A12):
    sum(-p * log2(p)). Low entropy = clean cluster (easy data)."""
    counts = df.groupBy(cluster_col, type_col).agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy(cluster_col).agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        counts.join(totals, cluster_col)
        .groupBy(cluster_col)
        .agg(F.round(F.sum(-p * F.log2(p)), 6).alias("type_entropy"))
    )
