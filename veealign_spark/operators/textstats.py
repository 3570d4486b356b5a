"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, marker-based language ID, document fingerprinting.
All built-in JVM expressions (codegen'd, engine-portable for oracle
checks)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from veealign_spark.operators.dedup import shingles_col, tokens_col

# marker stopwords per language for the n-gram-heuristic language ID;
# deterministic and intentionally tiny (a real pipeline would plug a
# model here via the same operator shape)
LANG_MARKERS = {
    "en": ["the", "a", "value"],
    "dataeng": ["spark", "stream", "batch"],
    "olap": ["agg", "scan", "filter"],
}
STOPWORDS = ["the", "a"]


# BPE-ish subword segmentation (GPT-2-style pretokenizer approximation,
# alternation-only so the same pattern runs in Java regex AND RE2/
# DuckDB): contractions | space?-letter-run | space?-digit-run |
# space?-punct-run. Counts approximate LLM token budgets far better
# than whitespace tokens on code/punctuation-heavy text.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_tokens_col(text):
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), F.lit(0))


def token_stats(documents: DataFrame) -> DataFrame:
    toks = tokens_col(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(bpe_tokens_col(F.col("text"))).cast("long").alias("n_bpe_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Deterministic quality heuristics: length, stopword ratio, mean
    token length, type-token ratio, composite score."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS))).cast("double")
    mean_len = (F.length(F.regexp_replace("text", r"\s+", "")) / n).cast("double")
    ttr = F.size(F.array_distinct(toks)) / n
    return documents.select(
        "doc_id",
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(
            (1 - n_stop / n) * ttr * F.least(n / F.lit(100.0), F.lit(1.0)), 6
        ).alias("quality"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Marker-token voting language ID. Ties break by marker-set name
    order; zero votes -> 'unk'."""
    toks = tokens_col(F.col("text"))
    df = documents.select("doc_id", toks.alias("toks"))
    langs = sorted(LANG_MARKERS)
    for lang in langs:
        markers = LANG_MARKERS[lang]
        df = df.withColumn(
            f"v_{lang}", F.size(F.filter(F.col("toks"), lambda w: w.isin(*markers))).cast("long")
        )
    best = F.greatest(*[F.col(f"v_{lang}") for lang in langs])
    pred = F.lit("unk")
    for lang in reversed(langs):  # earlier name wins ties
        pred = F.when(
            (F.col(f"v_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        "doc_id", pred.alias("pred_lang"), *[F.col(f"v_{lang}") for lang in langs]
    )


def fingerprints(documents: DataFrame, shingle_n: int = 5) -> DataFrame:
    """Document fingerprint: min md5 over word n-grams (winnowing-style
    single fingerprint) + shingle cardinality."""
    sh = shingles_col(F.col("text"), shingle_n)
    documents = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    return documents.select(
        "doc_id",
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("fingerprint"),
        F.size(F.array_distinct(sh)).cast("long").alias("n_shingles"),
    )
