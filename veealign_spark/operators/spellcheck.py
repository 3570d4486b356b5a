"""S5 — spellcheck, re-expressed distributed (SURVEY.md §2 last row).

The reference's spellchecker POSTs every concept label to a hosted
grammar API and splices in the first suggested replacement
(data_preprocessing.py:206-230; the path is disabled in its own config
— Quirk Q2 — and reads `inp_resolved` from module scope, so it only
ever ran by global-variable accident). An HTTP round-trip per label is
also the opposite of a 10^12-turn design, so this module re-expresses
the SEMANTICS — "replace a word not in the dictionary with its closest
dictionary word" — as a deterministic, fully distributed operator:

- the dictionary is data (corpus token frequencies above a floor, or
  any provided lexicon) instead of a remote service;
- candidate generation is the SymSpell deletion-neighborhood join:
  every word emits itself plus its 1-deletion variants as join keys,
  so any edit-distance-1 pair (insert/delete/substitute) shares a key
  — an equi-join, not a cross join;
- candidates are verified with JVM `levenshtein` and ranked by
  dictionary frequency (tie-break lexicographic) — the "first
  suggestion" of a frequency-sorted suggester.

Everything is Column expressions (deletion variants via
transform+substr, no Python UDF anywhere); the whole operator is
DuckDB-expressible and hash-checked by the `text_spellcheck` contract
query.

Skew note (100 TB): deletion keys of short words are Zipf-hot, so
tokens shorter than `min_len` are never corrected (the reference's
API similarly ignores short fragments) — that bounds any key's bucket
by the words within distance 1 of one short string, and AQE skew-join
handles the residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z]+"


def corpus_dictionary(
    documents: DataFrame, min_freq: int = 5, text_col: str = "text"
) -> DataFrame:
    """(word, freq) — lowercase alpha tokens at or above the floor.
    Map-side-combinable aggregation; dictionary-sized output."""
    toks = documents.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0))
        ).alias("word")
    )
    return (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )


def _deletion_keys(col):
    """word + each single-character deletion, as an array of join keys
    (pure expressions: transform over a length sequence + substr)."""
    n = F.length(col)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            col.substr(F.lit(1), i - F.lit(1)),
            col.substr(i + F.lit(1), n),
        ),
    )
    return F.array_union(F.array(col), dels)


def spellcheck_corrections(
    tokens: DataFrame,
    dictionary: DataFrame,
    token_col: str = "token",
    min_len: int = 4,
) -> DataFrame:
    """(token, corrected, freq) for every distinct token NOT in the
    dictionary that has an edit-distance-1 dictionary word; corrected =
    the most frequent such word (ties: lexicographically first). Known
    tokens and tokens without a candidate are absent — callers
    coalesce(corrected, token)."""
    tk = (
        tokens.select(F.col(token_col).alias("token"))
        .distinct()
        .filter(F.length("token") >= min_len)
        .join(
            dictionary.select(F.col("word").alias("token")), "token", "left_anti"
        )
    )
    tkeys = tk.select(
        "token", F.explode(_deletion_keys(F.col("token"))).alias("k")
    ).filter(F.col("k") != "")
    dkeys = dictionary.select(
        "word", "freq", F.explode(_deletion_keys(F.col("word"))).alias("k")
    ).filter(F.col("k") != "")
    cand = (
        tkeys.join(dkeys, "k")
        .filter(F.levenshtein("token", "word") <= 1)
        .select("token", "word", "freq")
        .dropDuplicates(["token", "word"])
    )
    w = Window.partitionBy("token").orderBy(F.col("freq").desc(), F.col("word"))
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("token", F.col("word").alias("corrected"), "freq")
    )


def spellcheck_text(
    documents: DataFrame,
    dictionary: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 4,
) -> DataFrame:
    """(id, text, corrected_text): every correctable token replaced in
    place, token order preserved (posexplode + ordered reassembly —
    corrections ride a token-level join, never per-row Python)."""
    toks = documents.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), F.lit(0))
        ).alias("pos", "token"),
    )
    corr = spellcheck_corrections(toks, dictionary, min_len=min_len)
    fixed = (
        toks.join(corr, "token", "left")
        .select("id", "pos", F.coalesce("corrected", "token").alias("tok"))
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("corrected_text")
        )
    )
    return documents.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).join(fixed, "id", "left")
