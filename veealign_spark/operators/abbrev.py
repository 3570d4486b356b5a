"""Abbreviation detection + resolution (F3/F4 + T1 composition).

Reference semantics (data_preprocessing.py:104-148, 160-176): find
acronym tokens (`[A-Z][A-Z]+`) in concept names; candidate expansions
are other concepts whose token initials spell the acronym; rank
candidates by embedding cosine of the two full names and keep the
top-1 if similarity > 0.9; rewrite the abbreviated name with the
expansion. Note the reference only runs this in the English training
path — inference always skips it (Quirk Q1) — so the KG pipeline does
not wire it in by default; it's provided as a standalone operator.

Expressed as: JVM regex extraction + initials expression + equi-join
on (acronym == initials) + vectorized embedding cosine + window top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from veealign_spark.functions.embeddings import DEFAULT_DIM, embed_udf_factory
from veealign_spark.functions.text_norm import cosine_expr, norm_label_col

ACRONYM_TOKEN = r"\b([A-Z][A-Z0-9]+)\b"


def detect_abbreviations(concepts: DataFrame) -> DataFrame:
    """(key, name, abbr) — one row per acronym token in a concept name
    (F3, data_preprocessing.py:104-110)."""
    base = concepts.select(
        F.concat_ws("#", "src", "id").alias("key"),
        F.col("id").alias("name"),
        F.explode(
            F.regexp_extract_all(
                F.regexp_replace("id", "[_-]", " "), F.lit(ACRONYM_TOKEN), F.lit(1)
            )
        ).alias("abbr"),
    )
    return base.dropDuplicates()


def initials_col(name) -> F.Column:
    """Acronym a multi-token name would spell (F3 counterpart
    construction, data_preprocessing.py:118-126)."""
    toks = F.split(norm_label_col(name), " ")
    return F.upper(
        F.array_join(F.transform(toks, lambda w: F.substring(w, 1, 1)), "")
    )


def resolve_abbreviations(
    concepts: DataFrame, min_sim: float = 0.9, dim: int = DEFAULT_DIM
) -> DataFrame:
    """(key, abbr, expansion, sim): per abbreviation the best-cosine
    expansion among same-source concepts whose initials spell it
    (T1 top-1 + threshold, data_preprocessing.py:141-148)."""
    embed = embed_udf_factory(dim)
    abbrs = detect_abbreviations(concepts)
    cands = concepts.select(
        F.col("src").alias("c_src"),
        F.col("id").alias("expansion"),
        initials_col(F.col("id")).alias("initials"),
        norm_label_col(F.col("id")).alias("exp_norm"),
    ).filter(F.size(F.split("exp_norm", " ")) >= 2)
    joined = (
        abbrs.withColumn("src", F.substring_index("key", "#", 1))
        .join(
            cands,
            (F.col("abbr") == F.col("initials")) & (F.col("src") == F.col("c_src")),
        )
        .filter(F.col("name") != F.col("expansion"))
        .withColumn("name_vec", embed(norm_label_col(F.col("name"))))
        .withColumn("exp_vec", embed(F.col("exp_norm")))
        .withColumn("sim", F.round(cosine_expr("name_vec", "exp_vec"), 9))
    )
    w = Window.partitionBy("key", "abbr").orderBy(
        F.col("sim").desc(), F.col("expansion").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("sim") > min_sim))
        .select("key", "abbr", "expansion", "sim")
    )


def _escape_replacement(col) -> F.Column:
    """Escape '\\' and '$' for use as a regexp_replace REPLACEMENT
    string (Java Matcher semantics: both are special there)."""
    return F.regexp_replace(
        F.regexp_replace(col, "\\\\", "\\\\\\\\"), "\\$", "\\\\\\$"
    )


def apply_abbreviations(concepts: DataFrame, resolved: DataFrame) -> DataFrame:
    """F4: rewrite abbreviated names with their resolved expansions
    (token-level replace), leaving unresolved names untouched.

    ALL of a concept's resolved acronyms apply to ONE output row (the
    reference rewrites the single name in place): resolutions aggregate
    per key (sorted for determinism) and fold over the name with one
    regexp_replace per acronym; replacement text is escaped so an
    expansion containing '$' or '\\' is taken literally."""
    keyed = concepts.withColumn("key", F.concat_ws("#", "src", "id"))
    r = resolved.groupBy("key").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("abbr"),
                    norm_label_col(F.col("expansion")).alias("exp_norm"),
                )
            )
        ).alias("repls")
    )
    out = keyed.join(r, "key", "left").withColumn(
        "resolved_name",
        F.when(
            F.col("repls").isNotNull(),
            F.trim(
                F.aggregate(
                    "repls",
                    F.regexp_replace("id", "[_-]", " "),
                    lambda acc, x: F.regexp_replace(
                        acc,
                        F.concat(F.lit(r"\b"), x["abbr"], F.lit(r"\b")),
                        _escape_replacement(x["exp_norm"]),
                    ),
                )
            ),
        ).otherwise(F.col("id")),
    )
    return out.select("src", "id", "label", "resolved_name")
