"""Training-side data plumbing (P5, T2, T4, T5) — deterministic forms.

The reference only needs these while TRAINING its matcher; this engine
consumes frozen weights, so they are not wired into the inference
pipeline. They are still implemented (and oracle-checked) because a
user running the reference's training data-prep on 100 TB needs the
same operations, and every nondeterministic step in the reference
(np.random.shuffle + slice) is re-expressed as a portable, seeded,
engine-independent ordering (md5 rank) so results are reproducible
across runs and engines.

Reference semantics:
- P5 holdout filter  (train.py:349-350): drop pairs whose
  (source of ent1, source of ent2) is in the held-out ontology-pair
  set (ontology_split mode).
- T2 negative limit  (train.py:537-541): cap false examples at
  max_false_examples after a shuffle — here the "shuffle" is the
  seeded md5 rank, so the kept subset is deterministic.
- T4 validation down-sampling (train.py:549-552): keep a fraction of
  examples — md5-bucket predicate, the same device as the T7 fold
  split.
- T5 order shuffle   (train.py:560-566): materialize a reproducible
  random-but-fixed batch order as an explicit rank column (Spark
  DataFrames are unordered; order must be data, not row position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from veealign_spark.operators.scoring import scalable_rank


def _shuffle_key(cols: list[str], seed: int):
    """Portable deterministic shuffle key: md5(seed || concat cols)."""
    return F.md5(F.concat_ws("|", F.lit(str(seed)), *[F.col(c) for c in cols]))


def holdout_filter(
    pairs: DataFrame, holdout: DataFrame, ent1: str = "ent1", ent2: str = "ent2"
) -> DataFrame:
    """P5: drop pairs whose source pair is held out. `holdout` has
    (src1, src2) rows; source = key prefix before '#'."""
    keyed = pairs.withColumn(
        "__src1", F.substring_index(ent1, "#", 1)
    ).withColumn("__src2", F.substring_index(ent2, "#", 1))
    h = holdout.select(
        F.col("src1").alias("__src1"), F.col("src2").alias("__src2")
    )
    return keyed.join(F.broadcast(h), ["__src1", "__src2"], "left_anti").drop(
        "__src1", "__src2"
    )


def limit_negatives(
    labeled: DataFrame,
    max_false: int,
    label_col: str = "y",
    key_cols: list[str] | None = None,
    seed: int = 13,
) -> DataFrame:
    """T2: keep every positive and at most `max_false` negatives,
    chosen by deterministic md5-shuffle rank (the reference's
    np.random.shuffle + slice, made reproducible). The rank runs
    through scalable_rank (range partition + per-partition row_number
    + offset census), so the negative pool never funnels through one
    task."""
    keys = key_cols or [c for c in labeled.columns if c != label_col]
    neg = labeled.filter(~F.col(label_col)).withColumn(
        "__sk", _shuffle_key(keys, seed)
    )
    neg_kept = (
        scalable_rank(neg, "__sk", idx_col="__rn")
        .filter(F.col("__rn") <= max_false)
        .drop("__sk", "__rn")
    )
    return labeled.filter(F.col(label_col)).unionByName(neg_kept)


def _hex_val(h, i: int):
    """Value of the i-th (1-based) hex digit of a lowercase hex string
    — portable SQL (ascii arithmetic evaluates identically in DuckDB,
    so the operator stays oracle-checkable)."""
    a = F.ascii(F.substring(h, i, 1))
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


def _pct_bucket(key_cols: list[str], seed: int):
    """Deterministic 0-99 bucket from the first FOUR hex digits of the
    md5 shuffle key, so the mod-100 residues are uniform to within
    1/65536 (a raw ascii-of-two-hex-chars bucket reaches only 88 of
    100 residues and skews the kept rate by up to ~11% relative).
    Portable: evaluates identically in DuckDB."""
    h = _shuffle_key(key_cols, seed)
    val = (
        _hex_val(h, 1) * 4096
        + _hex_val(h, 2) * 256
        + _hex_val(h, 3) * 16
        + _hex_val(h, 4)
    )
    return val % 100


def downsample(
    df: DataFrame, fraction: float, key_cols: list[str], seed: int = 29
) -> DataFrame:
    """T4: deterministic fraction via md5 percent-bucketing (keep a
    row iff its bucket falls under fraction*100). Granularity: 1%."""
    return df.filter(_pct_bucket(key_cols, seed) < int(round(fraction * 100)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    seed: int = 37,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Domain-mixing sampler: keep each row with ITS stratum's
    fraction (granularity 1%), deterministically — the standard
    re-weighting step when composing a training corpus from sources of
    uneven size/quality. Strata absent from `fractions` keep
    `default_fraction`.

    Scale shape: the fraction table rides as a map LITERAL inside a
    single codegen'd filter — no join, no shuffle, no driver state
    beyond the (tiny, by definition) mixture spec; corpus-linear and
    trivially partition-parallel. Same md5 percent-bucket as
    `downsample`, so a row's keep/drop decision is reproducible across
    runs and resumable pipelines."""
    bucket = _pct_bucket(key_cols, seed)
    pairs: list = []
    for k, v in fractions.items():
        pairs += [F.lit(k), F.lit(int(round(v * 100)))]
    pct = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)],
        F.lit(int(round(default_fraction * 100))),
    )
    return df.filter(bucket < pct)


def shuffled_rank(
    df: DataFrame, key_cols: list[str], seed: int = 41, out_col: str = "shuffle_rank"
) -> DataFrame:
    """T5: reproducible shuffle order as data, via scalable_rank — no
    single-partition window even on a corpus-sized input."""
    keyed = df.withColumn("__sk", _shuffle_key(key_cols, seed))
    return scalable_rank(keyed, "__sk", idx_col=out_col).drop("__sk")
