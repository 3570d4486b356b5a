"""Distributed pair scoring — the dual-attention kernel as a Spark
operator (K1-K10; SURVEY.md §2.8).

Dataflow: candidates (ent1, ent2) are hash-joined to the nested
per-entity feature table (J6), then streamed through a single
`mapInPandas` over Arrow batches. Per batch, ragged string contexts
are normalized, resolved to embedding indices (J5 "embedify" — the
KeyError fallback of train.py:384-397 becomes the null-features direct
route, A6), padded to the dense [B, 2, T, P, L] layout (K10), and
scored with the pure-numpy kernel (kernel_np, K1-K9).

The embedding matrix + term indexer and the frozen kernel params ride
a SparkContext broadcast (the reference's frozen nn.Embedding,
train.py:248-250, was the same idea single-node). At a vocabulary too
large to broadcast, the scale path is pre-joining vec arrays onto the
exploded contexts instead — see build_embeddings_table, which already
materializes that dim table distributedly.

No per-row Python: everything crosses into Python only as Arrow
batches (input_hint requirement).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from veealign_spark.functions.embeddings import embed_terms_np, embed_udf_factory
from veealign_spark.functions.text_norm import norm_label_col, normalize_term
from veealign_spark.operators import adaptive, kernel_np
from veealign_spark.operators.kernel_np import KernelParams


def term_universe(
    triples: DataFrame,
    concepts: DataFrame | None = None,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """Distinct raw terms whose embeddings the kernel may look up:
    every subject/object/predicate local name (the reference embeds
    each unique extracted element once — data_preprocessing.py:192,
    the manual dedup-before-embed optimization). When a P2 label map
    is given, its labels join the universe — ids with rdfs:labels are
    embedded via their label (data_preprocessing.py:195-197)."""
    terms = (
        triples.select(F.col("subj").alias("term"))
        .unionByName(triples.select(F.col("obj").alias("term")))
        .unionByName(triples.select(F.col("pred").alias("term")))
    )
    if concepts is not None:
        terms = terms.unionByName(
            concepts.select(F.coalesce("label", "id").alias("term"))
        )
    if label_map is not None:
        terms = terms.unionByName(label_map.select(F.col("label").alias("term")))
    return terms.distinct()


def _substitute_labels(
    df: DataFrame, src_col, tok_col, label_map: DataFrame | None
):
    """P2 at the embed boundary (data_preprocessing.py:195-197,
    ontology.py:224-227): tokens that are labeled ids embed via their
    rdfs:label. Broadcast join on (src, id); returns df with `tok`
    replaced by coalesce(label, tok). No-op when label_map is None."""
    out = df.withColumn("__tok", tok_col).withColumn("__src", src_col)
    if label_map is None:
        return out
    # dedupe join keys: an id declared under several elements (legal
    # RDF/XML) would otherwise fan out rows and blow up the downstream
    # map_from_entries with duplicate map keys; keep the minimum label
    # per (src, id) — a deterministic stand-in for the reference
    # dict's first-writer-wins
    lm = label_map.groupBy(
        F.col("src").alias("__src"), F.col("id").alias("__tok")
    ).agg(F.min("label").alias("__label"))
    return (
        out.join(F.broadcast(lm), ["__src", "__tok"], "left")
        .withColumn("__tok", F.coalesce("__label", "__tok"))
        .drop("__label")
    )


def scalable_rank(
    df: DataFrame, key: str = "key", start: int = 1, idx_col: str = "idx",
    small_rows: int | None = None,
) -> DataFrame:
    """Deterministic dense global rank by `key`, size-adaptive.

    At or below `small_rows` (default adaptive.small_input_rows; env
    VEEALIGN_SMALL_INPUT_ROWS) a plain ``row_number() over (order by
    key)`` runs — one partition is correct AND fastest there (one pass,
    no census jobs). Above it, the scale path: range-repartition on the
    key, per-partition row_number, then add the cumulative partition-
    size offset (tiny driver census — one row per PARTITION, never per
    key), so no corpus-sized table crosses a single-partition exchange
    (the Window.orderBy scale-killer). Total order over a range
    partition is the global sort order, so both paths equal
    row_number() over a global sort.

    The input is materialized once (lazy localCheckpoint + count — one
    job) so the size probe and the rank read one upstream compute
    (upstream here is usually the embed UDF / term-universe distinct —
    the expensive part). Checkpoint blocks are context-cleaned when the
    DataFrame is released, unlike persist(), which pins blocks in the
    cache registry until an explicit unpersist (repeated callers such
    as limit_negatives in the k-fold loop were accumulating cached
    blocks for the session lifetime)."""
    if small_rows is None:
        small_rows = adaptive.small_input_rows()
    spark = df.sparkSession
    df = df.localCheckpoint(eager=False)
    if df.count() <= small_rows:
        return df.withColumn(
            idx_col,
            (F.row_number().over(Window.orderBy(key)) + F.lit(start - 1)).cast("long"),
        )
    n = max(spark.sparkContext.defaultParallelism, 2)
    ranked = (
        df.repartitionByRange(n, key)
        .sortWithinPartitions(key)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("__pid").orderBy(key)),
        )
        .localCheckpoint(eager=True)  # pin partition ids across reuse
    )
    counts = ranked.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    offsets, acc = [], start - 1
    for r in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((r["__pid"], acc))
        acc += r["c"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__pid int, __off long")
    return (
        ranked.join(F.broadcast(off_df), "__pid")
        .withColumn(idx_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def build_embeddings_table(
    spark: SparkSession,
    triples: DataFrame,
    dim: int,
    concepts: DataFrame | None = None,
    label_map: DataFrame | None = None,
    terms: DataFrame | None = None,
    external: DataFrame | None = None,
) -> DataFrame:
    """Distributed embeddings dim table (EMBEDDINGS schema): normalized
    term -> (idx, vec). Deterministic: idx assigned by sorted term rank
    via the two-level scalable_rank (no single-partition sort); idx 0
    stays reserved for the all-zero <UNK>/pad row — the row-0-zeros
    invariant, data_preprocessing.py:201,245.

    `external` is the bring-your-own-encoder seam (S3/S4 unified —
    the reference loads precomputed USE vectors,
    data_preprocessing.py:25-29, and merges a vector cache,
    train.py:72-87): a (term, vec:array<double>) table, any term
    spelling (normalized here; normalization is idempotent). Terms it
    covers take its vectors verbatim; uncovered terms fall back to the
    deterministic stub — so a deployment swaps encoders by publishing
    a vectors table, never touching engine code."""
    embed = embed_udf_factory(dim)
    base = terms if terms is not None else term_universe(triples, concepts, label_map)
    norm = (
        base.select(norm_label_col(F.col("term")).alias("key"))
        .filter(F.col("key") != "")
        .distinct()
    )
    ranked = scalable_rank(norm, "key")
    if external is None:
        return ranked.withColumn("vec", embed(F.col("key")))
    ext = normalize_external(external, dim).withColumnRenamed("vec", "__ext_vec")
    return (
        ranked.join(ext, "key", "left")
        .withColumn("vec", F.coalesce("__ext_vec", embed(F.col("key"))))
        .drop("__ext_vec")
    )


def normalize_external(external: DataFrame, dim: int | None = None) -> DataFrame:
    """Canonicalize a bring-your-own-encoder (term, vec) table into a
    (key, vec) table with exactly one row per normalized key. BOTH
    vector layouts (pre-joined build_embeddings_table and broadcast
    external_vec_map) resolve duplicates through this single function,
    so they can never silently pick different vectors for the same key:
    when several raw term spellings normalize to one key, the winner is
    min(vec) under Spark's lexicographic array ordering — a defined,
    layout-independent choice (the old per-path dropDuplicates kept an
    arbitrary partition-order row, ADVICE r4).

    `dim`: when given, wrong-length vectors FAIL FAST here (bounded
    limit(1) probe) instead of flowing a mis-shaped array into the
    kernel where it would surface as an opaque reshape error."""
    ext = (
        external.select(
            norm_label_col(F.col("term")).alias("key"),
            F.col("vec").cast("array<double>").alias("vec"),
        )
        .filter(F.col("key") != "")
    )
    if dim is not None:
        bad = ext.filter(F.size("vec") != dim).limit(1).collect()
        if bad:
            raise ValueError(
                f"external vectors table: key {bad[0]['key']!r} has "
                f"dimension {len(bad[0]['vec'])}, expected emb_dim={dim}"
            )
    return ext.groupBy("key").agg(F.min("vec").alias("vec"))


def external_vec_map(external: DataFrame, keys: list[str], dim: int | None = None) -> dict:
    """normalized-key -> np.ndarray for the given vocabulary slice of
    an external (term, vec) table. Inner join against the (bounded,
    driver-held) vocabulary then collect — the result is at most
    vocabulary-sized, the same bound the broadcast layout already
    lives under. Duplicate/shape handling delegates to
    normalize_external so both vector layouts resolve identically."""
    spark = external.sparkSession
    tdf = spark.createDataFrame([(k,) for k in keys], "key string")
    rows = (
        normalize_external(external, dim)
        .join(F.broadcast(tdf), "key")
        .collect()
    )
    return {r["key"]: np.asarray(r["vec"], dtype=np.float64) for r in rows}


class EmbBroadcast:
    """(indexer, matrix) broadcast pair. Row 0 is the zero UNK row.

    BOTH constructors pull the full vocabulary to the driver — that is
    the broadcast layout's defining constraint, bounded by
    PipelineConfig.vocab_broadcast_threshold (vector_mode="auto"
    switches to the pre-joined path above it; see the module banner).
    """

    def __init__(self, spark: SparkSession, emb_df: DataFrame, max_rows: int = 5_000_000):
        # limit-probe guard: costs one early-terminating job instead of
        # a full count (which would compute the whole embed-UDF plan
        # twice — once for the count, once for the toPandas)
        if emb_df.limit(max_rows + 1).count() > max_rows:
            raise ValueError(
                f"EmbBroadcast over more than {max_rows} terms would "
                "collect the whole vocabulary to the driver — use the "
                "pre-joined path (vector_mode='prejoined') instead"
            )
        pdf = emb_df.select("key", "idx", "vec").toPandas().sort_values("idx")
        vocab = pdf["key"].tolist()
        dim = len(pdf["vec"].iloc[0]) if len(pdf) else 32
        mat = np.zeros((len(vocab) + 1, dim), dtype=np.float64)
        for i, v in zip(pdf["idx"], pdf["vec"]):
            mat[int(i)] = np.asarray(v, dtype=np.float64)
        indexer = {k: int(i) for k, i in zip(pdf["key"], pdf["idx"])}
        sc = spark.sparkContext
        self.bc = sc.broadcast({"indexer": indexer, "matrix": mat})

    @classmethod
    def from_terms(
        cls, spark: SparkSession, terms: list[str], dim: int,
        max_rows: int = 5_000_000,
        external: DataFrame | None = None,
    ) -> "EmbBroadcast":
        """`external`: optional (term, vec) table — the bring-your-own
        -encoder seam (see build_embeddings_table). Covered keys take
        the external vectors verbatim; the stub fills the rest."""
        if len(terms) > max_rows:
            raise ValueError(
                f"EmbBroadcast.from_terms over {len(terms)} terms exceeds "
                f"max_rows={max_rows} — use the pre-joined path "
                "(vector_mode='prejoined') instead"
            )
        keys = sorted({normalize_term(t) for t in terms} - {""})
        mat = np.vstack([np.zeros((1, dim)), embed_terms_np(keys, dim)])
        if external is not None:
            ext = external_vec_map(external, keys, dim)
            for i, k in enumerate(keys):
                v = ext.get(k)
                if v is not None:
                    mat[i + 1] = v
        obj = cls.__new__(cls)
        obj.bc = spark.sparkContext.broadcast(
            {"indexer": {k: i + 1 for i, k in enumerate(keys)}, "matrix": mat}
        )
        return obj


def _local(key: str) -> str:
    return key.split("#", 1)[1] if "#" in key else key


def _resolve(tok: str, indexer: dict, cache: dict) -> int:
    idx = cache.get(tok)
    if idx is None:
        idx = indexer.get(normalize_term(_local(tok)), 0)
        cache[tok] = idx
    return idx


def _features_to_tensor(
    col: pd.Series, indexer: dict, cache: dict, T: int, P: int, L: int
) -> tuple[np.ndarray, np.ndarray]:
    """Ragged [T][P][L] string features -> dense int index tensor,
    plus a mask of rows that had no features at all (direct route)."""
    B = len(col)
    out = np.zeros((B, T, P, L), dtype=np.int64)
    missing = np.zeros(B, dtype=bool)
    for b, f in enumerate(col):
        if f is None or (isinstance(f, float) and pd.isna(f)):
            missing[b] = True
            continue
        for t in range(min(T, len(f))):
            paths = f[t]
            if paths is None:
                continue
            for pi in range(min(P, len(paths))):
                path = paths[pi]
                for li in range(min(L, len(path))):
                    out[b, t, pi, li] = _resolve(path[li], indexer, cache)
    return out, missing


def score_concept_candidates(
    candidates: DataFrame,
    features: DataFrame,
    emb_bc: EmbBroadcast,
    params: KernelParams,
    max_types: int = 4,
) -> DataFrame:
    """Score concept pairs -> (ent1, ent2, score). Null-feature rows
    take the direct raw-name-cosine route (A6, reference *intent*
    semantics — Quirk Q3 resolved to sim >= threshold)."""
    f = features.select(
        F.concat_ws("#", "src", "entity").alias("key"), F.col("features")
    )
    joined = (
        candidates.join(f.withColumnRenamed("key", "ent1").withColumnRenamed("features", "f1"), "ent1", "left")
        .join(f.withColumnRenamed("key", "ent2").withColumnRenamed("features", "f2"), "ent2", "left")
        .select("ent1", "ent2", "f1", "f2")
    )
    bc = emb_bc.bc
    p_dict = params.to_dict()
    T, P, L = max_types, params.max_paths, params.max_pathlen

    def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = bc.value
        indexer, mat = state["indexer"], state["matrix"]
        p = KernelParams.from_dict(p_dict)
        cache: dict = {}
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            n1 = np.array([_resolve(k, indexer, cache) for k in pdf["ent1"]])
            n2 = np.array([_resolve(k, indexer, cache) for k in pdf["ent2"]])
            f1, miss1 = _features_to_tensor(pdf["f1"], indexer, cache, T, P, L)
            f2, miss2 = _features_to_tensor(pdf["f2"], indexer, cache, T, P, L)
            direct = miss1 | miss2
            scores = np.zeros(B, dtype=np.float64)
            if (~direct).any():
                nodes = np.stack([n1[~direct], n2[~direct]], axis=1)
                feats = np.stack([f1[~direct], f2[~direct]], axis=1)
                scores[~direct] = kernel_np.score_concept_pairs(
                    nodes, feats, mat, p
                )
            if direct.any():
                scores[direct] = kernel_np.direct_cosine(
                    mat[n1[direct]], mat[n2[direct]]
                )
            yield pd.DataFrame(
                {"ent1": pdf["ent1"], "ent2": pdf["ent2"], "score": scores}
            )

    return joined.mapInPandas(score_fn, "ent1 string, ent2 string, score double")


def score_prop_candidates(
    candidates: DataFrame,
    prop_contexts: DataFrame,
    emb_bc: EmbBroadcast,
    params: KernelParams,
    max_prop_len: int = 16,
) -> DataFrame:
    """Score property pairs (K9): sum-pooled (self, domains, ranges)
    cosine mixture (train.py:339-346)."""
    pc = prop_contexts.select(
        F.concat_ws("#", "src", "prop").alias("key"), "domains", "ranges"
    )
    joined = (
        candidates.join(
            pc.select(
                F.col("key").alias("ent1"),
                F.col("domains").alias("d1"),
                F.col("ranges").alias("r1"),
            ),
            "ent1",
            "left",
        )
        .join(
            pc.select(
                F.col("key").alias("ent2"),
                F.col("domains").alias("d2"),
                F.col("ranges").alias("r2"),
            ),
            "ent2",
            "left",
        )
        .select("ent1", "ent2", "d1", "r1", "d2", "r2")
    )
    bc = emb_bc.bc
    p_dict = params.to_dict()
    M = max_prop_len

    def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = bc.value
        indexer, mat = state["indexer"], state["matrix"]
        p = KernelParams.from_dict(p_dict)
        cache: dict = {}

        def lists_to_idx(col: pd.Series) -> np.ndarray:
            out = np.zeros((len(col), M), dtype=np.int64)
            for b, lst in enumerate(col):
                if lst is None:
                    continue
                for i, tok in enumerate(lst[:M]):
                    out[b, i] = _resolve(tok, indexer, cache)
            return out

        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            feats = np.zeros((B, 2, 3, M), dtype=np.int64)
            for side, (ecol, dcol, rcol) in enumerate(
                [("ent1", "d1", "r1"), ("ent2", "d2", "r2")]
            ):
                feats[:, side, 0, 0] = [
                    _resolve(k, indexer, cache) for k in pdf[ecol]
                ]
                feats[:, side, 1, :] = lists_to_idx(pdf[dcol])
                feats[:, side, 2, :] = lists_to_idx(pdf[rcol])
            scores = kernel_np.score_property_pairs(feats, mat, p)
            yield pd.DataFrame(
                {"ent1": pdf["ent1"], "ent2": pdf["ent2"], "score": scores}
            )

    return joined.mapInPandas(score_fn, "ent1 string, ent2 string, score double")


# ---------------------------------------------------------------------------
# Fast path: JVM-side embedify (J5 as an actual broadcast join) + fixed-shape
# index tensors. Strings never cross into Python; Arrow ships int64 arrays
# and the UDF is pure numpy. This is the 100 TB layout — the slow path above
# is kept as the readable reference and for parity tests.
# ---------------------------------------------------------------------------

def emb_index_df(spark: SparkSession, emb_bc: EmbBroadcast) -> DataFrame:
    """(norm, idx) dim table from the broadcast indexer (tiny)."""
    items = list(emb_bc.bc.value["indexer"].items())
    return spark.createDataFrame(items, "norm string, idx long")


def _flat_feature_positions(P: int, L: int):
    """Ragged features -> array<struct<pos,tok>> with pos the row-major
    [t][p][l] position (shared by the index and pre-joined encoders)."""
    return F.flatten(
        F.transform(
            F.col("features"),
            lambda slot, t: F.flatten(
                F.transform(
                    slot,
                    lambda path, p: F.transform(
                        path,
                        lambda tok, l: F.struct(
                            (t * P * L + p * L + l).alias("pos"),
                            tok.alias("tok"),
                        ),
                    ),
                )
            ),
        )
    )


def encode_features(
    features: DataFrame,
    emb_idx: DataFrame,
    max_types: int = 4,
    max_paths: int = 2,
    max_pathlen: int = 4,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """(key, node_idx, fidx) with fidx a dense array<long> of length
    T*P*L laid out [t][p][l] (row-major), pad/UNK = 0.

    All string normalization + index resolution happens JVM-side via
    norm_label_col + a broadcast hash join; the ragged->dense scatter
    uses a position map (map_from_entries + sequence fill).
    """
    T, P, L = max_types, max_paths, max_pathlen
    flat = _flat_feature_positions(P, L)
    exploded = _substitute_labels(
        features.select(
            "src",
            F.concat_ws("#", "src", "entity").alias("key"),
            F.col("entity").alias("ent_local"),
            F.explode_outer(flat).alias("pt"),
        ),
        F.col("src"),
        F.col("pt.tok"),
        label_map,
    ).select(
        "key",
        "ent_local",
        F.col("__src").alias("e_src"),
        F.col("pt.pos").alias("pos"),
        norm_label_col(F.col("__tok")).alias("norm"),
    )
    joined = exploded.join(F.broadcast(emb_idx), "norm", "left").select(
        "key", "ent_local", "e_src", "pos", F.coalesce("idx", F.lit(0)).alias("idx")
    )
    dense = (
        joined.groupBy("key", "ent_local", "e_src")
        .agg(
            F.map_from_entries(
                F.array_agg(
                    F.when(
                        F.col("pos").isNotNull(),
                        F.struct(F.col("pos"), F.col("idx")),
                    )
                ).cast("array<struct<pos:int,idx:long>>")
            ).alias("m")
        )
        .select(
            "key",
            "ent_local",
            "e_src",
            F.transform(
                F.sequence(F.lit(0), F.lit(T * P * L - 1)),
                lambda i: F.coalesce(F.element_at("m", i.cast("int")), F.lit(0)),
            ).alias("fidx"),
        )
    )
    node = _substitute_labels(
        dense, F.col("e_src"), F.col("ent_local"), label_map
    ).select(
        "key", "fidx", norm_label_col(F.col("__tok")).alias("norm")
    ).join(F.broadcast(emb_idx), "norm", "left")
    return node.select(
        "key", F.coalesce("idx", F.lit(0)).alias("node_idx"), "fidx"
    )


def encode_node_idx(
    concepts_keys: DataFrame,
    emb_idx: DataFrame,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """(key, node_idx) for candidate entities (direct-route lookups)."""
    local = F.substring_index(F.col("key"), "#", -1)
    src = F.substring_index(F.col("key"), "#", 1)
    return (
        _substitute_labels(concepts_keys.select("key"), src, local, label_map)
        .select("key", norm_label_col(F.col("__tok")).alias("norm"))
        .join(F.broadcast(emb_idx), "norm", "left")
        .select("key", F.coalesce("idx", F.lit(0)).alias("node_idx"))
    )


def score_concept_candidates_fast(
    candidates: DataFrame,
    enc_features: DataFrame,
    emb_bc: EmbBroadcast,
    params: KernelParams,
    max_types: int = 4,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """Fast scorer over pre-encoded features. Rows missing an encoded
    entry take the direct cosine route (A6) using node indices resolved
    JVM-side the same way."""
    spark = candidates.sparkSession
    emb_idx = emb_index_df(spark, emb_bc)
    cand_keys = (
        candidates.select(F.col("ent1").alias("key"))
        .unionByName(candidates.select(F.col("ent2").alias("key")))
        .distinct()
    )
    nodes = encode_node_idx(cand_keys, emb_idx, label_map)
    f = enc_features.select("key", "node_idx", "fidx")
    # one per-key dim table (direct node idx + encoded features) joined
    # once per side — the 4-join form built the `nodes` subtree (a
    # distinct + normalize + broadcast join) TWICE and paid 4 broadcast
    # builds per scorer; nodes covers every candidate endpoint, so the
    # merged left join carries identical (n, fidx, d) values. The lazy
    # localCheckpoint shares one computation between both side joins.
    dim = (
        nodes.select("key", F.col("node_idx").alias("d"))
        .join(
            f.select("key", F.col("node_idx").alias("n"), "fidx"),
            "key",
            "left",
        )
        .localCheckpoint(eager=False)
    )
    j = (
        candidates.join(
            dim.select(
                F.col("key").alias("ent1"),
                F.col("n").alias("n1"),
                F.col("fidx").alias("f1"),
                F.col("d").alias("d1"),
            ),
            "ent1",
            "left",
        )
        .join(
            dim.select(
                F.col("key").alias("ent2"),
                F.col("n").alias("n2"),
                F.col("fidx").alias("f2"),
                F.col("d").alias("d2"),
            ),
            "ent2",
            "left",
        )
        .select("ent1", "ent2", "n1", "n2", "f1", "f2", "d1", "d2")
    )
    bc = emb_bc.bc
    p_dict = params.to_dict()
    T, P, L = max_types, params.max_paths, params.max_pathlen

    def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat = bc.value["matrix"]
        p = KernelParams.from_dict(p_dict)
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            miss = pdf["f1"].isna().to_numpy() | pdf["f2"].isna().to_numpy()
            scores = np.zeros(B, dtype=np.float64)
            if (~miss).any():
                sub = pdf[~miss]
                f1 = np.vstack(sub["f1"].to_numpy()).reshape(-1, T, P, L)
                f2 = np.vstack(sub["f2"].to_numpy()).reshape(-1, T, P, L)
                nodes_arr = np.stack(
                    [sub["n1"].to_numpy().astype(np.int64),
                     sub["n2"].to_numpy().astype(np.int64)], axis=1
                )
                feats = np.stack([f1, f2], axis=1)
                scores[~miss] = kernel_np.score_concept_pairs(
                    nodes_arr, feats, mat, p
                )
            if miss.any():
                sub = pdf[miss]
                v1 = mat[sub["d1"].fillna(0).to_numpy().astype(np.int64)]
                v2 = mat[sub["d2"].fillna(0).to_numpy().astype(np.int64)]
                scores[miss] = kernel_np.direct_cosine(v1, v2)
            yield pd.DataFrame(
                {"ent1": pdf["ent1"], "ent2": pdf["ent2"], "score": scores}
            )

    return j.mapInPandas(score_fn, "ent1 string, ent2 string, score double")


def encode_prop_contexts(
    prop_contexts: DataFrame,
    emb_idx: DataFrame,
    max_prop_len: int = 16,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """(key, self_idx, dom_idx, rng_idx) with dense array<long> of
    length max_prop_len per side. One explode + one groupBy for all
    three slots (tagged positions), JVM-encoded like encode_features."""
    M = max_prop_len
    base = prop_contexts.select(
        "src",
        F.concat_ws("#", "src", "prop").alias("key"),
        F.col("prop").alias("prop_local"),
        F.slice("domains", 1, M).alias("domains"),
        F.slice("ranges", 1, M).alias("ranges"),
    )
    # tagged flat positions: self at -1, domains at [0, M), ranges at [M, 2M)
    tagged = F.concat(
        F.array(F.struct(F.lit(-1).alias("pos"), F.col("prop_local").alias("tok"))),
        F.transform(
            F.col("domains"),
            lambda tok, i: F.struct(i.alias("pos"), tok.alias("tok")),
        ),
        F.transform(
            F.col("ranges"),
            lambda tok, i: F.struct((i + M).alias("pos"), tok.alias("tok")),
        ),
    )
    ex = _substitute_labels(
        base.select("src", "key", F.explode(tagged).alias("pt")),
        F.col("src"),
        F.col("pt.tok"),
        label_map,
    ).select(
        "key", F.col("pt.pos").alias("pos"), norm_label_col(F.col("__tok")).alias("norm")
    )
    jx = ex.join(F.broadcast(emb_idx), "norm", "left").select(
        "key", "pos", F.coalesce("idx", F.lit(0)).alias("idx")
    )
    dense = jx.groupBy("key").agg(
        F.map_from_entries(
            F.array_agg(F.struct(F.col("pos"), F.col("idx"))).cast(
                "array<struct<pos:int,idx:long>>"
            )
        ).alias("m")
    )
    fill = lambda lo: F.transform(  # noqa: E731
        F.sequence(F.lit(lo), F.lit(lo + M - 1)),
        lambda i: F.coalesce(F.element_at("m", i.cast("int")), F.lit(0)),
    )
    return dense.select(
        "key",
        F.coalesce(F.element_at("m", -1), F.lit(0)).alias("self_idx"),
        fill(0).alias("dom_idx"),
        fill(M).alias("rng_idx"),
    )


def score_prop_candidates_fast(
    candidates: DataFrame,
    enc_props: DataFrame,
    emb_bc: EmbBroadcast,
    params: KernelParams,
    max_prop_len: int = 16,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """Property scorer (K9). Pairs with no encoded context row (props
    that never appear with both domain and range — possible when the
    property universe comes from parsed OWL, S1) take the direct
    raw-name-cosine route, mirroring the reference's KeyError fallback
    (train.py:384-397, A6)."""
    M = max_prop_len
    spark = candidates.sparkSession
    emb_idx = emb_index_df(spark, emb_bc)
    cand_keys = (
        candidates.select(F.col("ent1").alias("key"))
        .unionByName(candidates.select(F.col("ent2").alias("key")))
        .distinct()
    )
    nodes = encode_node_idx(cand_keys, emb_idx, label_map)
    # merged per-key dim table, one join per side (see the concept
    # scorer note): nodes covers every candidate endpoint, so values
    # are identical to the old 4-join form
    dim = (
        nodes.select("key", F.col("node_idx").alias("d"))
        .join(
            enc_props.select("key", "self_idx", "dom_idx", "rng_idx"),
            "key",
            "left",
        )
        .localCheckpoint(eager=False)
    )
    j = (
        candidates.join(
            dim.select(
                F.col("key").alias("ent1"),
                F.col("self_idx").alias("s1"),
                F.col("dom_idx").alias("dm1"),
                F.col("rng_idx").alias("r1"),
                F.col("d").alias("d1"),
            ),
            "ent1",
            "left",
        )
        .join(
            dim.select(
                F.col("key").alias("ent2"),
                F.col("self_idx").alias("s2"),
                F.col("dom_idx").alias("dm2"),
                F.col("rng_idx").alias("r2"),
                F.col("d").alias("d2"),
            ),
            "ent2",
            "left",
        )
        .select("ent1", "ent2", "s1", "dm1", "r1", "s2", "dm2", "r2", "d1", "d2")
    )
    bc = emb_bc.bc
    p_dict = params.to_dict()

    def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mat = bc.value["matrix"]
        p = KernelParams.from_dict(p_dict)
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            miss = pdf["s1"].isna().to_numpy() | pdf["s2"].isna().to_numpy()
            scores = np.zeros(B, dtype=np.float64)
            if (~miss).any():
                sub = pdf[~miss]
                feats = np.zeros((len(sub), 2, 3, M), dtype=np.int64)
                for side, (s, dm, r) in enumerate(
                    [("s1", "dm1", "r1"), ("s2", "dm2", "r2")]
                ):
                    feats[:, side, 0, 0] = sub[s].to_numpy().astype(np.int64)
                    feats[:, side, 1, :] = np.vstack(sub[dm].to_numpy())
                    feats[:, side, 2, :] = np.vstack(sub[r].to_numpy())
                scores[~miss] = kernel_np.score_property_pairs(feats, mat, p)
            if miss.any():
                sub = pdf[miss]
                v1 = mat[sub["d1"].fillna(0).to_numpy().astype(np.int64)]
                v2 = mat[sub["d2"].fillna(0).to_numpy().astype(np.int64)]
                scores[miss] = kernel_np.direct_cosine(v1, v2)
            yield pd.DataFrame(
                {"ent1": pdf["ent1"], "ent2": pdf["ent2"], "score": scores}
            )

    return j.mapInPandas(score_fn, "ent1 string, ent2 string, score double")


def refresh_embeddings(
    existing: DataFrame | None, new_terms: DataFrame, dim: int
) -> DataFrame:
    """S3 embedding-cache merge: embed only terms absent from the
    existing dim table (the reference's pickle-cache merge loop,
    train.py:72-87, as an anti-join + union). `new_terms` has a
    single `term` column (raw); existing follows EMBEDDINGS schema
    minus idx (key, vec)."""
    norm_terms = (
        new_terms.select(norm_label_col(F.col("term")).alias("key"))
        .filter(F.col("key") != "")
        .distinct()
    )
    embed = embed_udf_factory(dim)
    if existing is None:
        fresh = norm_terms
        base = None
    else:
        base = existing.select("key", "vec")
        fresh = norm_terms.join(base.select("key"), "key", "left_anti")
    fresh_emb = fresh.withColumn("vec", embed(F.col("key")))
    merged = fresh_emb if base is None else base.unionByName(fresh_emb)
    return scalable_rank(merged, "key")


# ---------------------------------------------------------------------------
# Pre-joined-vector path: the distributed-vocabulary layout. When the
# term universe is too large to broadcast as an (indexer, matrix) pair
# (billions of distinct terms at 10^12-turn scale would OOM the driver),
# embedding vectors are JOINED onto the encoded features/candidates from
# the distributed dim table (build_embeddings_table) instead. No driver
# collect, no broadcast; the shuffle carries the vectors. Per-row payload
# is d/1 times heavier than the index path, so the broadcast path stays
# the default below PipelineConfig.vocab_broadcast_threshold.
# Output equals the broadcast path to within ~1 ulp (same float64
# vectors, same per-row math; BLAS tiling under different Arrow batch
# shapes can flip the last bit) — asserted by tests/test_prejoined.py.
# ---------------------------------------------------------------------------


def _zero_vec(dim: int):
    return F.array_repeat(F.lit(0.0), dim)


def _emb_vecs(emb_table: DataFrame) -> DataFrame:
    return emb_table.select(F.col("key").alias("norm"), "vec")


def encode_node_vec(
    keys_df: DataFrame,
    emb_table: DataFrame,
    dim: int,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """(key, node_vec) for candidate entities — direct-route lookups
    resolved by JOIN against the distributed dim table (zero vec when
    the name is out-of-vocabulary, matching matrix row 0)."""
    local = F.substring_index(F.col("key"), "#", -1)
    src = F.substring_index(F.col("key"), "#", 1)
    return (
        _substitute_labels(keys_df.select("key"), src, local, label_map)
        .select("key", norm_label_col(F.col("__tok")).alias("norm"))
        .join(_emb_vecs(emb_table), "norm", "left")
        .select("key", F.coalesce("vec", _zero_vec(dim)).alias("node_vec"))
    )


def encode_features_vec(
    features: DataFrame,
    emb_table: DataFrame,
    max_types: int = 4,
    max_paths: int = 2,
    max_pathlen: int = 4,
    dim: int = 32,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """(key, node_vec, fvec) with fvec a dense array<double> of length
    T*P*L*dim: the [t][p][l] position grid of encode_features with the
    embedding VECTOR pre-joined at each position (zero vec = pad/UNK).
    The scorer reshapes to [B, T, P, L, d] — the same vectors the
    broadcast path gathers via mat[fidx]."""
    T, P, L = max_types, max_paths, max_pathlen
    flat = _flat_feature_positions(P, L)
    exploded = _substitute_labels(
        features.select(
            "src",
            F.concat_ws("#", "src", "entity").alias("key"),
            F.col("entity").alias("ent_local"),
            F.explode_outer(flat).alias("pt"),
        ),
        F.col("src"),
        F.col("pt.tok"),
        label_map,
    ).select(
        "key",
        "ent_local",
        F.col("__src").alias("e_src"),
        F.col("pt.pos").alias("pos"),
        norm_label_col(F.col("__tok")).alias("norm"),
    )
    joined = exploded.join(_emb_vecs(emb_table), "norm", "left").select(
        "key",
        "ent_local",
        "e_src",
        "pos",
        F.coalesce("vec", _zero_vec(dim)).alias("vec"),
    )
    dense = (
        joined.groupBy("key", "ent_local", "e_src")
        .agg(
            F.map_from_entries(
                F.array_agg(
                    F.when(
                        F.col("pos").isNotNull(),
                        F.struct(F.col("pos"), F.col("vec")),
                    )
                ).cast("array<struct<pos:int,vec:array<double>>>")
            ).alias("m")
        )
        .select(
            "key",
            "ent_local",
            "e_src",
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(T * P * L - 1)),
                    lambda i: F.coalesce(
                        F.element_at("m", i.cast("int")), _zero_vec(dim)
                    ),
                )
            ).alias("fvec"),
        )
    )
    node = _substitute_labels(
        dense, F.col("e_src"), F.col("ent_local"), label_map
    ).select(
        "key", "fvec", norm_label_col(F.col("__tok")).alias("norm")
    ).join(_emb_vecs(emb_table), "norm", "left")
    return node.select(
        "key", F.coalesce("vec", _zero_vec(dim)).alias("node_vec"), "fvec"
    )


def score_concept_candidates_prejoined(
    candidates: DataFrame,
    enc_features_vec: DataFrame,
    emb_table: DataFrame,
    params: KernelParams,
    max_types: int = 4,
    dim: int = 32,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """Concept scorer with NO broadcast state: node/context vectors are
    pre-joined columns; the UDF is pure numpy over Arrow batches."""
    cand_keys = (
        candidates.select(F.col("ent1").alias("key"))
        .unionByName(candidates.select(F.col("ent2").alias("key")))
        .distinct()
    )
    nodes = encode_node_vec(cand_keys, emb_table, dim, label_map)
    f = enc_features_vec.select("key", "node_vec", "fvec")
    j = (
        candidates.join(
            f.select(
                F.col("key").alias("ent1"),
                F.col("node_vec").alias("n1"),
                F.col("fvec").alias("f1"),
            ),
            "ent1",
            "left",
        )
        .join(
            f.select(
                F.col("key").alias("ent2"),
                F.col("node_vec").alias("n2"),
                F.col("fvec").alias("f2"),
            ),
            "ent2",
            "left",
        )
        .join(
            nodes.select(F.col("key").alias("ent1"), F.col("node_vec").alias("d1")),
            "ent1",
            "left",
        )
        .join(
            nodes.select(F.col("key").alias("ent2"), F.col("node_vec").alias("d2")),
            "ent2",
            "left",
        )
        .select("ent1", "ent2", "n1", "n2", "f1", "f2", "d1", "d2")
    )
    p_dict = params.to_dict()
    T, P, L, D = max_types, params.max_paths, params.max_pathlen, dim

    def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = KernelParams.from_dict(p_dict)
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            miss = pdf["f1"].isna().to_numpy() | pdf["f2"].isna().to_numpy()
            scores = np.zeros(B, dtype=np.float64)
            if (~miss).any():
                sub = pdf[~miss]
                f1 = np.vstack(sub["f1"].to_numpy()).reshape(-1, T, P, L, D)
                f2 = np.vstack(sub["f2"].to_numpy()).reshape(-1, T, P, L, D)
                n1 = np.vstack(sub["n1"].to_numpy())
                n2 = np.vstack(sub["n2"].to_numpy())
                scores[~miss] = kernel_np.score_concept_pairs_emb(
                    np.stack([n1, n2], axis=1), np.stack([f1, f2], axis=1), p
                )
            if miss.any():
                sub = pdf[miss]
                zero = np.zeros(D, dtype=np.float64)
                v1 = np.vstack([zero if v is None else v for v in sub["d1"]])
                v2 = np.vstack([zero if v is None else v for v in sub["d2"]])
                scores[miss] = kernel_np.direct_cosine(v1, v2)
            yield pd.DataFrame(
                {"ent1": pdf["ent1"], "ent2": pdf["ent2"], "score": scores}
            )

    return j.mapInPandas(score_fn, "ent1 string, ent2 string, score double")


def encode_prop_contexts_vec(
    prop_contexts: DataFrame,
    emb_table: DataFrame,
    max_prop_len: int = 16,
    dim: int = 32,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """(key, self_vec, dom_vec, rng_vec) with dom/rng dense M*dim
    arrays in slot order — the vector twin of encode_prop_contexts."""
    M = max_prop_len
    base = prop_contexts.select(
        "src",
        F.concat_ws("#", "src", "prop").alias("key"),
        F.col("prop").alias("prop_local"),
        F.slice("domains", 1, M).alias("domains"),
        F.slice("ranges", 1, M).alias("ranges"),
    )
    tagged = F.concat(
        F.array(F.struct(F.lit(-1).alias("pos"), F.col("prop_local").alias("tok"))),
        F.transform(
            F.col("domains"),
            lambda tok, i: F.struct(i.alias("pos"), tok.alias("tok")),
        ),
        F.transform(
            F.col("ranges"),
            lambda tok, i: F.struct((i + M).alias("pos"), tok.alias("tok")),
        ),
    )
    ex = _substitute_labels(
        base.select("src", "key", F.explode(tagged).alias("pt")),
        F.col("src"),
        F.col("pt.tok"),
        label_map,
    ).select(
        "key", F.col("pt.pos").alias("pos"), norm_label_col(F.col("__tok")).alias("norm")
    )
    jx = ex.join(_emb_vecs(emb_table), "norm", "left").select(
        "key", "pos", F.coalesce("vec", _zero_vec(dim)).alias("vec")
    )
    dense = jx.groupBy("key").agg(
        F.map_from_entries(
            F.array_agg(F.struct(F.col("pos"), F.col("vec"))).cast(
                "array<struct<pos:int,vec:array<double>>>"
            )
        ).alias("m")
    )
    fill = lambda lo: F.flatten(  # noqa: E731
        F.transform(
            F.sequence(F.lit(lo), F.lit(lo + M - 1)),
            lambda i: F.coalesce(F.element_at("m", i.cast("int")), _zero_vec(dim)),
        )
    )
    return dense.select(
        "key",
        F.coalesce(F.element_at("m", -1), _zero_vec(dim)).alias("self_vec"),
        fill(0).alias("dom_vec"),
        fill(M).alias("rng_vec"),
    )


def score_prop_candidates_prejoined(
    candidates: DataFrame,
    enc_props_vec: DataFrame,
    emb_table: DataFrame,
    params: KernelParams,
    max_prop_len: int = 16,
    dim: int = 32,
    label_map: DataFrame | None = None,
) -> DataFrame:
    """Property scorer (K9) over pre-joined vectors; missing-context
    pairs take the direct-cosine route like the index path."""
    M = max_prop_len
    cand_keys = (
        candidates.select(F.col("ent1").alias("key"))
        .unionByName(candidates.select(F.col("ent2").alias("key")))
        .distinct()
    )
    nodes = encode_node_vec(cand_keys, emb_table, dim, label_map)
    j = (
        candidates.join(
            enc_props_vec.select(
                F.col("key").alias("ent1"),
                F.col("self_vec").alias("s1"),
                F.col("dom_vec").alias("dm1"),
                F.col("rng_vec").alias("r1"),
            ),
            "ent1",
            "left",
        )
        .join(
            enc_props_vec.select(
                F.col("key").alias("ent2"),
                F.col("self_vec").alias("s2"),
                F.col("dom_vec").alias("dm2"),
                F.col("rng_vec").alias("r2"),
            ),
            "ent2",
            "left",
        )
        .join(
            nodes.select(F.col("key").alias("ent1"), F.col("node_vec").alias("d1")),
            "ent1",
            "left",
        )
        .join(
            nodes.select(F.col("key").alias("ent2"), F.col("node_vec").alias("d2")),
            "ent2",
            "left",
        )
        .select("ent1", "ent2", "s1", "dm1", "r1", "s2", "dm2", "r2", "d1", "d2")
    )
    p_dict = params.to_dict()

    def score_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = KernelParams.from_dict(p_dict)
        D = None
        for pdf in batches:
            B = len(pdf)
            if B == 0:
                continue
            miss = pdf["s1"].isna().to_numpy() | pdf["s2"].isna().to_numpy()
            scores = np.zeros(B, dtype=np.float64)
            if (~miss).any():
                sub = pdf[~miss]
                if D is None:
                    D = len(sub["s1"].iloc[0])
                n = len(sub)
                feats = np.zeros((n, 2, 3, M, D), dtype=np.float64)
                for side, (s, dm, r) in enumerate(
                    [("s1", "dm1", "r1"), ("s2", "dm2", "r2")]
                ):
                    feats[:, side, 0, 0, :] = np.vstack(sub[s].to_numpy())
                    feats[:, side, 1] = np.vstack(sub[dm].to_numpy()).reshape(n, M, D)
                    feats[:, side, 2] = np.vstack(sub[r].to_numpy()).reshape(n, M, D)
                # sum over M in position order — identical to the index
                # path's emb[prop_features].sum(axis=-2)
                scores[~miss] = kernel_np.score_property_pairs_emb(
                    feats.sum(axis=-2), p
                )
            if miss.any():
                sub = pdf[miss]
                d0 = len(sub["d1"].iloc[0]) if sub["d1"].iloc[0] is not None else 32
                zero = np.zeros(d0, dtype=np.float64)
                v1 = np.vstack([zero if v is None else v for v in sub["d1"]])
                v2 = np.vstack([zero if v is None else v for v in sub["d2"]])
                scores[miss] = kernel_np.direct_cosine(v1, v2)
            yield pd.DataFrame(
                {"ent1": pdf["ent1"], "ent2": pdf["ent2"], "score": scores}
            )

    return j.mapInPandas(score_fn, "ent1 string, ent2 string, score double")
