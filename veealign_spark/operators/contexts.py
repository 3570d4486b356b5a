"""Multifaceted context construction (A1-A5, G1-G2; SURVEY.md §2.4/§2.7).

Reproduces the reference's demarcated 4-slot neighbourhood semantics
(data_preprocessing.py:254-309):

  slot 0: root paths — every ancestor chain [entity, parent, ..., root]
          (path_to_root, data_preprocessing.py:85-96; entities with no
          parents get an empty slot 0)
  slot 1: children via Subclass (child -> parent's slot only)
  slot 2: object-property neighbours, both directions
  slot 3: datatype-property neighbours, both directions
  self-loops skipped everywhere (data_preprocessing.py:260-261)

bag_of_neighbours=True wraps each of slots 1-3 into a single bag-path
(data_preprocessing.py:286-289); root paths stay paths.

DETERMINISM NOTE (documented divergence): the reference's path/
neighbour ordering is Python-dict insertion order; Spark's collect_list
is nondeterministic, so this engine canonicalizes by *sorting* paths
lexicographically before max_paths truncation. The numpy oracle used
for golden tests applies the same canonical order, so parity holds.

SCALE NOTES: root-path enumeration is the iterative-join pattern (cf.
"Fast Parallel Path Concatenation", ICDE 2018 — PAPERS.md): a bounded
BFS over the parent-edge table, localCheckpoint per iteration to cut
lineage (the reference recursion has no cycle guard — Quirk Q5 — the
iteration bound is the guard here). Paths are capped per entity at
max_paths *early* (window top-k) so the context table, not just the
final tensor, stays bounded. All groupBys are map-side-combinable
(collect_list over pre-truncated arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _empty_paths():
    return F.array().cast("array<array<string>>")


def _drop_thing(triples: DataFrame) -> DataFrame:
    """P3 (ontology.py:205): Thing endpoints never enter contexts."""
    return triples.filter((F.col("subj") != "Thing") & (F.col("obj") != "Thing"))


def subclass_edges(triples: DataFrame) -> DataFrame:
    """Deduplicated (src, child, parent) edges, Thing/self filtered."""
    return (
        _drop_thing(triples)
        .filter(F.col("kind") == "Subclass")
        .filter(F.col("subj") != F.col("obj"))
        .select("src", F.col("subj").alias("child"), F.col("obj").alias("parent"))
        .dropDuplicates()
    )


def build_root_paths(
    triples: DataFrame, max_pathlen: int = 26, max_paths_per_entity: int | None = 64
) -> DataFrame:
    """G1: enumerate ancestor chains as (src, entity, path) rows.

    Iterative DataFrame BFS: a frontier of partial paths extends by one
    parent hop per iteration; paths whose head has no parent are final.
    Bounded by max_pathlen hops (cycle guard + matches the reference's
    to_feature truncation, train.py:372-382, so no information the
    kernel would use is lost). Per-entity fan-out capped at
    max_paths_per_entity (scale guard for pathological DAGs).
    """
    edges = subclass_edges(triples).localCheckpoint(eager=True)

    frontier = edges.select(
        "src",
        F.col("child").alias("entity"),
        F.array("child", "parent").alias("path"),
        F.col("parent").alias("head"),
    )
    done = None
    # hop 1 already used one edge; continue until path has max_pathlen nodes
    for _ in range(max_pathlen - 2):
        if frontier.isEmpty():
            break
        joined = frontier.join(
            edges.select(
                F.col("src").alias("e_src"),
                F.col("child").alias("e_child"),
                F.col("parent").alias("e_parent"),
            ),
            (F.col("src") == F.col("e_src")) & (F.col("head") == F.col("e_child")),
            "left",
        )
        # a parent already on the path is a cycle (Quirk Q5): emit the
        # path as-is, exactly like hitting a root
        is_cycle = F.array_position("path", F.col("e_parent")) > 0
        finished = joined.filter(
            F.col("e_parent").isNull() | is_cycle
        ).select("src", "entity", "path")
        done = finished if done is None else done.unionByName(finished)
        frontier = (
            joined.filter(F.col("e_parent").isNotNull() & ~is_cycle)
            .select(
                "src",
                "entity",
                F.concat("path", F.array("e_parent")).alias("path"),
                F.col("e_parent").alias("head"),
            )
            .localCheckpoint(eager=True)
        )
    remaining = frontier.select("src", "entity", "path")
    done = remaining if done is None else done.unionByName(remaining)
    done = done.dropDuplicates()
    if max_paths_per_entity:
        w = Window.partitionBy("src", "entity").orderBy(F.array_join("path", ""))
        done = (
            done.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_paths_per_entity)
            .drop("rn")
        )
    return done


def build_neighbour_contexts(
    triples: DataFrame, bag_of_neighbours: bool = False
) -> DataFrame:
    """A1/A2: exploded (src, entity, nbr_type, path) context rows for
    slots 1-3 (children / object-prop / datatype-prop)."""
    t = _drop_thing(triples).filter(F.col("subj") != F.col("obj")).dropDuplicates(
        ["src", "subj", "pred", "obj", "kind"]
    )
    obj = t.filter(F.col("kind") == "Object Property")
    dat = t.filter(F.col("kind") == "Datatype Property")
    sub = t.filter(F.col("kind") == "Subclass")

    def fwd(df: DataFrame, nbr_type: int) -> DataFrame:
        return df.select(
            "src",
            F.col("subj").alias("entity"),
            F.lit(nbr_type).alias("nbr_type"),
            F.col("obj").alias("nbr"),
        )

    def rev(df: DataFrame, nbr_type: int) -> DataFrame:
        return df.select(
            "src",
            F.col("obj").alias("entity"),
            F.lit(nbr_type).alias("nbr_type"),
            F.col("subj").alias("nbr"),
        )

    nbrs = (
        fwd(obj, 2)
        .unionByName(rev(obj, 2))
        .unionByName(fwd(dat, 3))
        .unionByName(rev(dat, 3))
        .unionByName(rev(sub, 1))  # child lands in parent's children slot
    )
    if bag_of_neighbours:
        return nbrs.groupBy("src", "entity", "nbr_type").agg(
            F.array_sort(F.collect_list("nbr")).alias("path")
        )
    return nbrs.select("src", "entity", "nbr_type", F.array("nbr").alias("path"))


def build_contexts(
    triples: DataFrame,
    bag_of_neighbours: bool = False,
    max_pathlen: int = 26,
) -> DataFrame:
    """G2: full 4-slot context table (CONTEXTS schema)."""
    paths = build_root_paths(triples, max_pathlen=max_pathlen).select(
        "src", "entity", F.lit(0).alias("nbr_type"), "path"
    )
    return paths.unionByName(build_neighbour_contexts(triples, bag_of_neighbours))


def assemble_features(
    contexts: DataFrame,
    max_types: int = 4,
    max_paths: int = 2,
    max_pathlen: int = 4,
) -> DataFrame:
    """Nest contexts into the kernel's [T, <=max_paths, <=max_pathlen]
    ragged layout per entity: (src, entity, features:
    array<array<array<string>>>). Canonical sorted order, then
    truncation — mirrors to_feature (train.py:372-382) with the sorted
    ordering documented above."""
    per_type = (
        contexts.withColumn("path", F.slice("path", 1, max_pathlen))
        .groupBy("src", "entity", "nbr_type")
        .agg(F.slice(F.array_sort(F.collect_list("path")), 1, max_paths).alias("paths"))
    )
    pivoted = (
        per_type.groupBy("src", "entity")
        .pivot("nbr_type", list(range(max_types)))
        .agg(F.first("paths"))
    )
    slots = [
        F.coalesce(F.col(str(t)), _empty_paths()).alias(f"slot{t}")
        for t in range(max_types)
    ]
    return pivoted.select("src", "entity", F.array(*slots).alias("features"))


def build_prop_contexts(triples: DataFrame) -> DataFrame:
    """A3: per-property (self, domains, ranges) context
    (data_preprocessing.py:294-302), sorted-canonical."""
    return (
        triples.filter(F.col("kind") != "Subclass")
        .groupBy("src", F.col("pred").alias("prop"))
        .agg(
            F.array_sort(F.collect_list("subj")).alias("domains"),
            F.array_sort(F.collect_list("obj")).alias("ranges"),
        )
    )


def derive_max_types(contexts: DataFrame) -> int:
    """A5: global max over entities of # non-empty neighbour types
    (data_preprocessing.py:318)."""
    row = (
        contexts.select("src", "entity", "nbr_type")
        .distinct()
        .groupBy("src", "entity")
        .agg(F.countDistinct("nbr_type").alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()
    )
    return int(row[0]["m"]) if row and row[0]["m"] is not None else 0
