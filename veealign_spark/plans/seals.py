"""SEALS-OAEI harness equivalent: match two ontologies, write Alignment RDF.

The reference ships a SEALS wrapper entry point (SEALS-OAEI.py:64-368):
given two ontology paths/URLs it scores every candidate pair with the
loaded model, keeps cells at or above the model threshold (no 1:1
resolution — that is test.py's evaluation step), rebuilds full entity
IRIs from each ontology's extracted namespace, and writes an OAEI
Alignment-format file named "<ns-name1>-<ns-name2>.rdf"
(SEALS-OAEI.py:223-262,355-368), printing its file:// URL.

This module re-expresses that entry point over the Spark pipeline.
Differences, both deliberate:

- Quirk Q4 fixed, not reproduced: the reference wrapper crashes when a
  pair yields zero property candidates (np.max over an empty list,
  SEALS-OAEI.py:312-313; its own test.py:311-315 guards the same code
  path, which SURVEY.md treats as canonical). Here the empty-property
  case flows through the normal pipeline; pinned by test_seals.py.
- Optional `one_to_one=True` applies the canonical test.py
  symmetric-best resolution before writing, for users who want the
  evaluated semantics rather than the raw SEALS emission.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veealign_spark.operators import canonicalize
from veealign_spark.plans.oaei_eval import _orient, reference_config
from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline
from veealign_spark.sources import owl
from veealign_spark.sources.oaei import write_alignment_rdf


def _local_path(p: str) -> str:
    """SEALS passes URLs; accept file:// and trailing-slash forms
    (SEALS-OAEI.py:13-16)."""
    p = p.rstrip("/")
    if p.startswith("file://"):
        p = p[len("file://") :]
    return p


def _ns_name(namespace: str | None, path: str) -> str:
    """Output-file name component from the ontology namespace, the way
    the reference derives it (SEALS-OAEI.py:361-362: namespace tail
    after the last '/', '#' and extension dropped); falls back to the
    file stem when no namespace was declared."""
    if not namespace:
        return os.path.basename(path).rsplit(".", 1)[0]
    tail = namespace.split("/")[-1].split("#")[0]
    return tail.rsplit(".", 1)[0] if "." in tail else tail


def _keys_to_iris(
    accepted: DataFrame, ns1: str, ns2: str
) -> DataFrame:
    """Rebuild full IRIs from engine keys "<onto>#<local>": namespace +
    local part (SEALS-OAEI.py:258 — ns is '#'-terminated)."""
    return accepted.select(
        F.concat(F.lit(ns1), F.substring_index("ent1", "#", -1)).alias("ent1"),
        F.concat(F.lit(ns2), F.substring_index("ent2", "#", -1)).alias("ent2"),
        "score",
    )


def match(
    spark: SparkSession,
    onto_path1: str,
    onto_path2: str,
    output_dir: str = ".",
    config: PipelineConfig | None = None,
    one_to_one: bool = False,
) -> dict:
    """Match two ontologies and write the Alignment-RDF result file.

    Returns {path, n_cells, threshold, onto1, onto2}. The acceptance
    threshold is the config-pinned one (the SEALS wrapper runs the
    shipped model's stored threshold; there is no gold to tune on at
    match time)."""
    p1, p2 = _local_path(onto_path1), _local_path(onto_path2)
    cfg = config or reference_config()
    tables = owl.ontology_tables(spark, [p1, p2])
    src1 = owl.ontology_name(p1)

    result = run_pipeline(
        spark,
        triples=tables["triples"],
        concepts=tables["concepts"],
        props=tables["props"],
        label_map=tables["labels"],
        config=cfg,
    )
    accepted = _orient(result["accepted"], src1)
    if one_to_one:
        accepted = _orient(
            canonicalize.one_to_one_filter(
                accepted.select("ent1", "ent2", "score")
            ),
            src1,
        )

    ns = {
        r["src"]: r["namespace"]
        for r in tables["ontologies"].select("src", "namespace").collect()
    }
    src2 = owl.ontology_name(p2)
    ns1 = ns.get(src1) or f"{src1}#"
    ns2 = ns.get(src2) or f"{src2}#"

    os.makedirs(output_dir, exist_ok=True)
    out = os.path.join(
        output_dir,
        f"{_ns_name(ns.get(src1), p1)}-{_ns_name(ns.get(src2), p2)}.rdf",
    )
    n = write_alignment_rdf(
        _keys_to_iris(accepted, ns1, ns2),
        out,
        onto1=ns1.rstrip("#"),
        onto2=ns2.rstrip("#"),
    )
    return {
        "path": out,
        "n_cells": n,
        "threshold": result["threshold"],
        "onto1": ns1.rstrip("#"),
        "onto2": ns2.rstrip("#"),
    }
