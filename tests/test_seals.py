"""SEALS-equivalent match entry point (plans/seals.py).

Pins the contract of the reference's SEALS wrapper
(SEALS-OAEI.py:64-368): two ontologies in, one Alignment-RDF file out
whose cells are the thresholded pipeline pairs with full IRIs rebuilt
from each ontology's namespace — and the Quirk Q4 fix: a pair with
zero properties must flow through instead of crashing
(SEALS-OAEI.py:312-313 np.max over an empty list).
"""

from __future__ import annotations

import os

import pytest

from veealign_spark.plans.oaei_eval import gold_keys, reference_config
from veealign_spark.plans.seals import match
from veealign_spark.sources.oaei import load_alignment_rdf

REF = "/root/reference/datasets/conference/ontologies"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


@needs_reference
def test_seals_match_roundtrips_to_engine_keys(spark, tmp_path):
    cfg = reference_config(max_paths=2, max_pathlen=2)
    res = match(
        spark,
        # trailing slash + file:// both accepted (SEALS-OAEI.py:13-16)
        "file://" + os.path.join(REF, "cmt.owl"),
        os.path.join(REF, "conference.owl") + "/",
        str(tmp_path),
        config=cfg,
    )
    assert os.path.basename(res["path"]) == "cmt-conference.rdf"
    assert res["onto1"] == "http://cmt"
    assert res["n_cells"] > 0

    loaded = load_alignment_rdf(spark, res["path"])
    assert loaded.count() == res["n_cells"]
    # every written measure clears the match threshold
    assert loaded.filter(f"measure < {res['threshold']}").count() == 0
    # IRI cells map back to engine keys: ent1 side is all cmt
    keys = gold_keys(loaded)
    assert (
        keys.filter("ent1 not like 'cmt#%'").count() == 0
        and keys.filter("ent2 not like 'conference#%'").count() == 0
    )


def _write_classes_only_owl(path, name, labels):
    cells = "\n".join(
        f'  <owl:Class rdf:ID="{lab}"><rdfs:label>{lab}</rdfs:label></owl:Class>'
        for lab in labels
    )
    path.write_text(
        f"""<?xml version="1.0"?>
<rdf:RDF xmlns="http://{name}#" xml:base="http://{name}"
    xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    xmlns:owl="http://www.w3.org/2002/07/owl#"
    xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#">
  <owl:Ontology rdf:about="http://{name}"/>
{cells}
</rdf:RDF>"""
    )


@needs_reference
def test_seals_q4_zero_property_candidates(spark, tmp_path):
    """Classes only, no properties on either side: the reference
    wrapper crashes here (Q4); ours must emit the class alignment."""
    p1 = tmp_path / "alpha.owl"
    p2 = tmp_path / "beta.owl"
    _write_classes_only_owl(p1, "alpha", ["Paper", "Review", "Chair"])
    _write_classes_only_owl(p2, "beta", ["Paper", "Review", "Venue"])
    res = match(
        spark,
        str(p1),
        str(p2),
        str(tmp_path),
        config=reference_config(max_paths=2, max_pathlen=2, threshold=0.99),
        one_to_one=True,
    )
    loaded = gold_keys(load_alignment_rdf(spark, res["path"]))
    got = {(r["ent1"], r["ent2"]) for r in loaded.collect()}
    assert got == {
        ("alpha#Paper", "beta#Paper"),
        ("alpha#Review", "beta#Review"),
    }
