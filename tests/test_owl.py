"""S1 real-OWL ingestion: parser parity vs the reference implementation
on the actual OAEI conference fixtures, P2 label resolution, and the
end-to-end pipeline on a real ontology pair vs the real gold file.

The parity test imports the reference's own parser as the oracle (read-
only; executed, never copied) and asserts exact triple/entity/property
set equality on all 16 conference ontologies — the north_rule's
"matching the reference's emitted (subj, pred, obj) triples" check at
its strongest (P = R = 1.0).
"""

from __future__ import annotations

import glob
import os
import sys

import pytest
from pyspark.sql import functions as F

from veealign_spark.sources import owl

REF = "/root/reference"
ONTO_DIR = os.path.join(REF, "datasets/conference/ontologies")
ALIGN_DIR = os.path.join(REF, "datasets/conference/alignments")

needs_reference = pytest.mark.skipif(
    not os.path.isdir(ONTO_DIR), reason="reference checkout not present"
)


def _reference_ontology(path):
    sys.path.insert(0, os.path.join(REF, "src"))
    try:
        from ontology import Ontology  # the reference's own parser
    finally:
        sys.path.pop(0)
    return Ontology(path)


@needs_reference
def test_parser_parity_all_conference_ontologies():
    """Exact parse parity: triples, entity universe, property
    universes, and detected language match the reference parser on
    every conference-track ontology (P=R=1.0 over 1,695 triples)."""
    paths = sorted(glob.glob(os.path.join(ONTO_DIR, "*.owl")))
    assert len(paths) == 16
    for path in paths:
        ref = _reference_ontology(path)
        mine = owl.parse_owl(path)
        # reference 4-tuples are (subj, obj, pred, kind)
        ref_triples = set(ref.get_triples())
        my_triples = {(s, o, p, k) for (s, p, o, k) in mine["triples"]}
        assert my_triples == ref_triples, path
        assert set(mine["entities"]) == set(ref.get_entities()), path
        assert set(mine["object_properties"]) == set(
            ref.get_object_properties()
        ), path
        assert set(mine["data_properties"]) == set(ref.get_data_properties()), path
        assert mine["language"] == ref.language, path


@needs_reference
def test_ontology_tables_shapes(spark):
    t = owl.ontology_tables(
        spark,
        [os.path.join(ONTO_DIR, "cmt.owl"), os.path.join(ONTO_DIR, "conference.owl")],
    )
    assert t["triples"].columns == ["src", "subj", "pred", "obj", "kind"]
    srcs = {r["src"] for r in t["triples"].select("src").distinct().collect()}
    assert srcs == {"cmt", "conference"}
    kinds = {r["kind"] for r in t["triples"].select("kind").distinct().collect()}
    assert kinds <= {"Subclass", "Object Property", "Datatype Property"}
    assert t["concepts"].count() > 50
    assert t["props"].filter(F.col("kind") == "Object Property").count() > 10
    langs = dict(
        (r["src"], r["language"]) for r in t["ontologies"].collect()
    )
    assert langs == {"cmt": "en", "conference": "en"}


@needs_reference
def test_distributed_parse_matches_driver_parse(spark):
    paths = sorted(glob.glob(os.path.join(ONTO_DIR, "*.owl")))[:4]
    driver = owl.ontology_tables(spark, paths)["triples"]
    dist = owl.load_triples_distributed(spark, paths)
    assert driver.exceptAll(dist).isEmpty() and dist.exceptAll(driver).isEmpty()


def test_coded_id_label_resolution(tmp_path):
    """P2: coded ids (>=3 digits + underscore) resolve to rdfs:labels
    at parse time (ontology.py:224-227), and labels land in the labels
    table with their xml:lang."""
    doc = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns="http://toy#">
  <owl:Class rdf:ID="NCI_C12345">
    <rdfs:label xml:lang="en">Brain Structure</rdfs:label>
    <rdfs:subClassOf><owl:Class rdf:ID="NCI_C99990"/></rdfs:subClassOf>
  </owl:Class>
  <owl:Class rdf:ID="NCI_C99990">
    <rdfs:label xml:lang="en">Anatomy</rdfs:label>
  </owl:Class>
</rdf:RDF>"""
    p = tmp_path / "toy.owl"
    p.write_text(doc)
    parsed = owl.parse_owl(str(p))
    assert ("Brain Structure", "subclass_of", "Anatomy", "Subclass") in parsed[
        "triples"
    ]
    assert set(parsed["entities"]) == {"Brain Structure", "Anatomy"}
    assert ("NCI_C12345", "Brain Structure", "en") in parsed["labels"]
    assert parsed["language"] == "en"
    assert parsed["namespace"] == "http://toy#"


@needs_reference
def test_restriction_flattening_present():
    """owl:Restriction/someValuesFrom subclass axioms become object-
    property triples (ontology.py:150-184) — conference.owl has them."""
    parsed = owl.parse_owl(os.path.join(ONTO_DIR, "conference.owl"))
    kinds = {k for (_, _, _, k) in parsed["triples"]}
    assert "Object Property" in kinds
    # subclass edges never carry Thing endpoints
    for s, _p, o, k in parsed["triples"]:
        if k == "Subclass":
            assert s != "Thing" and o != "Thing"


@needs_reference
def test_e2e_real_pair_vs_real_gold(spark):
    """Full engine on cmt.owl x conference.owl scored against the
    actual OAEI gold alignment. Frozen seeded kernel weights (no
    published checkpoints), so the asserted floor is the measured
    engine number (P=0.75 / R=0.40 / F1=0.52 at the tuned threshold),
    not the trained model's."""
    from veealign_spark.plans.oaei_eval import evaluate_pair

    r = evaluate_pair(
        spark,
        os.path.join(ONTO_DIR, "cmt.owl"),
        os.path.join(ONTO_DIR, "conference.owl"),
        os.path.join(ALIGN_DIR, "cmt-conference.rdf"),
    )
    assert r["n_gold"] == 15
    assert r["raw"]["precision"] >= 0.70
    assert r["raw"]["recall"] >= 0.35
    assert r["raw"]["f1"] >= 0.45
    # 1:1 resolution never lowers precision
    assert r["one2one"]["precision"] >= r["raw"]["precision"]


def test_gold_key_mapping(spark):
    from veealign_spark.plans.oaei_eval import gold_keys

    g = spark.createDataFrame(
        [
            ("http://cmt#Conference", "http://conference#Conference_volume", "=", 1.0),
            ("http://crs-dr.owl#X", "http://ekaw#Y", "=", 1.0),
        ],
        "ent1 string, ent2 string, relation string, measure double",
    )
    rows = {(r["ent1"], r["ent2"]) for r in gold_keys(g).collect()}
    assert ("cmt#Conference", "conference#Conference_volume") in rows
    assert ("crs_dr#X", "ekaw#Y") in rows


@needs_reference
def test_parser_parity_german_ontologies():
    """Parse parity extended to the German single-pair tracks
    (lebensmittel / freizeit — reference README.md:63-78): exact
    triple/entity/property/language equality vs the reference parser
    on all 4 ontologies."""
    paths = sorted(
        glob.glob(os.path.join(REF, "datasets/lebensmittel/ontologies/*.owl"))
        + glob.glob(os.path.join(REF, "datasets/freizeit/ontologies/*.owl"))
    )
    assert len(paths) == 4
    for path in paths:
        ref = _reference_ontology(path)
        mine = owl.parse_owl(path)
        ref_triples = set(ref.get_triples())
        my_triples = {(s, o, p, k) for (s, p, o, k) in mine["triples"]}
        assert my_triples == ref_triples, path
        assert set(mine["entities"]) == set(ref.get_entities()), path
        assert mine["language"] == ref.language, path
