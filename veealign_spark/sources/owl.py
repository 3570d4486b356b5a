"""OWL/RDF-XML ontology source (S1 proper) — real ontology ingestion.

Re-derives the reference's RDF/XML extraction semantics (ontology.py)
as a pure-Python per-file parser feeding the engine's columnar tables:

- classes / candidate entity universe   (ontology.py:230-246, 252-257)
- object & datatype properties incl. (inverse-)functional variants
                                        (ontology.py:248-276... :259-276)
- domain x range property triples with union-class flattening
                                        (ontology.py:94-128)
- subclass edges incl. owl:Restriction / owl:someValuesFrom flattening
                                        (ontology.py:136-191)
- id -> rdfs:label mapping dict (P2)    (ontology.py:38-46, 224-227)
- xml:lang majority language (A10 real) (ontology.py:52-62)
- namespace extraction (F7)             (ontology.py:210-217)

Parsing is per-file imperative XML work — exactly the "small dimension
data" side of the engine. Ontologies are KB-sized (thousands of axioms)
while transcripts are the 100 TB fact side, so the default loader
parses on the driver; `load_triples_distributed` runs the same parser
inside mapInPandas over a file-path table for many-ontology fusion
workloads (one task per file, no driver involvement).

minidom prefix-tag matching is deliberate: the reference reads RDF/XML
as plain XML with literal prefixes ("owl:Class"), so URI-resolving
parsers would diverge on nonstandard-prefix documents. Parity with the
reference parser over all 16 conference-track ontologies is asserted in
tests/test_owl.py.
"""

from __future__ import annotations

import os
from xml.dom import minidom

from pyspark.sql import DataFrame, SparkSession

SUBCLASS = "Subclass"
OBJ_PROP = "Object Property"
DATA_PROP = "Datatype Property"

# ---------------------------------------------------------------------------
# low-level DOM helpers (reference: ontology.py:64-92)
# ---------------------------------------------------------------------------


def _children(el, tag: str) -> list:
    """Direct element children with a given prefixed tag name."""
    return [
        c
        for c in el.childNodes
        if c.nodeType == c.ELEMENT_NODE and c.tagName == tag
    ]


def _raw_id(el) -> str:
    """Attribute-priority id: rdf:ID > rdf:resource > rdf:about, local
    part after '#' and ';' (ontology.py:219-223)."""
    v = (
        el.getAttribute("rdf:ID")
        or el.getAttribute("rdf:resource")
        or el.getAttribute("rdf:about")
    )
    return v.split("#")[-1].split(";")[-1]


def _looks_coded(eid: str) -> bool:
    """Coded-id heuristic: >=3 digits and an underscore (ontology.py:224)."""
    return sum(ch.isdigit() for ch in eid) >= 3 and "_" in eid


def _strip_prefixes(eid: str) -> str:
    return eid.replace("UNDEFINED_", "").replace("DO_", "")


class _Extractor:
    """extract_ID closure over the per-document label mapping dict.

    Where the reference raises KeyError on a coded id absent from the
    mapping (and crashes), this falls back to the stripped raw id —
    behaviour is identical wherever the reference succeeds.
    """

    def __init__(self, mapping: dict[str, str]):
        self.mapping = mapping

    def __call__(self, el, check_coded: bool = True) -> str:
        eid = _raw_id(el)
        if check_coded and _looks_coded(eid) and eid in self.mapping:
            return self.mapping[eid]
        return _strip_prefixes(eid)


def _rdf_type_is(el, type_local: str) -> bool:
    """Does el carry a direct rdf:type child resolving to type_local?
    (ontology.py:83-92 has_attribute_value over '#'-suffix)."""
    return any(
        t.getAttribute("rdf:resource").split("#")[-1] == type_local
        for t in _children(el, "rdf:type")
    )


# ---------------------------------------------------------------------------
# per-section parsers
# ---------------------------------------------------------------------------


def _label_rows(root) -> list[tuple[str, str, str]]:
    """(raw_id, label, lang) for every class/property element carrying a
    direct rdfs:label child (ontology.py:38-62). raw_id is the UNRESOLVED
    id — this table IS the mapping dict."""
    rows = []
    for tag in ("owl:Class", "owl:ObjectProperty", "owl:DatatypeProperty"):
        for el in root.getElementsByTagName(tag):
            labels = _children(el, "rdfs:label")
            if not labels:
                continue
            node = labels[0].firstChild
            if node is None:
                continue
            rows.append(
                (
                    _strip_prefixes(_raw_id(el)),
                    node.nodeValue,
                    labels[0].getAttribute("xml:lang") or None,
                )
            )
    return rows


def _property_elements(root) -> tuple[list, list]:
    """(object_prop_els, data_prop_els): direct-child property elements
    plus (inverse-)functional properties rdf:typed to the matching kind
    (ontology.py:248-276)."""
    obj = list(_children(root, "owl:ObjectProperty"))
    dat = list(_children(root, "owl:DatatypeProperty"))
    for fn_tag in ("owl:FunctionalProperty", "owl:InverseFunctionalProperty"):
        for el in _children(root, fn_tag):
            if _rdf_type_is(el, "ObjectProperty"):
                obj.append(el)
            elif _rdf_type_is(el, "DatatypeProperty"):
                dat.append(el)
    return obj, dat


def _domain_range_triples(
    prop_els: list, kind: str, extract: _Extractor
) -> list[tuple[str, str, str, str]]:
    """(subj=domain, pred=prop, obj=range, kind) with union-class
    flattening: when the rdfs:domain/rdfs:range element has no inline
    id, every owl:Class descendant (unionOf members) contributes, and
    the product of domains x ranges is emitted (ontology.py:94-125,
    union_flag=0 branch)."""
    out = []
    for prop in prop_els:
        dom_els = _children(prop, "rdfs:domain")
        rng_els = _children(prop, "rdfs:range")
        if not dom_els or not rng_els:
            continue
        domains = [d for d in (extract(el) for el in dom_els) if d]
        ranges = [r for r in (extract(el) for el in rng_els) if r]
        if not domains:
            domains = [
                d
                for d in (
                    extract(el)
                    for el in dom_els[0].getElementsByTagName("owl:Class")
                )
                if d
            ]
        if not ranges:
            ranges = [
                r
                for r in (
                    extract(el)
                    for el in rng_els[0].getElementsByTagName("owl:Class")
                )
                if r
            ]
        pid = extract(prop)
        out.extend((d, pid, r, kind) for d in domains for r in ranges)
    return out


def _restriction_edge(sub_el, extract: _Extractor):
    """owl:Restriction flattening for one rdfs:subClassOf element
    (ontology.py:150-184): the someValuesFrom class becomes the subject,
    the restricted class the object, onProperty the predicate. Returns
    (subj_el, obj_el, pred_id, kind) of DOM elements/id or None."""
    restriction = sub_el.getElementsByTagName("owl:Restriction")
    if not restriction:
        return None
    props = _children(restriction[0], "owl:onProperty")
    some_vals = _children(restriction[0], "owl:someValuesFrom")
    if not props or not some_vals:
        return None
    prop_id = extract(props[0])
    sv_id = extract(some_vals[0])
    parent = sub_el.parentNode

    def nested(el, tag):
        hits = _children(el, tag)
        return hits[0] if hits else None

    if prop_id and sv_id:
        return (some_vals[0], parent, prop_id, OBJ_PROP)
    if prop_id and not sv_id:
        cls = nested(some_vals[0], "owl:Class")
        if cls is not None:
            return (cls, parent, prop_id, OBJ_PROP)
        return None
    # anonymous property: prefer a nested owl:ObjectProperty, fall back
    # to owl:DatatypeProperty (the reference's try/except ladder)
    for tag, kind in ((("owl:ObjectProperty"), OBJ_PROP), (("owl:DatatypeProperty"), DATA_PROP)):
        p = nested(props[0], tag)
        if p is None:
            continue
        if sv_id:
            return (some_vals[0], parent, extract(p), kind)
        cls = nested(some_vals[0], "owl:Class")
        if cls is not None:
            return (cls, parent, extract(p), kind)
    return None


def _subclass_triples(root, extract: _Extractor) -> list[tuple[str, str, str, str]]:
    """(subj=child, pred, obj=parent, kind) subclass + restriction edges
    (ontology.py:136-205). Thing endpoints and empty ids dropped for
    plain subclass edges, mirroring get_subclasses' final filter."""
    out = []
    for el in root.getElementsByTagName("rdfs:subClassOf"):
        inline = extract(el)
        if inline:
            # inline rdf:resource on the subClassOf tag: parent class
            pair = (extract(el.parentNode), "subclass_of", inline, SUBCLASS)
        else:
            level1 = _children(el, "owl:Class")
            if level1:
                sup = extract(level1[0])
                if not sup:
                    continue
                pair = (extract(el.parentNode), "subclass_of", sup, SUBCLASS)
            else:
                edge = _restriction_edge(el, extract)
                if edge is None:
                    continue
                subj_el, obj_el, pred, kind = edge
                pair = (extract(subj_el), pred, extract(obj_el), kind)
        subj, pred, obj, kind = pair
        if kind == SUBCLASS and (
            not subj or not obj or subj == "Thing" or obj == "Thing"
        ):
            continue
        if not subj or not obj or not pred:
            continue
        out.append((subj, pred, obj, kind))
    return out


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def ontology_name(path: str) -> str:
    """File stem with '-' -> '_' (data_preprocessing.py:188)."""
    return os.path.basename(path).rsplit(".", 1)[0].replace("-", "_")


def parse_owl(path: str) -> dict:
    """Parse one OWL/RDF-XML file into plain-Python rows.

    Returns {name, language, namespace, triples [(subj,pred,obj,kind)],
    entities [id], object_properties [id], data_properties [id],
    labels [(raw_id, label, lang)]}.

    http(s) paths are fetched like the reference does (ontology.py:
    18-19, trailing slash included) — no network in this sandbox, so
    that branch is exercised only against live URLs.
    """
    if path.startswith(("http://", "https://")):
        from urllib.request import urlopen

        doc = minidom.parse(urlopen(path + "/"))
    else:
        doc = minidom.parse(path)
    root = doc.documentElement
    labels = _label_rows(root)
    mapping = {raw: lab for raw, lab, _lang in labels}
    extract = _Extractor(mapping)

    obj_els, dat_els = _property_elements(root)
    triples = _domain_range_triples(obj_els, OBJ_PROP, extract)
    triples += _domain_range_triples(dat_els, DATA_PROP, extract)
    triples += _subclass_triples(root, extract)
    triples = sorted(set(triples))

    entities = sorted(
        {e for e in (extract(el) for el in root.getElementsByTagName("owl:Class")) if e}
    )

    langs = [lang for _i, _l, lang in labels if lang]
    language = min(
        (( -langs.count(lg), lg) for lg in set(langs)), default=(0, "en")
    )[1]

    # F7 namespace (ontology.py:210-217): xmlns if '#'-terminated, else
    # the first DOCTYPE entity value; None when neither is present.
    namespace = None
    rdf_roots = doc.getElementsByTagName("rdf:RDF")
    if rdf_roots:
        ns = rdf_roots[0].getAttribute("xmlns")
        if ns.endswith("#"):
            namespace = ns
        elif doc.doctype is not None and doc.doctype.entities.length:
            namespace = doc.doctype.entities.item(0).firstChild.nodeValue

    return {
        "name": ontology_name(path),
        "language": language,
        "namespace": namespace,
        "triples": triples,
        "entities": entities,
        "object_properties": sorted(
            {p for p in (extract(el) for el in obj_els) if p}
        ),
        "data_properties": sorted(
            {p for p in (extract(el) for el in dat_els) if p}
        ),
        "labels": labels,
    }


def ontology_tables(spark: SparkSession, paths: list[str]) -> dict[str, DataFrame]:
    """Parse ontology files into the engine's columnar tables.

    triples  (src, subj, pred, obj, kind)   — TRIPLES schema
    concepts (src, id, label)               — get_entities universe, P2
                                              label resolved when present
    props    (src, id, kind, label)
    labels   (src, id, label, lang)         — the raw mapping dict rows
    ontologies (src, language, namespace)
    """
    parsed = [parse_owl(p) for p in paths]
    t_rows, c_rows, p_rows, l_rows, o_rows = [], [], [], [], []
    for ont in parsed:
        src = ont["name"]
        label_of = {raw: lab for raw, lab, _ in ont["labels"]}
        t_rows += [(src, s, p, o, k) for (s, p, o, k) in ont["triples"]]
        c_rows += [(src, e, label_of.get(e)) for e in ont["entities"]]
        p_rows += [
            (src, p, OBJ_PROP, label_of.get(p)) for p in ont["object_properties"]
        ]
        p_rows += [
            (src, p, DATA_PROP, label_of.get(p)) for p in ont["data_properties"]
        ]
        l_rows += [(src, i, lab, lang) for (i, lab, lang) in ont["labels"]]
        o_rows.append((src, ont["language"], ont["namespace"]))
    return {
        "triples": spark.createDataFrame(
            t_rows, "src string, subj string, pred string, obj string, kind string"
        ),
        "concepts": spark.createDataFrame(
            c_rows, "src string, id string, label string"
        ),
        "props": spark.createDataFrame(
            p_rows, "src string, id string, kind string, label string"
        ),
        "labels": spark.createDataFrame(
            l_rows, "src string, id string, label string, lang string"
        ),
        "ontologies": spark.createDataFrame(
            o_rows, "src string, language string, namespace string"
        ),
    }


def load_triples_distributed(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Scale path for many-ontology fusion: one parse task per file via
    mapInPandas over a path table (no driver-side parsing, no collect)."""
    import pandas as pd

    def parse_fn(batches):
        for pdf in batches:
            for path in pdf["path"]:
                ont = parse_owl(path)
                if not ont["triples"]:
                    continue
                s, p, o, k = zip(*ont["triples"])
                yield pd.DataFrame(
                    {
                        "src": ont["name"],
                        "subj": list(s),
                        "pred": list(p),
                        "obj": list(o),
                        "kind": list(k),
                    }
                )

    path_df = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )
    return path_df.mapInPandas(
        parse_fn, "src string, subj string, pred string, obj string, kind string"
    )
