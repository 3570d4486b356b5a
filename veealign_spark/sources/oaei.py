"""OAEI Alignment-format RDF/XML sink + scan (S6 / S2).

The reference emits accepted pairs as OAEI Alignment-format cells
(test.py:226-265 `write_results`) and reads gold alignments back from
the same format (train.py:15-25 `load_alignments`). Interop with OAEI
tooling requires the exact element layout, so this is a faithful
re-derivation of the format from the public OAEI spec + the
reference's fixture files (e.g. datasets/conference/alignments/
cmt-conference.rdf): one <Cell> per pair with entity1/entity2
resources, a <measure> and <relation>=.

The sink is driver-side by design: alignment sets are entity-universe
-sized (thousands), not corpus-sized; the distributed representation
stays in the `alignments` table and this exporter is the last-mile
format bridge.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

HEADER = (
    '<?xml version="1.0" encoding="utf-8"?>\n'
    "<rdf:RDF xmlns='http://knowledgeweb.semanticweb.org/heterogeneity/alignment'\n"
    "         xmlns:rdf='http://www.w3.org/1999/02/22-rdf-syntax-ns#'\n"
    "         xmlns:xsd='http://www.w3.org/2001/XMLSchema#'>\n"
    "<Alignment>\n<xml>yes</xml>\n<level>0</level>\n<type>**</type>\n"
)
FOOTER = "</Alignment>\n</rdf:RDF>\n"


def write_alignment_rdf(
    accepted: DataFrame, path: str, onto1: str = "", onto2: str = ""
) -> int:
    """Serialize accepted pairs (ent1, ent2, score) to an OAEI
    Alignment-format file. Returns the number of cells written."""
    rows = (
        accepted.select("ent1", "ent2", "score")
        .orderBy("ent1", "ent2")
        .collect()
    )
    # attribute values sit in single quotes: saxutils.escape does NOT
    # escape quotes by default, so pass them explicitly or an IRI with
    # an apostrophe would emit malformed RDF/XML
    quotes = {"'": "&apos;", '"': "&quot;"}

    def attr(v: str) -> str:
        return escape(v, quotes)

    with open(path, "w", encoding="utf-8") as f:
        f.write(HEADER)
        if onto1:
            f.write(f"<onto1>{escape(onto1)}</onto1>\n")
        if onto2:
            f.write(f"<onto2>{escape(onto2)}</onto2>\n")
        for r in rows:
            f.write(
                "<map>\n<Cell>\n"
                f"<entity1 rdf:resource='{attr(r['ent1'])}'/>\n"
                f"<entity2 rdf:resource='{attr(r['ent2'])}'/>\n"
                f"<measure rdf:datatype='http://www.w3.org/2001/XMLSchema#float'>"
                f"{round(float(r['score']), 3)}</measure>\n"
                "<relation>=</relation>\n"
                "</Cell>\n</map>\n"
            )
        f.write(FOOTER)
    return len(rows)


def load_alignment_rdf(spark, path: str) -> DataFrame:
    """S2: parse an Alignment-format file back into a gold DataFrame
    (ent1, ent2, relation, measure) — the loader the reference uses
    for its gold fixtures (train.py:15-25)."""
    # the Alignment namespace appears both WITH and WITHOUT a trailing
    # '#' in real OAEI files (conference golds: bare; lebensmittel /
    # freizeit golds: '#') — probe which one this file uses
    tree = ET.parse(path)
    a_ns = "http://knowledgeweb.semanticweb.org/heterogeneity/alignment"
    if next(tree.iter(f"{{{a_ns}}}Cell"), None) is None:
        a_ns += "#"
    ns = {
        "a": a_ns,
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    }
    rows = []
    for cell in tree.iter(f"{{{ns['a']}}}Cell"):
        e1 = cell.find("a:entity1", ns).get(f"{{{ns['rdf']}}}resource")
        e2 = cell.find("a:entity2", ns).get(f"{{{ns['rdf']}}}resource")
        measure = cell.find("a:measure", ns)
        relation = cell.find("a:relation", ns)
        rows.append(
            (
                e1,
                e2,
                relation.text if relation is not None else "=",
                float(measure.text) if measure is not None else 1.0,
            )
        )
    return spark.createDataFrame(
        rows, "ent1 string, ent2 string, relation string, measure double"
    )
