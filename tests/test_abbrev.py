"""F3/F4 abbreviation detection + resolution."""

from __future__ import annotations

from veealign_spark.operators import abbrev


def test_resolution_roundtrip(spark):
    rows = [
        ("s", "PC_Member", None),                 # PC should resolve
        ("s", "ProgramCommittee", None),          # expansion: initials PC
        ("s", "PaperCommittee", None),            # competing PC expansion
        ("s", "ABC_Track", None),                 # no expansion exists
        ("s", "SessionChair", None),
    ]
    concepts = spark.createDataFrame(rows, "src string, id string, label string")

    det = {(r["name"], r["abbr"]) for r in abbrev.detect_abbreviations(concepts).collect()}
    assert ("PC_Member", "PC") in det and ("ABC_Track", "ABC") in det

    res = abbrev.resolve_abbreviations(concepts, min_sim=-1.0)  # keep top-1 regardless
    got = {(r["key"], r["abbr"]): r["expansion"] for r in res.collect()}
    assert got[("s#PC_Member", "PC")] in ("ProgramCommittee", "PaperCommittee")
    assert ("s#ABC_Track", "ABC") not in got  # nothing spells ABC

    applied = abbrev.apply_abbreviations(concepts, res)
    names = {r["id"]: r["resolved_name"] for r in applied.collect()}
    assert names["PC_Member"].endswith("Member") and "PC" not in names["PC_Member"]
    assert names["ABC_Track"] == "ABC_Track"
    assert names["SessionChair"] == "SessionChair"


def test_multiple_acronyms_single_row(spark):
    """A name with two resolved acronyms yields ONE row with BOTH
    expanded (not one partially-rewritten row per acronym)."""
    from veealign_spark.operators import abbrev

    concepts = spark.createDataFrame(
        [
            ("s", "PC_AI_Review", None),
            ("s", "Program_Committee", None),
            ("s", "Artificial_Intelligence", None),
        ],
        "src string, id string, label string",
    )
    resolved = spark.createDataFrame(
        [
            ("s#PC_AI_Review", "PC", "Program_Committee", 0.99),
            ("s#PC_AI_Review", "AI", "Artificial_Intelligence", 0.99),
        ],
        "key string, abbr string, expansion string, sim double",
    )
    out = abbrev.apply_abbreviations(concepts, resolved)
    rows = {r["id"]: r["resolved_name"] for r in out.collect()}
    assert len(out.collect()) == 3  # one row per concept
    assert rows["PC_AI_Review"] == "program committee artificial intelligence Review"


def test_replacement_escaping(spark):
    """Expansions containing '$' or backslash are literal text, not
    regex group references."""
    from veealign_spark.operators import abbrev

    concepts = spark.createDataFrame(
        [("s", "USD_Amount", None)], "src string, id string, label string"
    )
    resolved = spark.createDataFrame(
        [("s#USD_Amount", "USD", "a$1\\2b", 0.99)],
        "key string, abbr string, expansion string, sim double",
    )
    out = abbrev.apply_abbreviations(concepts, resolved)
    name = out.collect()[0]["resolved_name"]
    assert "$1" in name.replace(" ", "") or "$" in name  # no group substitution crash
