"""Unit tests for F1-F5 normalization (SURVEY.md §2.6) and the
Column-vs-Python lockstep contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from veealign_spark.functions.text_norm import norm_label_col, normalize_term


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("ConferenceMember", "conference member"),           # F1 camel
        ("conference_member", "conference member"),          # F2 underscore
        ("PCMember", "PC member"),                           # acronym boundary
        ("hasAuthor", "author"),                             # F5 stopword 'has'
        ("camera-ready", "camera ready"),                    # hyphen strip
        ("rel_CameraReady", "rel camera ready"),
        ("ABC", "ABC"),                                      # pure acronym kept
        ("meta_Review9Draft", "meta review9 draft"),
    ],
)
def test_normalize_term(raw, expected):
    assert normalize_term(raw) == expected


def test_column_matches_python(spark):
    samples = [
        "ConferenceMember", "conference_member", "PCMember", "hasAuthor",
        "camera-ready", "rel_CameraReady", "ABC", "SessionChair", "x",
        "attr_registration_fee", "Meta9Review", "has", "A_B-C",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "raw string")
    got = {
        r["raw"]: r["norm"]
        for r in df.withColumn("norm", norm_label_col(F.col("raw"))).collect()
    }
    for s in samples:
        assert got[s] == normalize_term(s), s
