"""M2 mention extraction: JVM regex path == pandas-UDF path ==
expected plant list; per-turn ordering invariant (input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from veealign_spark.sources import transcripts as st


def test_jvm_extraction_matches_expected(spark, transcripts_sdf, fixture_transcripts):
    _, expected = fixture_transcripts
    got = (
        st.extract_mentions(transcripts_sdf)
        .select("conv_id", "turn_idx", "src", "subj", "pred", "obj")
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = (
        expected.sort_values(["conv_id", "turn_idx", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    assert got.equals(want[got.columns.tolist()])


def test_pandas_extraction_matches_jvm(spark, transcripts_sdf):
    a = (
        st.extract_mentions(transcripts_sdf)
        .select("conv_id", "turn_idx", "subj", "pred", "obj")
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    b = (
        st.extract_mentions_pandas(transcripts_sdf)
        .select("conv_id", "turn_idx", "subj", "pred", "obj")
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_triples_match_planted(spark, transcripts_sdf, fixture_pair):
    """The deduplicated triple stage must recover exactly the planted
    triple set (minus Thing rows — P3) regardless of mention skew."""
    got = (
        st.mentions_to_triples(st.extract_mentions(transcripts_sdf))
        .toPandas()
        .sort_values(["src", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    want = fixture_pair["triples"]
    want = (
        want[(want["subj"] != "Thing") & (want["obj"] != "Thing")]
        .drop_duplicates()
        .sort_values(["src", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got[["src", "subj", "pred", "obj", "kind"]].equals(
        want[["src", "subj", "pred", "obj", "kind"]]
    )


def test_per_turn_text_invariant(spark, transcripts_sdf, fixture_transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering, after a round-trip through a staging
    repartition (the shape a shuffle could break if ordering were
    implicit)."""
    transcripts, _ = fixture_transcripts
    round_trip = (
        transcripts_sdf.repartition(16, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        transcripts[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert round_trip.equals(want)
