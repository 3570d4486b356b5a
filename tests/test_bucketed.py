"""Bucketed staging tables: identically-bucketed tables must join with
no Exchange on either side (the co-located join that amortizes the
standing-KG shuffle across ingest runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from veealign_spark.sources import staging


@pytest.fixture()
def bucketed_tables(spark, triples_sdf):
    ents = (
        triples_sdf.select(F.concat_ws("#", "src", "subj").alias("entity"))
        .distinct()
        .withColumn("deg", F.length("entity"))
    )
    feats = ents.select("entity", F.md5("entity").alias("feat"))
    staging.write_bucketed(ents, "t_ents_b", "entity", 8)
    staging.write_bucketed(feats, "t_feats_b", "entity", 8)
    yield "t_ents_b", "t_feats_b"
    spark.sql("DROP TABLE IF EXISTS t_ents_b")
    spark.sql("DROP TABLE IF EXISTS t_feats_b")


@pytest.fixture()
def no_broadcast(spark):
    """Force the sort-merge path (fixture tables are under the auto-
    broadcast threshold; at staging scale they would be anyway)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    t1, t2 = bucketed_tables
    joined = staging.bucketed_join_ready(spark, t1, t2, "entity")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    # and the join result is correct
    n = joined.count()
    assert n == spark.table(t1).count()
    # the EXECUTED (AQE-final) plan is still exchange-free
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in final, final


def test_unbucketed_join_does_exchange(spark, bucketed_tables, triples_sdf, no_broadcast):
    """Control: the same join against a NON-bucketed side shuffles."""
    t1, _ = bucketed_tables
    plain = triples_sdf.select(
        F.concat_ws("#", "src", "subj").alias("entity")
    ).distinct()
    joined = spark.table(t1).join(plain, "entity")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
