"""Physical-plan regression tests (BENCH/PLANS.md): lock in column
pruning, filter pushdown, and join strategy so a refactor can't
silently regress the 100 TB-relevant plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from veealign_spark.sources.transcripts import extract_mentions, mentions_to_triples


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def staged(spark, transcripts_sdf, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans"))
    transcripts_sdf.write.mode("overwrite").parquet(p)
    return spark.read.parquet(p)


def test_extraction_prunes_columns(spark, staged):
    plan = _plan(mentions_to_triples(extract_mentions(staged)))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    # raw text + conv id only — role/tool/ts never leave the scan
    assert cols == {"conv_id", "text"}, cols


def test_dedup_is_partial_aggregated(spark, staged):
    plan = _plan(mentions_to_triples(extract_mentions(staged)))
    # map-side combine: two HashAggregates around a single exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") == 1


def test_q1_filter_pushdown(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_dim_join_broadcasts(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    j = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
