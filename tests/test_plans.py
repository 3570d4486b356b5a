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


# ---------------------------------------------------------------------------
# Executed-plan (AQE-final) asserts for the BENCH/PLANS.md headline
# invariants — run the ACTUAL contract queries, then inspect the final
# adaptive plan so a refactor can't regress what the doc claims.
# ---------------------------------------------------------------------------

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.collect()  # finalize the adaptive plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q3_executed_plan_broadcast_only(spark):
    """Both q3 joins stay broadcast in the EXECUTED plan (customer by
    hint, orders via AQE/auto threshold) and the lineitem scan is
    pruned to exactly the three referenced columns."""
    import __spark_entry__ as entry

    q = entry.queries()["tpch_q3_topk"](spark, SF_DIR)
    plan = _executed_plan(q)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    li_scans = [
        ln for ln in plan.splitlines()
        if "lineitem" in ln and "ReadSchema" in ln
    ]
    assert li_scans, plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", li_scans[0])
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_extendedprice", "l_discount"}, cols


def test_extraction_executed_plan_prunes_columns(spark, staged):
    """Extraction's EXECUTED plan still reads only (conv_id, text):
    the raw text is parsed inside the scan stage and never shuffles."""
    df = mentions_to_triples(extract_mentions(staged))
    plan = _executed_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    cols = {c.split(":")[0] for s in schemas for c in s.split(",")}
    assert cols == {"conv_id", "text"}, cols


def test_multiprobe_executed_plan_single_scan_per_side(spark):
    """The r5 flattened multiprobe plan: every table's signature comes
    from ONE projection+explode, so the embeddings parquet is scanned
    at most once per derivation of the home table (4 total: q side,
    c side, and the two vector-fetch joins) instead of once per LSH
    table per side; and the pair stream's query_id repartition is the
    partitioning the dedup aggregate and top-k window both reuse — no
    exchange hashes (query_id, neighbor_id)."""
    import __spark_entry__ as entry

    q = entry.queries()["ann_lsh_topk_multiprobe"](spark, SF_DIR)
    plan = _executed_plan(q)
    # the AQE plan string prints initial+final subtrees — count scans
    # by DISTINCT first-column expression id, not by line
    scan_ids = {
        re.search(r"FileScan parquet \[(\w+#\d+)", ln).group(1)
        for ln in plan.splitlines()
        if "FileScan parquet" in ln and "embedding" in ln
    }
    assert 0 < len(scan_ids) <= 4, (scan_ids, plan)
    hps = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert any("query_id" in ln for ln in hps), plan
    assert not any("neighbor_id" in ln for ln in hps), hps


def test_minhash_uncapped_reuses_signature_exchange(spark):
    """The uncapped LSH self-join's two sides are identical subplans:
    ReuseExchange must serve both from ONE shingle+min-hash pass (the
    r6 reason the localCheckpoint there was dropped)."""
    from veealign_spark.operators import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = dedup.minhash_lsh_pairs(docs, n_bands=8)
    plan = _executed_plan(q)
    assert "ReusedExchange" in plan, plan


def test_simhash_no_repartition_when_scan_is_wide(spark):
    """A corpus whose scan parallelism already matches the cluster must
    not be reshuffled before simhash's map-side-combinable aggregate
    (VERDICT r5 item #4): the only Exchanges are the aggregate's own."""
    from veealign_spark.operators import dedup

    par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .repartition(max(par, 4))
        .localCheckpoint(eager=True)  # pin the wide partitioning as input
    )
    q = dedup.simhash_fingerprints(docs, n_bits=16)
    plan = _executed_plan(q)
    # two aggregate exchanges ((doc,bit) then doc) — and nothing else:
    # no round-robin/hash repartition of the input corpus
    assert "RoundRobinPartitioning" not in plan, plan
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 4, plan  # initial+final AQE prints; no extra input shuffle
