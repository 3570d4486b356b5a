"""Driver-contract self-consistency: every oracle has a query, every
query runs and yields a stable schema at the smoke scale, and no plan
funnels data through a single-partition exchange (except the known
1-row scalar aggregate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

# scalar global aggregate: its SinglePartition exchange carries exactly
# one partially-aggregated row (kg_validate_invariants is a union of
# six such one-row global counts — the audit summary)
SCALAR_AGG_QUERIES = {"t3_oversample", "kg_validate_invariants"}

# full-pipeline / iterative queries excluded from the per-test plan
# sweep for runtime (covered by their own tests + the correctness gate)
HEAVY = {"kg_alignments", "kg_blocked_candidates", "kg_blocking_recall",
         "kg_incremental_equals_batch", "kg_version_diff_audit"}


def test_every_oracle_has_a_query():
    qs, oracles = em.queries(), em.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, missing


def test_no_single_partition_exchange_in_light_queries(spark, monkeypatch):
    # force the scale branch of the size-adaptive rank/curve operators:
    # below the threshold they deliberately use a plain Window.orderBy
    # (single partition is correct and fastest for small inputs); the
    # sweep guards the ABOVE-threshold regime's plans
    monkeypatch.setenv("VEEALIGN_SMALL_INPUT_ROWS", "0")
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in em.queries().items():
        if name in HEAVY or name in SCALAR_AGG_QUERIES:
            continue
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        if "Exchange SinglePartition" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_lazy_oracle_dict_copy_and_retry_semantics():
    """_LazyOracleDict (ADVICE r4): (1) a raising thunk stays retryable
    — the error re-raises on every access instead of degrading to None;
    (2) C-level dict copies (dict(d), {**d}, d.copy(), copy.copy) force
    lazy keys, never snapshotting the None placeholder."""
    import copy as _copy

    import __spark_entry__ as entry

    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "SELECT 1"

    d = entry._LazyOracleDict({"base": "SELECT 0"}, {"lazy": boom})
    for _ in range(2):
        with pytest.raises(RuntimeError):
            _ = d["lazy"]
    assert d["lazy"] == "SELECT 1"  # third call succeeds — not None

    for copier in (dict, lambda x: {**x}, lambda x: x.copy(),
                   _copy.copy, _copy.deepcopy):
        d2 = entry._LazyOracleDict({"base": "SELECT 0"},
                                   {"lazy": lambda: "SELECT 1"})
        c = copier(d2)
        assert c["lazy"] == "SELECT 1", copier
        assert c["base"] == "SELECT 0"
