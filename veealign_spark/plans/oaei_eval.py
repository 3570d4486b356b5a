"""End-to-end OAEI-track evaluation over real OWL fixtures.

Runs the full engine (S1 OWL parse -> contexts -> candidates ->
dual-attention scoring -> threshold -> 1:1 resolution) on actual
ontology pairs and scores the emitted alignment against the actual
OAEI gold file (load_alignment_rdf), producing the P/R/F table the
reference reports (train.py:195-235).

Gold IRIs become engine keys exactly the way the reference does
(train.py:64-65): take the IRI tail after the last '/', split on '#',
drop a file extension from the ontology part, '-' -> '_' (data_
preprocessing.py:188), re-join as "<onto>#<local>".

The kernel runs frozen seeded weights (the published checkpoints are
not in the reference repo), so absolute P/R is NOT the trained model's
— the number measures the engine: parsing, contexts, candidate recall,
scoring plumbing and threshold sweep on real inputs. The measured
numbers are recorded in BENCH/OAEI.md by scripts/run_oaei_conference.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veealign_spark.operators import canonicalize
from veealign_spark.operators import metrics as metrics_ops
from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline
from veealign_spark.sources import owl
from veealign_spark.sources.oaei import load_alignment_rdf


def reference_config(**overrides) -> PipelineConfig:
    """The reference's published inference parameters (src/config.ini:
    max_paths=21, max_pathlen=8, bag_of_neighbours=False,
    weighted_sum=False) with max_types derived from the data
    (data_preprocessing.py:318)."""
    kw = dict(
        max_paths=21,
        max_pathlen=8,
        bag_of_neighbours=False,
        weighted_sum=False,
        derive_types=True,
        blocking="cross",
        # untrained weights: identity/residual projection preserves the
        # name-cosine signal (a seeded random projection measurably
        # halves achievable F1 on this track)
        kernel_init="identity",
    )
    kw.update(overrides)
    return PipelineConfig(**kw)


def gold_keys(gold: DataFrame) -> DataFrame:
    """Map alignment-cell IRIs to engine keys (train.py:64-65)."""

    def to_key(col):
        tail = F.substring_index(col, "/", -1)
        src = F.regexp_replace(
            F.regexp_replace(F.substring_index(tail, "#", 1), r"\.[^.]+$", ""),
            "-",
            "_",
        )
        return F.concat_ws("#", src, F.substring_index(tail, "#", -1))

    return gold.select(
        to_key(F.col("ent1")).alias("ent1"),
        to_key(F.col("ent2")).alias("ent2"),
        "relation",
        "measure",
    )


def _orient(pairs: DataFrame, src1: str) -> DataFrame:
    """Canonicalize pair orientation so (ent1 from src1) always."""
    flip = F.substring_index("ent1", "#", 1) != F.lit(src1)
    return pairs.select(
        F.when(flip, F.col("ent2")).otherwise(F.col("ent1")).alias("ent1"),
        F.when(flip, F.col("ent1")).otherwise(F.col("ent2")).alias("ent2"),
        *[c for c in pairs.columns if c not in ("ent1", "ent2")],
    )


def evaluate_pair(
    spark: SparkSession,
    onto_path1: str,
    onto_path2: str,
    alignment_path: str,
    config: PipelineConfig | None = None,
    tune_on_gold: bool = True,
) -> dict:
    """Run the engine on one real ontology pair; P/R vs the real gold.

    Returns {pair, threshold, n_gold, n_emitted, raw/one2one pr rows,
    result} — `raw` is thresholded pairs, `one2one` after symmetric-best
    1:1 resolution (the reference's greedy resolution, test.py)."""
    cfg = config or reference_config()
    tables = owl.ontology_tables(spark, [onto_path1, onto_path2])
    gold = gold_keys(load_alignment_rdf(spark, alignment_path)).filter(
        F.col("relation") == "="
    )
    src1 = owl.ontology_name(onto_path1)

    result = run_pipeline(
        spark,
        triples=tables["triples"],
        concepts=tables["concepts"],
        props=tables["props"],
        label_map=tables["labels"],
        config=cfg,
        gold=gold if tune_on_gold else None,
    )
    accepted = _orient(result["accepted"], src1)
    one2one = _orient(
        canonicalize.one_to_one_filter(
            result["accepted"].select("ent1", "ent2", "score")
        ),
        src1,
    )
    raw_pr = metrics_ops.pr_metrics(accepted, gold).first().asDict()
    o2o_pr = metrics_ops.pr_metrics(one2one, gold).first().asDict()
    return {
        "pair": f"{src1}-{owl.ontology_name(onto_path2)}",
        "threshold": result["threshold"],
        "n_gold": gold.count(),
        "n_emitted": accepted.count(),
        "raw": raw_pr,
        "one2one": o2o_pr,
        "result": result,
    }


def orient_pairs(df: DataFrame) -> DataFrame:
    """Canonical orientation: ent1's source lexicographically smaller."""
    s1 = F.substring_index("ent1", "#", 1)
    s2 = F.substring_index("ent2", "#", 1)
    flip = s1 > s2
    return df.select(
        F.when(flip, F.col("ent2")).otherwise(F.col("ent1")).alias("ent1"),
        F.when(flip, F.col("ent1")).otherwise(F.col("ent2")).alias("ent2"),
        *[c for c in df.columns if c not in ("ent1", "ent2")],
    )


def evaluate_track(
    spark: SparkSession,
    dataset_dir: str,
    config: PipelineConfig | None = None,
    tune_on_gold: bool = True,
    one2one: bool = True,
    triplets: list[tuple[str, str, str]] | None = None,
    label_map: DataFrame | None = None,
    per_pair_threshold: bool = False,
) -> dict:
    """Whole-track evaluation in ONE pipeline run: every ontology with
    a gold file is loaded as a source, candidates span all source pairs
    (pairs-as-data self-join), one global threshold is tuned on the
    union of golds, and P/R is reported per gold pair + micro-averaged
    over the evaluated pairs (the reference evaluates exactly the pairs
    with gold files — train.py:13-25)."""
    cfg = config or reference_config()
    if triplets is None:
        triplets = conference_pairs(dataset_dir)
    onto_paths = sorted({p for a, b, _ in triplets for p in (a, b)})
    tables = owl.ontology_tables(spark, onto_paths)
    if label_map is None:
        label_map = tables["labels"]

    gold_all = None
    eval_pairs = []
    for p1, p2, apath in triplets:
        g = gold_keys(load_alignment_rdf(spark, apath)).filter(
            F.col("relation") == "="
        )
        gold_all = g if gold_all is None else gold_all.unionByName(g)
        n1, n2 = owl.ontology_name(p1), owl.ontology_name(p2)
        eval_pairs.append(tuple(sorted((n1, n2))))
    gold_all = orient_pairs(gold_all).localCheckpoint(eager=True)

    result = run_pipeline(
        spark,
        triples=tables["triples"],
        concepts=tables["concepts"],
        props=tables["props"],
        label_map=label_map,
        config=cfg,
    )
    pair_df = spark.createDataFrame(eval_pairs, "src1 string, src2 string").distinct()

    # evaluation (and threshold tuning) restricted to the source pairs
    # that HAVE gold — the reference evaluates one aligned ontology
    # pair at a time; scores from unevaluated pairs would otherwise
    # poison the P/R curve as phantom false positives
    scores = (
        orient_pairs(result["scores"].select("ent1", "ent2", "score"))
        .withColumn("src1", F.substring_index("ent1", "#", 1))
        .withColumn("src2", F.substring_index("ent2", "#", 1))
        .join(F.broadcast(pair_df), ["src1", "src2"])
        .select("ent1", "ent2", "score")
        .localCheckpoint(eager=True)
    )
    # per-pair tuned ceiling (no 1:1): the best F1 each pair could
    # reach with its own threshold — the engine's headroom over the
    # single global threshold, reported alongside (OAEI "local
    # optimum" convention)
    from pyspark.sql import Window

    lab = (
        scores.join(
            gold_all.select("ent1", "ent2").withColumn("y", F.lit(1)),
            ["ent1", "ent2"],
            "left",
        )
        .fillna(0, ["y"])
        .withColumn("src1", F.substring_index("ent1", "#", 1))
        .withColumn("src2", F.substring_index("ent2", "#", 1))
    )
    wc = (
        Window.partitionBy("src1", "src2")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gold_sizes = (
        gold_all.withColumn("src1", F.substring_index("ent1", "#", 1))
        .withColumn("src2", F.substring_index("ent2", "#", 1))
        .groupBy("src1", "src2")
        .agg(F.countDistinct("ent1", "ent2").alias("n_gold"))
    )
    # only LEVEL-LAST rows are attainable >= thresholds: a cumulative
    # row in the middle of a tied score level includes part of the
    # level, which no real threshold can (r5 fix — the old per-row max
    # could overstate the ceiling on tie-heavy tracks)
    w_next = Window.partitionBy("src1", "src2").orderBy(F.col("score").desc())
    cum = (
        lab.withColumn("tp_c", F.sum("y").over(wc))
        .withColumn("n_c", F.count(F.lit(1)).over(wc))
        .withColumn("__nxt", F.lead("score").over(w_next))
        .filter(F.col("__nxt").isNull() | (F.col("__nxt") != F.col("score")))
        .join(gold_sizes, ["src1", "src2"])
        .withColumn("p_c", F.col("tp_c") / F.col("n_c"))
        .withColumn("r_c", F.col("tp_c") / F.col("n_gold"))
        .withColumn(
            "f1_c",
            F.when(
                F.col("p_c") + F.col("r_c") > 0,
                2 * F.col("p_c") * F.col("r_c") / (F.col("p_c") + F.col("r_c")),
            ).otherwise(F.lit(0.0)),
        )
        .localCheckpoint(eager=False)
    )
    ceiling = cum.groupBy("src1", "src2").agg(
        F.round(F.max("f1_c"), 3).alias("f1_ceiling")
    )

    threshold = cfg.threshold
    if tune_on_gold and not per_pair_threshold:
        threshold, _f1 = metrics_ops.best_threshold(scores, gold_all)
    if per_pair_threshold:
        # per-pair argmax-F1 threshold over the pair's OWN gold (the
        # OAEI local-optimum convention; same tune-on-gold caveats as
        # the global sweep, applied per evaluated pair). Among equal-F1
        # levels the HIGHEST score wins (fewest emissions).
        w_best = Window.partitionBy("src1", "src2").orderBy(
            F.col("f1_c").desc(), F.col("score").desc()
        )
        thr_pair = (
            cum.withColumn("__rn", F.row_number().over(w_best))
            .filter(F.col("__rn") == 1)
            .select("src1", "src2", F.col("score").alias("__thr"),
                    F.round("f1_c", 3).alias("__thr_f1"))
        )
        emitted = (
            scores.withColumn("src1", F.substring_index("ent1", "#", 1))
            .withColumn("src2", F.substring_index("ent2", "#", 1))
            .join(F.broadcast(thr_pair), ["src1", "src2"])
            .filter(F.col("score") >= F.col("__thr"))
            .select("ent1", "ent2", "score")
        )
        threshold = None
    else:
        emitted = scores.filter(F.col("score") >= threshold)
    if one2one:
        # per-source-pair symmetric-best: one partner per OTHER source
        emitted = canonicalize.one_to_one_filter(emitted, per_source_pair=True)
    acc = emitted.select("ent1", "ent2").withColumn("pred", F.lit(1))
    g = gold_all.select("ent1", "ent2").dropDuplicates().withColumn("act", F.lit(1))
    j = (
        acc.join(g, ["ent1", "ent2"], "full")
        .fillna(0, ["pred", "act"])
        .withColumn("src1", F.substring_index("ent1", "#", 1))
        .withColumn("src2", F.substring_index("ent2", "#", 1))
        .join(F.broadcast(pair_df), ["src1", "src2"])  # evaluated pairs only
    )
    per_pair = (
        j.groupBy("src1", "src2")
        .agg(
            F.sum(F.col("pred") * F.col("act")).alias("tp"),
            F.sum(F.col("pred") * (1 - F.col("act"))).alias("fp"),
            F.sum((1 - F.col("pred")) * F.col("act")).alias("fn"),
        )
        .withColumn("precision", F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)))
        .withColumn("recall", F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)))
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
        .orderBy("src1", "src2")
    )
    per_pair = per_pair.join(ceiling, ["src1", "src2"], "left").orderBy(
        "src1", "src2"
    )
    rows = [r.asDict() for r in per_pair.collect()]
    tp = sum(r["tp"] for r in rows)
    fp = sum(r["fp"] for r in rows)
    fn = sum(r["fn"] for r in rows)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    out_thr = threshold
    per_pair_thr = None
    if per_pair_threshold:
        per_pair_thr = {
            (r["src1"], r["src2"]): (r["__thr"], r["__thr_f1"])
            for r in thr_pair.collect()
        }
    return {
        "threshold": out_thr,
        "per_pair_thresholds": per_pair_thr,
        "per_pair": rows,
        "micro": {
            "tp": tp, "fp": fp, "fn": fn,
            "precision": prec, "recall": rec, "f1": f1,
        },
        "result": result,
    }


def conference_pairs(dataset_dir: str) -> list[tuple[str, str, str]]:
    """(onto1, onto2, alignment) triplets for every gold file present."""
    adir = os.path.join(dataset_dir, "alignments")
    odir = os.path.join(dataset_dir, "ontologies")
    out = []
    for f in sorted(os.listdir(adir)):
        if not f.endswith(".rdf"):
            continue
        a, b = f.rsplit(".", 1)[0].split("-", 1)
        p1, p2 = os.path.join(odir, a + ".owl"), os.path.join(odir, b + ".owl")
        if os.path.exists(p1) and os.path.exists(p2):
            out.append((p1, p2, os.path.join(adir, f)))
    return out


def track_pairs(dataset_dir: str) -> list[tuple[str, str, str]]:
    """(onto1, onto2, alignment) triplets for ANY track layout.

    conference names its golds `<a>-<b>.rdf` after the ontology file
    stems (conference_pairs); lebensmittel/freizeit do not (e.g. gold
    `Google_Lebensmittel-web_Lebensmittel.rdf` over ontologies
    `Google.Lebensmittel.v2.owl` / `web.Lebensmittel.v2.owl` —
    reference README.md:63-78 selects these tracks by config name, not
    filename). Fallback: read each gold's <onto1>/<onto2> Ontology
    IRIs (the same IRIs its cells use) and match the ontology files by
    IRI basename."""
    out = conference_pairs(dataset_dir)
    if out:
        return out
    import glob as _glob
    import xml.etree.ElementTree as ET

    adir = os.path.join(dataset_dir, "alignments")
    odir = os.path.join(dataset_dir, "ontologies")
    by_base = {
        os.path.basename(p): p
        for p in _glob.glob(os.path.join(odir, "*.owl"))
    }
    A = "{http://knowledgeweb.semanticweb.org/heterogeneity/alignment#}"
    RDF_ABOUT = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}about"
    for f in sorted(os.listdir(adir)):
        if not f.endswith(".rdf"):
            continue
        root = ET.parse(os.path.join(adir, f)).getroot()
        ontos = []
        for tag in ("onto1", "onto2"):
            el = root.find(f".//{A}{tag}/{A}Ontology")
            if el is None:
                break
            about = (el.get(RDF_ABOUT) or "").rstrip("#")
            ontos.append(by_base.get(about.rsplit("/", 1)[-1]))
        if len(ontos) == 2 and all(ontos):
            out.append((ontos[0], ontos[1], os.path.join(adir, f)))
    return out


def german_label_fold(labels: DataFrame) -> DataFrame:
    """Per-track German normalization profile (the config-column shape
    the reference varies per dataset — README.md:63-78 runs the German
    tracks with language=de, has_spellcheck=False): fold the P2 label
    map before it reaches the embed boundary by (a) dropping the German
    conjunction 'und' (the track's category labels write the same
    concept both ways: 'Fleisch-und-Wurst' vs 'Fleisch-Wurst') and
    (b) sorting the token bag ('Kaffee-und-Tee' vs 'Tee-Kaffee' name
    the same category in either order — German directory labels are
    compound bags, not phrases). Pure Column expressions; applied to
    the label map only, so non-German tracks are untouched."""
    toks = F.split(F.lower(F.regexp_replace("label", "[-_]+", " ")), " +")
    folded = F.array_join(
        F.array_sort(F.filter(toks, lambda w: (w != "und") & (w != ""))),
        " ",
    )
    return labels.withColumn("label", folded)
