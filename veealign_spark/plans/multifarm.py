"""OAEI multifarm cross-lingual track evaluation (real fixtures).

The multifarm dataset (`/root/reference/datasets/multifarm/`) holds 50
ontologies — 5 conference-domain ontologies x 10 languages (ar cn cz de
en es fr nl pt ru) with coded-ID IRIs (`c-9804348-4921383`) and
language-local `rdfs:label`s — and 1,125 gold alignment files of two
families:

- SAME-ontology cross-language (`cmt-cmt-de-en`, ...; 225 files): each
  concept aligned to its own translation;
- CROSS-ontology cross-language (`cmt-confOf-de-es`, ...; 900 files):
  the real matching task under a language barrier.

The reference crosses that barrier with multilingual USE
(data_preprocessing.py:25-29) — no such model ships in this sandbox.
The engine's stand-in LEARNS the translation from the track's own
training family: the same-ontology golds against `en` define, per
non-English source, a coded-id -> English-label mapping (take the
English label of each concept's aligned translation). That is exactly
the P2 label_map shape, so it drops into the existing broadcast-join
substitution at the embed boundary — both entity names and context
tokens score in "English label space", where the hash embedding stub
works again.

Evaluation then runs ONLY on the cross-ontology family: which cmt
concept equals which confOf concept is never visible in the training
family, so the split is leak-free at the alignment-cell level (the
standard "use a translator, evaluate the matcher" multifarm protocol,
with the translator learned from the held-out-by-construction
translation pairs instead of an external MT system).

Reference parity notes: gold IRIs map to engine keys the same way as
the conference track (train.py:64-65 via oaei_eval.gold_keys);
evaluation methodology (global tuned threshold over evaluated source
pairs, per-source-pair symmetric-best 1:1, micro P/R over gold pairs)
is identical to oaei_eval.evaluate_track — multifarm only changes pair
discovery and the label_map.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veealign_spark.plans.oaei_eval import (
    evaluate_track,
    gold_keys,
    reference_config,
)
from veealign_spark.sources import owl
from veealign_spark.sources.oaei import load_alignment_rdf

LANGS = ["ar", "cn", "cz", "de", "en", "es", "fr", "nl", "pt", "ru"]


def _parse_fname(fname: str) -> tuple[str, str, str, str] | None:
    """`cmt-confOf-de-es.rdf` -> (cmt, confOf, de, es)."""
    if not fname.endswith(".rdf"):
        return None
    parts = fname.rsplit(".", 1)[0].split("-")
    if len(parts) != 4:
        return None
    return tuple(parts)


def multifarm_triplets(
    dataset_dir: str,
    cross_onto: bool = True,
    langs: list[str] | None = None,
    ontos: list[str] | None = None,
) -> list[tuple[str, str, str]]:
    """(onto1_path, onto2_path, alignment_path) triplets.

    cross_onto=True selects the evaluation family (different base
    ontologies); False selects the training family (same ontology,
    different languages). `langs` / `ontos` narrow the slice for
    fixture-scale tests."""
    adir = os.path.join(dataset_dir, "alignments")
    odir = os.path.join(dataset_dir, "ontologies")
    out = []
    for f in sorted(os.listdir(adir)):
        parsed = _parse_fname(f)
        if parsed is None:
            continue
        o1, o2, l1, l2 = parsed
        if (o1 != o2) != cross_onto:
            continue
        if langs is not None and not (l1 in langs and l2 in langs):
            continue
        if ontos is not None and not (o1 in ontos and o2 in ontos):
            continue
        p1 = os.path.join(odir, f"{o1}-{l1}.owl")
        p2 = os.path.join(odir, f"{o2}-{l2}.owl")
        if os.path.exists(p1) and os.path.exists(p2):
            out.append((p1, p2, os.path.join(adir, f)))
    return out


def translation_label_map(
    spark: SparkSession,
    dataset_dir: str,
    langs: list[str] | None = None,
    ontos: list[str] | None = None,
) -> DataFrame:
    """(src, id, label) — the learned cross-lingual P2 map.

    For every (ontology, lang != en) with a same-ontology gold against
    `en`: id_lang -> English label of its aligned en twin. English
    sources contribute their own parsed labels. Ids absent from the
    training gold keep no entry and fall back to their coded id at the
    embed boundary (honest recall loss, visible in the per-pair
    table)."""
    adir = os.path.join(dataset_dir, "alignments")
    odir = os.path.join(dataset_dir, "ontologies")
    langs = langs or LANGS
    train = []
    en_paths = set()
    for f in sorted(os.listdir(adir)):
        parsed = _parse_fname(f)
        if parsed is None:
            continue
        o1, o2, l1, l2 = parsed
        if o1 != o2 or "en" not in (l1, l2) or l1 == l2:
            continue
        other = l2 if l1 == "en" else l1
        if other not in langs:
            continue
        if ontos is not None and o1 not in ontos:
            continue
        train.append(os.path.join(adir, f))
        en_paths.add(os.path.join(odir, f"{o1}-en.owl"))

    gold_all = None
    for apath in train:
        g = gold_keys(load_alignment_rdf(spark, apath)).filter(
            F.col("relation") == "="
        )
        gold_all = g if gold_all is None else gold_all.unionByName(g)

    en_labels = owl.ontology_tables(spark, sorted(en_paths))["labels"].select(
        "src", "id", "label"
    )
    if gold_all is None:
        return en_labels
    # orient each training cell as (foreign key, en key)
    e1_en = F.substring_index(F.substring_index("ent1", "#", 1), "_", -1) == "en"
    pairs = gold_all.select(
        F.when(e1_en, F.col("ent2")).otherwise(F.col("ent1")).alias("fk"),
        F.when(e1_en, F.col("ent1")).otherwise(F.col("ent2")).alias("ek"),
    )
    translated = (
        pairs.select(
            F.substring_index("fk", "#", 1).alias("src"),
            F.substring_index("fk", "#", -1).alias("id"),
            F.substring_index("ek", "#", 1).alias("en_src"),
            F.substring_index("ek", "#", -1).alias("en_id"),
        )
        .join(
            en_labels.select(
                F.col("src").alias("en_src"),
                F.col("id").alias("en_id"),
                F.col("label").alias("label"),
            ),
            ["en_src", "en_id"],
        )
        .select("src", "id", "label")
    )
    # first-writer-wins determinism if a foreign id has several cells
    return (
        translated.unionByName(en_labels)
        .groupBy("src", "id")
        .agg(F.min("label").alias("label"))
    )


def evaluate_multifarm(
    spark: SparkSession,
    dataset_dir: str,
    config=None,
    langs: list[str] | None = None,
    ontos: list[str] | None = None,
    **track_kwargs,
) -> dict:
    """Whole cross-ontology multifarm evaluation in one pipeline run
    (evaluate_track methodology; label_map = the learned translation).
    Extra keyword arguments (e.g. per_pair_threshold=True) pass
    through to evaluate_track."""
    triplets = multifarm_triplets(
        dataset_dir, cross_onto=True, langs=langs, ontos=ontos
    )
    if not triplets:
        raise ValueError("no multifarm evaluation pairs matched the filters")
    lm = translation_label_map(spark, dataset_dir, langs=langs, ontos=ontos)
    cfg = config or reference_config()
    return evaluate_track(
        spark, dataset_dir, config=cfg, triplets=triplets, label_map=lm,
        **track_kwargs,
    )
