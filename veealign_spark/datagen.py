"""Deterministic synthetic fixture generation (FIXTURES.md).

Generates, from a fixed seed and with no external data:

- a *pair of mini-ontologies* (concepts + triples) mirroring the shape
  of the reference's OAEI conference-track fixtures (~60-110 concepts a
  side, cf. cmt.owl: 110 owl:Class / 94 owl:ObjectProperty / 21
  owl:DatatypeProperty), where a matched subset shares normalized names
  (src1 camelCase vs src2 snake_case — exercising F1/F2 normalization)
  and topology, and the rest are side-unique;
- the *gold alignment* table those matches induce (the correctness
  oracle, mirroring datasets/conference/alignments/*.rdf cells);
- a *transcripts* table of the exact input_hint shape
  (conv_id, turn_idx, role, text, tool, ts) whose turn texts verbalize
  the triples in a fixed mention grammar, with a Zipf-skewed hot entity
  (~20% of mentions) to exercise salted blocking;
- per-turn *expected mentions*, so extraction is testable a priori.

Everything is pandas-level (driver-side, fixture scale); bench-scale
transcript generation is distributed (see make_transcripts_df).
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from veealign_spark.functions.text_norm import normalize_term

WORDS = [
    "conference", "member", "paper", "author", "review", "chair", "session",
    "track", "program", "committee", "workshop", "tutorial", "keynote",
    "speaker", "topic", "decision", "camera", "ready", "submission", "draft",
    "registration", "fee", "venue", "room", "schedule", "slot", "meta",
    "external", "student", "volunteer", "sponsor", "booth", "demo", "poster",
    "panel", "invited", "talk", "abstract", "deadline", "notification",
]

MENTION_KINDS = {
    "subclass_of": "Subclass",
    "rel": "Object Property",
    "attr": "Datatype Property",
}

FILLER = [
    "ok noted that", "let me check the graph:", "observed fact", "fyi",
    "the extractor found", "confirmed earlier today", "tool output says",
]


def _camel(words: list[str]) -> str:
    return "".join(w.capitalize() for w in words)


def _snake(words: list[str]) -> str:
    return "_".join(words)


def make_ontology_pair(
    n_concepts: int = 60,
    n_matched: int = 40,
    n_obj_props: int = 24,
    n_data_props: int = 10,
    n_matched_props: int = 16,
    seed: int = 42,
    vocab_size: int | None = None,
) -> dict[str, pd.DataFrame]:
    """Two mini-ontologies with a known alignment.

    Returns dict with 'concepts', 'triples', 'gold' pandas frames
    (schemas.CONCEPTS / TRIPLES / GOLD shapes). vocab_size extends the
    word vocabulary deterministically — the 40-word default is right
    for OAEI-sized fixtures but makes token blocking degenerate for
    1000+-concept bench universes (every token is Zipf-hot).
    """
    rng = np.random.default_rng(seed)
    words = list(WORDS)
    if vocab_size and vocab_size > len(words):
        words += [f"term{i:03d}" for i in range(vocab_size - len(words))]

    # --- concept name universes -------------------------------------
    def sample_name(used: set[str]) -> list[str]:
        while True:
            k = int(rng.integers(1, 4))
            ws = list(rng.choice(words, size=k, replace=False))
            key = " ".join(ws)
            if key not in used:
                used.add(key)
                return ws

    used: set[str] = set()
    matched_names = [sample_name(used) for _ in range(n_matched)]
    only1 = [sample_name(used) for _ in range(n_concepts - n_matched)]
    only2 = [sample_name(used) for _ in range(n_concepts - n_matched)]

    c1 = [_camel(w) for w in matched_names] + [_camel(w) for w in only1]
    c2 = [_snake(w) for w in matched_names] + [_snake(w) for w in only2]

    concepts = pd.DataFrame(
        [("src1", cid, None) for cid in c1] + [("src2", cid, None) for cid in c2],
        columns=["src", "id", "label"],
    )

    # --- taxonomy: identical topology on the matched prefix ----------
    triples: list[tuple[str, str, str, str, str]] = []

    def add_tax(src: str, ids: list[str], n_match: int) -> None:
        # two disjoint forests: the matched prefix (identical topology
        # on both sides — matched concepts must have *identical*
        # normalized contexts so their kernel score is exactly 1) and a
        # side-local unmatched forest. Multi-parent for every 7th node
        # (branching root-paths, data_preprocessing.py:85-96); depth
        # grows ~log3(n) >= 4.
        for i in range(1, len(ids)):
            if i < n_match:
                p = (i - 1) // 3
            else:
                u = i - n_match
                if u == 0:
                    continue  # local root of the unmatched forest
                p = n_match + (u - 1) // 3
            triples.append((src, ids[i], "subclass_of", ids[p], "Subclass"))
            if i % 7 == 3 and i >= 2 and i < n_match:
                q = (i - 2) // 3
                if q != p:
                    triples.append((src, ids[i], "subclass_of", ids[q], "Subclass"))

    add_tax("src1", c1, n_matched)
    add_tax("src2", c2, n_matched)

    # --- properties ---------------------------------------------------
    prop_used: set[str] = set()
    n_props = n_obj_props + n_data_props
    prop_names = [sample_name(prop_used | used) for _ in range(n_props)]
    gold_props: list[tuple[str, str]] = []
    for j, ws in enumerate(prop_names):
        is_obj = j < n_obj_props
        pfx = "rel" if is_obj else "attr"
        p1 = f"{pfx}_{_camel(ws)}"
        p2 = f"{pfx}_{_snake(ws)}"
        kind = MENTION_KINDS[pfx]
        # domain/range drawn from the matched prefix so matched props
        # share normalized domain/range contexts
        d = int(rng.integers(0, n_matched))
        r = int(rng.integers(0, n_matched))
        if j < n_matched_props:
            triples.append(("src1", c1[d], p1, c1[r], kind))
            triples.append(("src2", c2[d], p2, c2[r], kind))
            gold_props.append((f"src1#{p1}", f"src2#{p2}"))
        elif is_obj == bool(j % 2):
            # side-unique props live entirely in the unmatched forest so
            # they don't perturb matched concepts' contexts
            d2 = int(rng.integers(n_matched, n_concepts))
            r2 = int(rng.integers(n_matched, n_concepts))
            triples.append(("src1", c1[d2], p1, c1[r2], kind))
        else:
            d2 = int(rng.integers(n_matched, n_concepts))
            r2 = int(rng.integers(n_matched, n_concepts))
            triples.append(("src2", c2[d2], p2, c2[r2], kind))

    # a handful of quirk rows the pipeline must handle: duplicates
    # (dedup A7), self-loops (P4), Thing endpoints (P3)
    triples.append(triples[0])
    triples.append(("src1", c1[2], "rel_selfloop", c1[2], "Object Property"))
    triples.append(("src1", c1[4], "subclass_of", "Thing", "Subclass"))

    triples_df = pd.DataFrame(
        triples, columns=["src", "subj", "pred", "obj", "kind"]
    )

    gold = pd.DataFrame(
        [(f"src1#{a}", f"src2#{b}", "=", 1.0) for a, b in zip(c1[:n_matched], c2[:n_matched])]
        + [(a, b, "=", 1.0) for a, b in gold_props],
        columns=["ent1", "ent2", "relation", "measure"],
    )

    # sanity: matched names must normalize identically
    for a, b in zip(c1[:n_matched], c2[:n_matched]):
        assert normalize_term(a) == normalize_term(b), (a, b)

    return {"concepts": concepts, "triples": triples_df, "gold": gold}


def verbalize(subj: str, pred: str, obj: str, rng: np.random.Generator) -> str:
    filler = FILLER[int(rng.integers(0, len(FILLER)))]
    return f"{filler} {subj} {pred} {obj} ."


def make_transcripts(
    triples: pd.DataFrame,
    seed: int = 42,
    mentions_per_triple: int = 1,
    hot_frac: float = 0.2,
    turns_per_conv: int = 8,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Verbalize triples into transcripts of the input_hint shape.

    Returns (transcripts, expected_mentions). A Zipf-style hot entity
    receives ~hot_frac of all mentions (as repeated verbalizations of
    its triples — repeats dedup away in the triple stage, A7, but they
    skew the *mention*-level shuffle, which is the point).
    """
    rng = np.random.default_rng(seed + 1)
    rows = triples[["src", "subj", "pred", "obj"]].values.tolist()
    mention_rows = [r for r in rows for _ in range(mentions_per_triple)]

    # hot-entity skew: oversample triples touching the most frequent subj
    subj_counts = triples.groupby("subj").size()
    hot = subj_counts.idxmax()
    hot_rows = [r for r in rows if r[1] == hot or r[3] == hot]
    if hot_rows:
        n_extra = int(hot_frac * len(mention_rows) / max(1e-9, 1 - hot_frac))
        for i in range(n_extra):
            mention_rows.append(hot_rows[i % len(hot_rows)])

    order = rng.permutation(len(mention_rows))
    t0 = datetime(2026, 1, 1)
    roles = ["user", "assistant", "tool"]
    recs, expected = [], []
    conv_counters: dict[str, int] = {}
    conv_of_src: dict[str, tuple[str, int]] = {}
    for k, oi in enumerate(order):
        src, subj, pred, obj = mention_rows[oi]
        cur = conv_of_src.get(src)
        if cur is None or cur[1] >= turns_per_conv:
            n = conv_counters.get(src, 0)
            conv_counters[src] = n + 1
            cur = (f"{src}_c{n:06d}", 0)
        conv_id, turn_idx = cur
        conv_of_src[src] = (conv_id, turn_idx + 1)
        text = verbalize(subj, pred, obj, rng)
        role = roles[turn_idx % 3]
        tool = "kg_extractor" if role == "tool" else None
        ts = t0 + timedelta(seconds=int(k))
        recs.append((conv_id, turn_idx, role, text, tool, ts))
        expected.append((conv_id, turn_idx, src, subj, pred, obj))

    transcripts = pd.DataFrame(
        recs, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    expected_df = pd.DataFrame(
        expected, columns=["conv_id", "turn_idx", "src", "subj", "pred", "obj"]
    )
    return transcripts, expected_df


def make_transcripts_df(spark, triples_pdf: pd.DataFrame, copies: int, seed: int = 42):
    """Distributed bench-scale transcripts: `copies` re-verbalizations
    of the triple set, generated executor-side (no driver materialize).

    Each copy re-verbalizes every triple with a different filler/conv
    layout; dedup-correct output is unchanged while mention volume
    scales by `copies` — the shape a 10^12-turn corpus has (massively
    redundant mentions of a bounded entity universe).
    """
    from pyspark.sql import functions as F

    from veealign_spark import schemas

    base, _ = make_transcripts(triples_pdf, seed=seed)
    base_sdf = spark.createDataFrame(base, schema=schemas.TRANSCRIPTS)
    if copies <= 1:
        return base_sdf
    # partition the COPY RANGE explicitly (the small base side gets
    # broadcast in the cross join, so output partitioning follows the
    # range): the result is already spread across <=256 partitions and
    # needs NO downstream repartition — a full shuffle of the generated
    # corpus is exactly what a 10^12-turn staging job cannot afford
    # (at 683M turns the uncompressed shuffle temp exceeded this box's
    # disk; generation must be shuffle-free)
    reps = spark.range(0, copies, 1, min(256, copies)).select(
        F.col("id").alias("copy")
    )
    return (
        base_sdf.crossJoin(reps)
        .withColumn("conv_id", F.concat_ws("_", F.col("conv_id"), F.col("copy")))
        # per-copy trailing marker: keeps every turn's text unique (as
        # real transcripts are — otherwise parquet dictionary-encodes
        # the corpus away and the bench scans 60x less than its
        # logical size); the marker can't match the mention grammar
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" #session"), F.col("copy").cast("string")),
        )
        .withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("copy")))
        .drop("copy")
    )


def make_multilingual_pair(seed: int = 42, **kwargs) -> dict[str, pd.DataFrame]:
    """Multifarm-style cross-lingual variant: src2's names are token-
    wise translated through the embedding stub's lexicon (so matched
    concepts no longer share surface tokens — alignment must go
    through the multilingual embedding space, exactly the multifarm
    track's difficulty; the reference handles it with multilingual USE
    + skipped normalization, Quirk Q1)."""
    from veealign_spark.functions.embeddings import TRANSLATIONS

    inv = {v: k for k, v in TRANSLATIONS.items()}

    def translate(name: str) -> str:
        return "_".join(inv.get(t, t) for t in name.split("_"))

    pair = make_ontology_pair(seed=seed, **kwargs)
    concepts, triples, gold = pair["concepts"], pair["triples"], pair["gold"]
    c2 = concepts["src"] == "src2"
    concepts.loc[c2, "id"] = concepts.loc[c2, "id"].map(translate)
    t2 = triples["src"] == "src2"
    for col in ("subj", "obj", "pred"):
        triples.loc[t2, col] = triples.loc[t2, col].map(translate)
    gold["ent2"] = gold["ent2"].map(
        lambda k: "src2#" + translate(k.split("#", 1)[1])
    )
    return {"concepts": concepts, "triples": triples, "gold": gold}
