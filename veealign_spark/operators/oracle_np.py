"""Single-node numpy oracle of the full alignment pipeline.

This is the stand-in for the reference implementation's semantics
(its checkpoints are stripped; SURVEY.md §7): the same context
construction rules (data_preprocessing.py:254-309 + path_to_root
85-96, with this engine's documented sorted-canonical path order),
the same deterministic embeddings, and the same kernel — run directly
over a pandas triples table with no Spark. The golden end-to-end test
compares the distributed pipeline's emitted alignments against this
oracle's at P/R >= 0.95 (BASELINE.json quality bar); in practice they
must match exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from veealign_spark.functions.embeddings import embed_terms_np
from veealign_spark.functions.text_norm import normalize_term
from veealign_spark.operators import kernel_np
from veealign_spark.operators.kernel_np import KernelParams


def root_paths(triples: pd.DataFrame, src: str, max_pathlen: int) -> dict[str, list[list[str]]]:
    sub = triples[(triples["src"] == src) & (triples["kind"] == "Subclass")]
    sub = sub[(sub["subj"] != sub["obj"]) & (sub["subj"] != "Thing") & (sub["obj"] != "Thing")]
    parents: dict[str, list[str]] = {}
    for s, o in sorted(set(zip(sub["subj"], sub["obj"]))):
        parents.setdefault(s, []).append(o)
    out: dict[str, list[list[str]]] = {}

    def dfs(node: str, path: list[str], acc: list[list[str]]) -> None:
        if len(path) >= max_pathlen or node not in parents:
            acc.append(path)
            return
        for p in parents[node]:
            if p in path:  # cycle guard (Quirk Q5 -> bounded)
                acc.append(path)
                continue
            dfs(p, path + [p], acc)

    for e in parents:
        acc: list[list[str]] = []
        dfs(e, [e], acc)
        # dedup (the distributed BFS dedups path rows)
        out[e] = [list(p) for p in sorted({tuple(p) for p in acc})]
    return out


def build_contexts(
    triples: pd.DataFrame,
    src: str,
    bag_of_neighbours: bool,
    max_pathlen: int,
) -> dict[str, list[list[list[str]]]]:
    """entity -> 4 slots of paths (sorted-canonical, untruncated)."""
    t = triples[triples["src"] == src]
    t = t[(t["subj"] != "Thing") & (t["obj"] != "Thing")]
    t = t.drop_duplicates(subset=["subj", "pred", "obj", "kind"])
    nbrs: dict[str, list[list[list[str]]]] = {}

    def slot(e: str) -> list[list[list[str]]]:
        return nbrs.setdefault(e, [[], [], [], []])

    raw: dict[tuple[str, int], list[str]] = {}
    for _, r in t.iterrows():
        if r.subj == r.obj:
            continue
        if r.kind == "Object Property":
            raw.setdefault((r.subj, 2), []).append(r.obj)
            raw.setdefault((r.obj, 2), []).append(r.subj)
        elif r.kind == "Datatype Property":
            raw.setdefault((r.subj, 3), []).append(r.obj)
            raw.setdefault((r.obj, 3), []).append(r.subj)
        elif r.kind == "Subclass":
            raw.setdefault((r.obj, 1), []).append(r.subj)

    for (e, ty), ns in raw.items():
        if bag_of_neighbours:
            slot(e)[ty] = [sorted(ns)]
        else:
            slot(e)[ty] = sorted([n] for n in ns)

    for e, paths in root_paths(triples, src, max_pathlen).items():
        slot(e)[0] = sorted(paths)
    return nbrs


def prop_contexts(triples: pd.DataFrame, src: str) -> dict[str, list[list[str]]]:
    t = triples[(triples["src"] == src) & (triples["kind"] != "Subclass")]
    out: dict[str, list[list[str]]] = {}
    for _, r in t.iterrows():
        c = out.setdefault(r.pred, [[r.pred], [], []])
        c[1].append(r.subj)
        c[2].append(r.obj)
    for c in out.values():
        c[1] = sorted(c[1])
        c[2] = sorted(c[2])
    return out


class Indexer:
    def __init__(self, terms: list[str], dim: int):
        keys = sorted({normalize_term(t) for t in terms} - {""})
        self.idx = {k: i + 1 for i, k in enumerate(keys)}
        self.matrix = np.vstack([np.zeros((1, dim)), embed_terms_np(keys, dim)])

    def get(self, raw: str) -> int:
        return self.idx.get(normalize_term(raw), 0)


def to_feature_tensor(
    ctx: list[list[list[str]]] | None,
    ix: Indexer,
    T: int,
    P: int,
    L: int,
) -> np.ndarray | None:
    if ctx is None:
        return None
    out = np.zeros((T, P, L), dtype=np.int64)
    for t in range(min(T, len(ctx))):
        # sorted-canonical order, then max_paths truncation (same rule
        # as contexts.assemble_features: truncate tokens FIRST, then
        # sort truncated paths, then keep first P)
        paths = sorted(p[:L] for p in ctx[t])[:P]
        for pi, path in enumerate(paths):
            for li, tok in enumerate(path):
                out[t, pi, li] = ix.get(tok)
    return out


def align(
    triples: pd.DataFrame,
    params: KernelParams,
    srcs: tuple[str, str] = ("src1", "src2"),
    bag_of_neighbours: bool = False,
    max_types: int = 4,
    dim: int = 32,
) -> pd.DataFrame:
    """Full oracle: returns DataFrame(ent1, ent2, score, accepted,
    is_prop) over the cross product, reference semantics."""
    a, b = srcs
    terms = sorted(
        set(triples["subj"]) | set(triples["obj"]) | set(triples["pred"])
    )
    ix = Indexer(terms, dim)
    ctx_a = build_contexts(triples, a, bag_of_neighbours, params.max_pathlen)
    ctx_b = build_contexts(triples, b, bag_of_neighbours, params.max_pathlen)

    def concept_universe(src: str) -> list[str]:
        t = triples[(triples["src"] == src)]
        t = t[(t["subj"] != "Thing") & (t["obj"] != "Thing")]
        sub = t[t["kind"] == "Subclass"]
        obj = t[t["kind"] == "Object Property"]
        dat = t[t["kind"] == "Datatype Property"]
        return sorted(
            set(sub["subj"]) | set(sub["obj"]) | set(obj["subj"]) | set(obj["obj"]) | set(dat["subj"])
        )

    ents_a, ents_b = concept_universe(a), concept_universe(b)
    T, P, L = max_types, params.max_paths, params.max_pathlen

    rows = []
    nodes, feats, pair_keys = [], [], []
    direct = []
    for e1 in ents_a:
        for e2 in ents_b:
            f1 = to_feature_tensor(ctx_a.get(e1), ix, T, P, L)
            f2 = to_feature_tensor(ctx_b.get(e2), ix, T, P, L)
            k = (f"{a}#{e1}", f"{b}#{e2}")
            if f1 is None or f2 is None:
                direct.append((k, ix.get(e1), ix.get(e2)))
            else:
                nodes.append([ix.get(e1), ix.get(e2)])
                feats.append([f1, f2])
                pair_keys.append(k)
    if nodes:
        scores = kernel_np.score_concept_pairs(
            np.array(nodes), np.array(feats), ix.matrix, params
        )
        rows += [
            (k[0], k[1], float(s), bool(s >= params.threshold), False)
            for k, s in zip(pair_keys, scores)
        ]
    if direct:
        v1 = ix.matrix[[d[1] for d in direct]]
        v2 = ix.matrix[[d[2] for d in direct]]
        ds = kernel_np.direct_cosine(v1, v2)
        rows += [
            (d[0][0], d[0][1], float(s), bool(s >= params.threshold), False)
            for d, s in zip(direct, ds)
        ]

    # properties, per kind (data_preprocessing.py:54,60 — separate
    # products for object and datatype properties)
    pc_a, pc_b = prop_contexts(triples, a), prop_contexts(triples, b)
    kinds_a = dict(
        triples[triples["src"] == a][["pred", "kind"]].drop_duplicates().values
    )
    kinds_b = dict(
        triples[triples["src"] == b][["pred", "kind"]].drop_duplicates().values
    )
    M = 16
    pf, pk = [], []
    for p1, c1 in sorted(pc_a.items()):
        for p2, c2 in sorted(pc_b.items()):
            if kinds_a.get(p1) != kinds_b.get(p2):
                continue
            f = np.zeros((2, 3, M), dtype=np.int64)
            for side, (pp, cc) in enumerate([(p1, c1), (p2, c2)]):
                f[side, 0, 0] = ix.get(pp)
                for i, tok in enumerate(cc[1][:M]):
                    f[side, 1, i] = ix.get(tok)
                for i, tok in enumerate(cc[2][:M]):
                    f[side, 2, i] = ix.get(tok)
            pf.append(f)
            pk.append((f"{a}#{p1}", f"{b}#{p2}"))
    if pf:
        ps = kernel_np.score_property_pairs(np.array(pf), ix.matrix, params)
        rows += [
            (k[0], k[1], float(s), bool(s >= params.threshold), True)
            for k, s in zip(pk, ps)
        ]
    return pd.DataFrame(rows, columns=["ent1", "ent2", "score", "accepted", "is_prop"])
