"""Property-based checks (hypothesis) for the pure-logic kernels that
everything else leans on."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from veealign_spark.functions.text_norm import normalize_term

words = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=0,
    max_size=12,
)


@given(st.lists(words, max_size=5))
@settings(max_examples=200, deadline=None)
def test_normalize_term_idempotent(parts):
    t = "_".join(parts)
    once = normalize_term(t)
    assert normalize_term(once) == once  # normalization is a projection


@given(words)
@settings(max_examples=200, deadline=None)
def test_normalize_case_insensitive_on_plain_words(w):
    # differently-cased spellings of a single word normalize equal
    # unless the token is an acronym (all-caps preserved by design)
    if w and not w.isupper() and w.isalpha():
        assert normalize_term(w.lower()) == normalize_term(w.capitalize())


def test_scalable_rank_matches_sorted_enumerate_property(spark):
    """scalable_rank == rank in a global sort, for adversarial key
    sets (duplicated prefixes, empty-adjacent, unicode-ish)."""
    import random

    rng = random.Random(11)
    keys = list(
        {
            "".join(rng.choices("ab_0", k=rng.randint(1, 6)))
            for _ in range(500)
        }
    )
    from veealign_spark.operators.scoring import scalable_rank

    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {(r["key"], r["idx"]) for r in scalable_rank(df, "key").collect()}
    want = {(k, i + 1) for i, k in enumerate(sorted(keys))}
    assert got == want


def test_best_threshold_by_group_matches_bruteforce_property(spark):
    """best_threshold_by_group == exhaustive per-group search over
    every attained score level, for adversarial random label tables
    (tied scores within and across groups, all-negative groups,
    singleton groups, duplicate (score, y) rows)."""
    import random

    from veealign_spark.operators import metrics

    rng = random.Random(23)
    rows = []
    for g in range(7):
        n = rng.randint(1, 40)
        # force heavy score ties: scores drawn from a 6-value grid
        grid = [round(rng.uniform(0, 1), 2) for _ in range(6)]
        for _ in range(n):
            rows.append(
                (f"g{g}", rng.choice(grid), 1 if rng.random() < 0.3 else 0)
            )
    rows.append(("empty_pos", 0.5, 0))  # all-negative group
    rows.append(("single", 0.9, 1))  # singleton

    def brute(rs):
        out = {}
        by_g = {}
        for g, s, y in rs:
            by_g.setdefault(g, []).append((s, y))
        for g, items in by_g.items():
            n_gold = sum(y for _, y in items)
            best = None
            for thr in sorted({s for s, _ in items}, reverse=True):
                kept = [(s, y) for s, y in items if s >= thr]
                tp = sum(y for _, y in kept)
                p = tp / len(kept)
                r = tp / max(n_gold, 1)
                f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
                cand = (f1, thr, tp, len(kept))
                if best is None or cand > best:
                    best = cand
            out[g] = best
        return out

    want = brute(rows)
    df = spark.createDataFrame(rows, "grp string, score double, y int")
    got = {
        r["grp"]: (r["f1"], r["thr"], r["tp"], r["n"])
        for r in metrics.best_threshold_by_group(df, "grp").collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=1e-12), (g, got[g], want[g])
