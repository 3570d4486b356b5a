"""Property-based checks (hypothesis) for the pure-logic kernels that
everything else leans on."""

from __future__ import annotations

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
