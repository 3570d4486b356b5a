"""Kernel parity tests (K1-K9): the numpy kernel vs a hand-rolled
equation-level re-derivation on tiny fixed tensors (SURVEY.md §5.2.2),
plus invariants (pad masking, Siamese symmetry of identical inputs)."""

from __future__ import annotations

import numpy as np
import pytest

from veealign_spark.operators import kernel_np
from veealign_spark.operators.kernel_np import KernelParams, default_params


def tiny_setup(weighted_sum=True, seed=3):
    rng = np.random.default_rng(seed)
    dim, V = 8, 12
    emb = np.vstack([np.zeros((1, dim)), rng.standard_normal((V - 1, dim))])
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    p = KernelParams(
        v=np.array([0.4, 0.3, 0.2, 0.1]),
        type_weights=np.array([0.4, 0.3, 0.2, 0.1]),
        out_w=rng.standard_normal((6, 2 * dim)),
        out_b=rng.standard_normal(6) * 0.01,
        weighted_sum=weighted_sum,
        max_paths=2,
        max_pathlen=4,
    )
    return emb, p


def slow_reference_score(nodes, features, emb, p):
    """Loop-level re-derivation of the published equations — written
    independently of the vectorized kernel as its oracle."""
    B = nodes.shape[0]
    out = np.zeros(B)
    for b in range(B):
        reps = []
        for side in range(2):
            node = emb[nodes[b, side]]
            T, P, L = features.shape[2:5]
            # path attention
            logits = np.zeros((T, P))
            for t in range(T):
                for pi in range(P):
                    for li in range(L):
                        logits[t, pi] += node @ emb[features[b, side, t, pi, li]]
            if p.weighted_sum:
                w = kernel_np.masked_softmax(logits)
                best = np.zeros((T, L, len(node)))
                for t in range(T):
                    for pi in range(P):
                        for li in range(L):
                            best[t, li] += w[t, pi] * emb[features[b, side, t, pi, li]]
            else:
                best = np.zeros((T, L, len(node)))
                for t in range(T):
                    pi = int(np.argmax(logits[t]))
                    for li in range(L):
                        best[t, li] = emb[features[b, side, t, pi, li]]
            nl = np.zeros((T, L))
            for t in range(T):
                for li in range(L):
                    nl[t, li] = node @ best[t, li]
            nw = kernel_np.masked_softmax(nl)
            ctx = np.zeros(len(node))
            for t in range(T):
                acc = np.zeros(len(node))
                for li in range(L):
                    acc += p.v[li] * nw[t, li] * best[t, li]
                ctx += p.type_weights[t] * acc
            reps.append(np.concatenate([node, ctx]) @ p.out_w.T + p.out_b)
        a, c = reps
        out[b] = (a @ c) / max(np.linalg.norm(a) * np.linalg.norm(c), 1e-8)
    return out


@pytest.mark.parametrize("weighted_sum", [True, False])
def test_kernel_matches_equations(weighted_sum):
    emb, p = tiny_setup(weighted_sum)
    rng = np.random.default_rng(11)
    B, T, P, L = 5, 4, 2, 4
    nodes = rng.integers(1, len(emb), size=(B, 2))
    features = rng.integers(0, len(emb), size=(B, 2, T, P, L))
    # sprinkle full-pad paths to exercise the mask
    features[0, 0, 1] = 0
    features[2, 1, :, 1] = 0
    got = kernel_np.score_concept_pairs(nodes, features, emb, p)
    want = slow_reference_score(nodes, features, emb, p)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_identical_inputs_score_one():
    emb, p = tiny_setup()
    rng = np.random.default_rng(5)
    B, T, P, L = 3, 4, 2, 4
    n = rng.integers(1, len(emb), size=(B, 1))
    nodes = np.concatenate([n, n], axis=1)
    f = rng.integers(0, len(emb), size=(B, 1, T, P, L))
    features = np.concatenate([f, f], axis=1)
    got = kernel_np.score_concept_pairs(nodes, features, emb, p)
    np.testing.assert_allclose(got, np.ones(B), atol=1e-12)


def test_row0_zero_pad_invariant():
    """Pad tokens (index 0) embed to the zero row, so their attention
    logit is exactly 0 and the masked softmax excludes them — an
    all-pad path must contribute nothing."""
    emb, p = tiny_setup()
    nodes = np.array([[1, 2]])
    f_a = np.zeros((1, 2, 4, 2, 4), dtype=np.int64)
    f_a[0, :, 0, 0, :2] = [[3, 4], [3, 4]]
    f_b = f_a.copy()
    f_b[0, :, 2, 1, :] = 0  # already zero — same tensors
    s_a = kernel_np.score_concept_pairs(nodes, f_a, emb, p)
    s_b = kernel_np.score_concept_pairs(nodes, f_b, emb, p)
    np.testing.assert_allclose(s_a, s_b)


def test_property_scores():
    emb, p = tiny_setup()
    f = np.zeros((2, 2, 3, 4), dtype=np.int64)
    # identical prop features on both sides -> score ~ w_p + w_d + w_r = 1
    f[0, :, 0, 0] = 5
    f[0, :, 1, :2] = [6, 7]
    f[0, :, 2, 0] = 8
    # disjoint on the second pair
    f[1, 0, 0, 0] = 5
    f[1, 1, 0, 0] = 9
    f[1, 0, 1, 0] = 6
    f[1, 1, 1, 0] = 10
    f[1, 0, 2, 0] = 7
    f[1, 1, 2, 0] = 11
    s = kernel_np.score_property_pairs(f, emb, p)
    np.testing.assert_allclose(s[0], 1.0, atol=1e-12)
    assert s[1] < 0.95


def test_default_params_deterministic():
    p1, p2 = default_params(seed=7), default_params(seed=7)
    np.testing.assert_array_equal(p1.out_w, p2.out_w)
    d = p1.to_dict()
    p3 = KernelParams.from_dict(d)
    np.testing.assert_array_equal(p3.out_w, p1.out_w)
    assert p3.weighted_sum == p1.weighted_sum
