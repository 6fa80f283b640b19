"""kNN ops vs tiny NumPy brute-force oracles (the faiss-replacement parity
tests SURVEY.md §4 calls for)."""

import numpy as np
import jax.numpy as jnp
import pytest

from posendf_tpu.ops import geodesic_rerank, geodesic_topk, l2_topk


def _np_l2_topk(q, c, k):
    d = ((q[:, None] - c[None]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_l2_topk_matches_oracle(rng):
    q = rng.normal(size=(37, 75)).astype(np.float32)
    c = rng.normal(size=(501, 75)).astype(np.float32)
    d_ref, i_ref = _np_l2_topk(q, c, 5)
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(c), k=5, corpus_tile=128)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-3)
    # indices can differ on exact ties; check distances of chosen indices
    chosen = ((q[:, None] - c[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(chosen, d_ref, atol=1e-3)


def test_l2_topk_corpus_smaller_than_tile(rng):
    q = rng.normal(size=(4, 8)).astype(np.float32)
    c = rng.normal(size=(10, 8)).astype(np.float32)
    d, i = l2_topk(jnp.asarray(q), jnp.asarray(c), k=3, corpus_tile=4096)
    d_ref, _ = _np_l2_topk(q, c, 3)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-5)
    assert (np.asarray(i) >= 0).all() and (np.asarray(i) < 10).all()


def _np_geo(q, c):
    dots = (q[:, None] * c[None]).sum(-1)  # (Q, N, J)
    return (1 - np.abs(dots)).mean(-1)


def _unit_quats(rng, shape):
    x = rng.normal(size=shape + (4,)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_geodesic_topk_matches_oracle(rng):
    q = _unit_quats(rng, (13, 21))
    c = _unit_quats(rng, (300, 21))
    geo = _np_geo(q, c)
    idx_ref = np.argsort(geo, axis=1)[:, :5]
    d_ref = np.take_along_axis(geo, idx_ref, axis=1)
    d, i = geodesic_topk(jnp.asarray(q), jnp.asarray(c), k=5, corpus_tile=128)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-5)
    chosen = np.take_along_axis(geo, np.asarray(i), axis=1)
    np.testing.assert_allclose(chosen, d_ref, atol=1e-5)


def test_geodesic_topk_double_cover_invariant(rng):
    q = _unit_quats(rng, (5, 21))
    c = _unit_quats(rng, (50, 21))
    d1, _ = geodesic_topk(jnp.asarray(q), jnp.asarray(c), k=3)
    d2, _ = geodesic_topk(jnp.asarray(q), jnp.asarray(-c), k=3)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_geodesic_rerank_pipeline(rng):
    """Two-stage search (L2 candidates in quat space -> geodesic re-rank)
    finds the same neighbors as exact geodesic search when candidates are
    wide enough — the reference pipeline's structure."""
    q = _unit_quats(rng, (9, 21))
    c = _unit_quats(rng, (200, 21))
    _, cand = l2_topk(
        jnp.asarray(q.reshape(9, 84)), jnp.asarray(c.reshape(200, 84)),
        k=200, corpus_tile=128,
    )
    d2, i2 = geodesic_rerank(jnp.asarray(q), jnp.asarray(c), cand, k=5)
    d_ref, _ = geodesic_topk(jnp.asarray(q), jnp.asarray(c), k=5, corpus_tile=128)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d_ref), atol=1e-5)


def test_geodesic_rerank_weighted(rng):
    from posendf_tpu.quat import SMPL_JOINT_RANK

    q = _unit_quats(rng, (4, 21))
    c = _unit_quats(rng, (64, 21))
    w = np.asarray(SMPL_JOINT_RANK)
    w = w / np.linalg.norm(w)
    cand = jnp.tile(jnp.arange(64, dtype=jnp.int32)[None], (4, 1))
    d, i = geodesic_rerank(jnp.asarray(q), jnp.asarray(c), cand, k=5,
                           weights=jnp.asarray(w))
    dots = (q[:, None] * c[None]).sum(-1)
    geo = (w * (1 - np.abs(dots))).sum(-1)
    idx_ref = np.argsort(geo, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(d), np.take_along_axis(geo, idx_ref, 1), atol=1e-5)


def test_euclidean_topk_exact_matches_oracle(rng):
    from posendf_tpu.ops import euclidean_topk

    q = _unit_quats(rng, (7, 21))
    c = _unit_quats(rng, (300, 21))
    per_joint = np.linalg.norm(q[:, None] - c[None], axis=-1)  # (7, 300, 21)
    ref = per_joint.mean(-1)
    idx_ref = np.argsort(ref, axis=1)[:, :5]
    d_ref = np.take_along_axis(ref, idx_ref, axis=1)
    d, i = euclidean_topk(jnp.asarray(q), jnp.asarray(c), k=5, corpus_tile=128)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-5)
    # weighted variant
    from posendf_tpu.quat import SMPL_JOINT_RANK

    w = np.asarray(SMPL_JOINT_RANK); w = (w / np.linalg.norm(w)).astype(np.float32)
    dw, _ = euclidean_topk(jnp.asarray(q), jnp.asarray(c), k=5,
                           corpus_tile=128, weights=jnp.asarray(w))
    refw = (w * per_joint).sum(-1)
    np.testing.assert_allclose(np.asarray(dw),
                               np.sort(refw, axis=1)[:, :5], atol=1e-5)


def test_topk_rejects_corpus_smaller_than_k(rng):
    """A corpus with fewer than k rows must be a trace-time error — the
    unfilled slots would otherwise keep the float-max/-1 init sentinels and
    silently corrupt the saved labels."""
    q = rng.random((4, 21, 4)).astype(np.float32)
    c = rng.random((3, 21, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="at least k"):
        geodesic_topk(jnp.asarray(q), jnp.asarray(c), k=5)
    with pytest.raises(ValueError, match="at least k"):
        l2_topk(jnp.asarray(q.reshape(4, -1)), jnp.asarray(c.reshape(3, -1)), k=5)
    cand = jnp.zeros((4, 2), jnp.int32)
    with pytest.raises(ValueError, match="at least k"):
        geodesic_rerank(jnp.asarray(q), jnp.asarray(c), cand, k=5)
