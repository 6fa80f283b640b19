"""Fused Pallas kNN kernel vs the XLA streaming path.

Runs in Pallas interpret mode so it executes on the CPU test backend; the
same kernel is exercised compiled on real TPU by bench.py. The XLA path
(`ops/knn.py::geodesic_topk`) is itself oracle-tested vs numpy in
test_knn.py, so agreement here chains to the exactness claim.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from posendf_tpu.ops.fused_knn import fused_geodesic_topk
from posendf_tpu.ops.knn import geodesic_topk
from posendf_tpu.quat import SMPL_JOINT_RANK


def _quats(rng, n):
    q = rng.normal(size=(n, 21, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.mark.parametrize("Q,N,k,tq,tt", [
    (64, 700, 5, 16, 256),     # padded corpus (700 % 256 != 0)
    (100, 300, 5, 32, 128),    # padded queries (100 % 32 != 0)
    (8, 130, 3, 8, 128),       # min-size tiles, k < 5
    (33, 1000, 8, 16, 256),    # k at the _KPAD limit, multi-tile both axes
])
def test_fused_matches_xla(rng, Q, N, k, tq, tt):
    q = jnp.asarray(_quats(rng, Q))
    c = jnp.asarray(_quats(rng, N))
    d_ref, i_ref = geodesic_topk(q, c, k)
    d, i = fused_geodesic_topk(q, c, k, tile_q=tq, tile_t=tt, interpret=True)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_fused_weighted(rng):
    w = (SMPL_JOINT_RANK / np.linalg.norm(SMPL_JOINT_RANK)).astype(np.float32)
    q = jnp.asarray(_quats(rng, 40))
    c = jnp.asarray(_quats(rng, 500))
    d_ref, i_ref = geodesic_topk(q, c, 5, weights=jnp.asarray(w))
    d, i = fused_geodesic_topk(q, c, 5, weights=w, tile_q=16, tile_t=256,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.parametrize("impl", ["mxu", "mxu_bf16"])
def test_fused_mxu_dots_match_xla(rng, impl):
    """The MXU dot modes compute the same math (interpret mode runs the
    dots in fp32, so agreement is exact here; on-chip precision deltas are
    measured by scripts/tpu_knn_mxu_ab.py and documented in
    ARCHITECTURE)."""
    q = jnp.asarray(_quats(rng, 64))
    c = jnp.asarray(_quats(rng, 700))
    d_ref, i_ref = geodesic_topk(q, c, 5)
    d, i = fused_geodesic_topk(q, c, 5, tile_q=16, tile_t=256,
                               dot_impl=impl, interpret=True)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_fused_validates_inputs(rng):
    q = jnp.asarray(_quats(rng, 4))
    c = jnp.asarray(_quats(rng, 16))
    with pytest.raises(ValueError, match="k <= 8"):
        fused_geodesic_topk(q, c, 9, interpret=True)
    with pytest.raises(ValueError, match="corpus of at least"):
        fused_geodesic_topk(q, jnp.asarray(_quats(rng, 3)), 5, interpret=True)
    with pytest.raises(ValueError, match="weights"):
        fused_geodesic_topk(q, c, 5, weights=np.ones(7, np.float32),
                            interpret=True)


def test_label_sequence_fused_wiring(rng):
    """label_sequence(fused=True) produces the same labels as the XLA path
    (same rng seed -> identical queries -> identical exact neighbors)."""
    from jax.experimental.pallas import tpu as pltpu

    from posendf_tpu.data.prepare import label_sequence

    corpus = jnp.asarray(_quats(rng, 300))
    seq = _quats(rng, 20)
    kw = dict(num_queries=32, k=4, query_batch=16)
    ref = label_sequence(seq, corpus, fused=False,
                         rng=np.random.default_rng(7), **kw)
    with pltpu.force_tpu_interpret_mode():
        out = label_sequence(seq, corpus, fused=True,
                             rng=np.random.default_rng(7), **kw)
    np.testing.assert_allclose(out["dist"], ref["dist"], atol=1e-6)
    np.testing.assert_array_equal(out["nn_pose"], ref["nn_pose"])


def test_label_sequence_fused_default_precision_wiring(rng):
    """precision='default' keeps the fused path eligible and routes it to
    the MXU-bf16 dot mode (exact in interpret mode, so labels still match
    the XLA reference here; the on-chip ~1e-3 delta is measured in
    scripts/tpu_knn_mxu_ab.py)."""
    from jax.experimental.pallas import tpu as pltpu

    from posendf_tpu.data.prepare import label_sequence

    corpus = jnp.asarray(_quats(rng, 300))
    seq = _quats(rng, 20)
    kw = dict(num_queries=32, k=4, query_batch=16)
    ref = label_sequence(seq, corpus, fused=False, precision="highest",
                         rng=np.random.default_rng(7), **kw)
    with pltpu.force_tpu_interpret_mode():
        out = label_sequence(seq, corpus, fused=True, precision="default",
                             rng=np.random.default_rng(7), **kw)
    np.testing.assert_allclose(out["dist"], ref["dist"], atol=1e-6)
    np.testing.assert_array_equal(out["nn_pose"], ref["nn_pose"])


def test_label_sequence_fused_rejects_ineligible(rng):
    from posendf_tpu.data.prepare import label_sequence

    corpus = jnp.asarray(_quats(rng, 100))
    seq = _quats(rng, 10)
    with pytest.raises(ValueError, match="fused=True"):
        label_sequence(seq, corpus, num_queries=8, metric="euc", fused=True,
                       rng=np.random.default_rng(0))
    with pytest.raises(ValueError, match="fused=True"):
        label_sequence(seq, corpus, num_queries=8, k_candidates=50,
                       fused=True, rng=np.random.default_rng(0))


def test_fused_duplicate_corpus_rows(rng):
    """k duplicates of the query in the corpus: distances collapse to ~0 and
    every duplicate index is found (the running-best merge must keep
    multiple same-distance entries, not dedupe them)."""
    q = _quats(rng, 4)
    c = _quats(rng, 140)
    c[10] = c[50] = c[90] = q[0]
    d, i = fused_geodesic_topk(jnp.asarray(q), jnp.asarray(c), 3,
                               tile_q=8, tile_t=128, interpret=True)
    assert np.asarray(d)[0].max() < 1e-6
    assert set(np.asarray(i)[0]) == {10, 50, 90}


def test_label_sequence_fused_sharded(rng):
    """label_sequence(fused=True, mesh=...) runs the kernel per-chip under
    shard_map (queries sharded, corpus replicated) and must reproduce the
    unsharded exact labels bit-for-bit. 2-device mesh: 8 shards of
    interpreted Pallas are too slow for CI."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    from posendf_tpu.data.prepare import label_sequence

    corpus = jnp.asarray(_quats(rng, 300))
    seq = _quats(rng, 20)
    kw = dict(num_queries=32, k=4, query_batch=16)
    ref = label_sequence(seq, corpus, fused=False,
                         rng=np.random.default_rng(7), **kw)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    with pltpu.force_tpu_interpret_mode():
        out = label_sequence(seq, corpus, fused=True, mesh=mesh,
                             rng=np.random.default_rng(7), **kw)
    np.testing.assert_allclose(out["dist"], ref["dist"], atol=1e-6)
    np.testing.assert_array_equal(out["nn_pose"], ref["nn_pose"])
