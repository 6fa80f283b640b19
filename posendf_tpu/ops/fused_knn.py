"""Pallas TPU kernel: exact geodesic kNN with the top-k merge fused in.

Why this kernel exists (measured on v5e, Q=4096 x N=262k, k=5, fp32 exact):
the XLA path (``ops/knn.py::geodesic_topk``) spends ~97 ms computing
distances and ~93 ms in the per-tile ``lax.top_k`` merge — XLA cannot fuse
top_k into its producer, so every (Q, T) distance tile is written to HBM
and re-read by the sort. This kernel keeps the distance tile in VMEM and
maintains the running top-k in a (TILE_Q, 8) scratch, so the merge costs a
few extra VPU passes instead of half the runtime. Best measured: 113 ms vs
191 ms XLA (36.2k qps, 1.68x) at the default 256 x 2048 tile — the v5e
sweep (tile_t in {1024..16384}, tile_q in {128..1024}) has a clear bowl
around 2048-wide corpus slabs: wider slabs buy nothing (the corpus streams
through VMEM either way) and push the merge bookkeeping out of cheap
registers; narrower ones pay per-tile overhead every 1024 rows.

Semantics match ``geodesic_topk`` (the reference metric
``data/dist_utils.py:39-48``): d(q, c) = mean_j (1 - |<q_j, c_j>|), or the
joint-weighted sum; exact fp32 (VPU broadcast-FMA dots — no bf16 MXU
passes), ascending top-k with lowest-index-first tie handling within a
tile. Cross-tile exact ties may order differently from ``lax.top_k`` (both
orders are valid top-k sets).

``dot_impl`` selects the distance-tile engine (measured, Q=4096, v5e):
'vpu' (default) — exact fp32, 38.7k qps @262k / 11.9k @1M;
'mxu_bf16' — the 21 per-joint (TQ,4)@(4,TT) dots as single-pass bf16
systolic ops, 61.0k / 21.2k qps (1.6-1.8x) with ~1e-3 distance noise that
swaps near-tie neighbors (~95% of top-5 sets identical on random corpora)
— the fused analog of default-precision einsum labeling, and what
``label_sequence(precision='default')`` uses;
'mxu' — HIGHEST-precision stacked-bf16 dots: ~1e-7 of fp32 but SLOWER
than the VPU path (17.4k / 4.8k qps — the pass stacking wastes the K=4
contraction), kept for the record;
'mxu_fast' — ONE K=84 contraction per distance tile (a manual 3-pass
bf16 split: ~4e-6 absolute, since single-pass bf16's ~1e-3 bound noise
reorders near-tie candidates) computing the hemisphere-canonicalized
upper bound sum_j w_j (1 - dot_j) (tight for near neighbors); prescreen
engine for ``fused_geodesic_topk_fast``, which reranks the candidates
with the exact metric.

Layout notes (Mosaic): queries ride the SUBLANES of the (TILE_Q, TILE_T)
distance tile and the corpus tile rides the LANES, so the corpus operand is
passed pre-transposed as (84, N) — per-(joint, dim) rows are cheap sublane
slices broadcast down, while per-(joint, dim) query columns are lane slices
broadcast across. The running-best merge works on (TILE_Q, 8) arrays whose
ops are tiny next to the 21x6 FMA passes of the distance computation.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_geodesic_topk", "fused_geodesic_topk_fast",
           "geodesic_bound_scores"]

_KPAD = 8          # minimum running-best width (lanes); widened in 8-lane
                   # steps up to the k <= 32 contract (fused_geodesic_topk)
_BIG = 3.0e38
_IBIG = 2**31 - 1


def _knn_kernel(q_ref, c_ref, dout_ref, iout_ref, bestd, besti, *,
                num_joints, k, tile_t, n_corpus, weights, dot_impl, kpad):
    """One (query-tile, corpus-tile) grid step.

    q_ref: (TILE_Q, 4J) queries; c_ref: (4J, TILE_T) corpus slab;
    bestd/besti: (TILE_Q, kpad) running top-k scratch, persistent across
    the corpus (minor) grid axis.
    """
    j = pl.program_id(1)
    n_ctiles = pl.num_programs(1)
    tq = q_ref.shape[0]

    @pl.when(j == 0)
    def _():
        bestd[:] = jnp.full((tq, kpad), _BIG, jnp.float32)
        besti[:] = jnp.full((tq, kpad), -1, jnp.int32)

    # ---- distance tile: mean_j (1 - |sum_d q_jd * c_jd|), all in VMEM
    geo = None
    if dot_impl == "vpu":
        # exact fp32: 84 broadcast-FMA passes on the VPU (the default —
        # the neighbor-identity contract needs unstacked fp32 dots)
        for joint in range(num_joints):
            acc = None
            for d in range(4):
                r = joint * 4 + d
                term = q_ref[:, r:r + 1] * c_ref[r:r + 1, :]  # (TQ,1)x(1,TT)
                acc = term if acc is None else acc + term
            pj = 1.0 - jnp.abs(acc)
            w = 1.0 / num_joints if weights is None else float(weights[joint])
            geo = w * pj if geo is None else geo + w * pj     # (TQ, TT)
    elif dot_impl == "mxu_fast":
        # ONE (TQ, 4J)@(4J, TT) systolic pass for the WHOLE distance tile.
        # The per-joint |dot| forces 21 under-filled K=4 MXU passes above;
        # but the geodesic metric is invariant to independent per-joint
        # sign flips (|<±q, ±c>| == |<q, c>|), so after canonicalizing
        # both sides to the w >= 0 hemisphere (done by the wrapper),
        # sum_j w_j (1 - dot_j) = W - q @ (w-scaled c) is computable in a
        # single K=84 contraction and is a tight UPPER bound on the true
        # distance (equality whenever every per-joint dot >= 0, which
        # holds for near neighbors). The wrapper folds w into the corpus
        # and reranks candidates with the exact metric.
        # Precision matters here: single-pass bf16 (DEFAULT) perturbs the
        # bound ~1e-3 — enough to reorder near-tie candidates and drop
        # device top-5 identity to 95.8% on sigma-0.05 clusters (measured
        # 2026-08-20). Mosaic lowers HIGHEST as ~6 bf16 passes (-19% qps)
        # and rejects HIGH, so do the classic 3-pass bf16 split by hand:
        # x = hi + lo with hi = bf16(x) ⇒ x@y ≈ hi@yh + hi@yl + lo@yh
        # (dropped lo@lo term ~2^-18 relative ≈ 4e-6 absolute — two
        # decades below the ~1e-3 near-tie spacing that broke DEFAULT).
        qf32 = q_ref[...]
        cf32 = c_ref[...]
        q_hi = qf32.astype(jnp.bfloat16)
        c_hi = cf32.astype(jnp.bfloat16)
        q_lo = (qf32 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        c_lo = (cf32 - c_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def bf16_dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        d = bf16_dot(q_hi, c_hi) + bf16_dot(q_hi, c_lo) + bf16_dot(q_lo, c_hi)
        w_total = 1.0 if weights is None else float(sum(weights))
        geo = w_total - d
    else:
        # per-joint (TQ,4)@(4,TT) dots on the MXU: replaces the 84 VPU
        # passes above with 21 systolic passes + 42 elementwise ones.
        # 'mxu' stacks bf16 passes (HIGHEST, ~1e-7 vs fp32); 'mxu_bf16'
        # is the single-pass approximate mode (~1e-3, like default-
        # precision einsum labeling)
        prec = (jax.lax.Precision.HIGHEST if dot_impl == "mxu"
                else jax.lax.Precision.DEFAULT)
        for joint in range(num_joints):
            r = joint * 4
            d = jax.lax.dot_general(
                q_ref[:, r:r + 4], c_ref[r:r + 4, :],
                (((1,), (0,)), ((), ())), precision=prec,
                preferred_element_type=jnp.float32)
            pj = 1.0 - jnp.abs(d)
            w = 1.0 / num_joints if weights is None else float(weights[joint])
            geo = w * pj if geo is None else geo + w * pj     # (TQ, TT)

    col = j * tile_t + jax.lax.broadcasted_iota(jnp.int32, geo.shape, 1)
    # mask padded corpus rows (only the last slab has any, but the where is
    # one cheap pass and keeps the kernel branch-free)
    geo = jnp.where(col < n_corpus, geo, _BIG)

    # ---- extract this tile's k smallest and fold into the running best.
    # Early-exit while_loop instead of a fixed k-pass unroll: the i-th
    # extracted tile minimum is non-decreasing in i and a row merges only
    # while m < its running k-th-best, so once EVERY row of the query tile
    # has m >= bmax the remaining passes are provably no-ops. After the
    # first few corpus slabs the running best is already tight and most
    # tiles contribute 0-2 candidates, so expected passes drop from k to
    # ~1-2 — the extraction loop, not the distance compute, dominates this
    # kernel (the K=84 'fast' contraction is ~2% of runtime).
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (tq, kpad), 1)

    def _extract_cond(state):
        i, _geo, m, bmax = state
        return jax.lax.bitwise_and(i < k, jnp.any(m < bmax))

    def _extract_body(state):
        i, geo, m, bmax = state
        idx = jnp.min(jnp.where(geo == m, col, _IBIG), axis=1,
                      keepdims=True)                                  # (TQ,1)
        geo = jnp.where(col == idx, _BIG, geo)
        bd = bestd[:]
        bpos = jnp.min(jnp.where(bd == bmax, lane8, kpad), axis=1,
                       keepdims=True)
        sel = (lane8 == bpos) & (m < bmax)
        bestd[:] = jnp.where(sel, m, bd)
        besti[:] = jnp.where(sel, idx, besti[:])
        return (i + 1,
                geo,
                jnp.min(geo, axis=1, keepdims=True),
                jnp.max(bestd[:], axis=1, keepdims=True))

    jax.lax.while_loop(
        _extract_cond, _extract_body,
        (jnp.int32(0), geo,
         jnp.min(geo, axis=1, keepdims=True),
         jnp.max(bestd[:], axis=1, keepdims=True)))

    # ---- after the last corpus slab: emit the best ascending
    @pl.when(j == n_ctiles - 1)
    def _():
        bd = bestd[:]
        bi = besti[:]
        for i in range(k):
            m = jnp.min(bd, axis=1, keepdims=True)
            pos = jnp.min(jnp.where(bd == m, lane8, kpad), axis=1,
                          keepdims=True)
            dout_ref[:, i:i + 1] = m
            iout_ref[:, i:i + 1] = jnp.min(
                jnp.where(lane8 == pos, bi, _IBIG), axis=1, keepdims=True)
            bd = jnp.where(lane8 == pos, _BIG, bd)


@functools.partial(jax.jit, static_argnames=("k", "tile_q", "tile_t",
                                             "weights", "interpret",
                                             "n_corpus", "dot_impl",
                                             "kpad"))
def _fused_topk(queries_flat, corpus_t, k, tile_q, tile_t, weights,
                interpret, n_corpus, dot_impl, kpad=_KPAD):
    Qp = queries_flat.shape[0]
    JD = queries_flat.shape[1]
    Np = corpus_t.shape[1]
    grid = (Qp // tile_q, Np // tile_t)
    kernel = functools.partial(
        _knn_kernel, num_joints=JD // 4, k=k, tile_t=tile_t,
        n_corpus=n_corpus, weights=weights, dot_impl=dot_impl, kpad=kpad)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, JD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JD, tile_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Qp, k), jnp.float32),
            jax.ShapeDtypeStruct((Qp, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_q, kpad), jnp.float32),
            pltpu.VMEM((tile_q, kpad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(queries_flat, corpus_t)


def fused_geodesic_topk(
    query_quats: jax.Array,   # (Q, J, 4)
    corpus_quats: jax.Array,  # (N, J, 4)
    k: int,
    *,
    weights: Optional[np.ndarray] = None,  # (J,) host-side joint weights
    tile_q: int = 256,
    tile_t: int = 2048,
    dot_impl: str = "vpu",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Geodesic top-k, single fused kernel. Returns (dists (Q, k),
    indices (Q, k)), ascending — same contract as ``knn.geodesic_topk``
    under the exact engines ('vpu' fp32 default, 'mxu' stacked-bf16).

    NOT the exact metric under ``dot_impl='mxu_fast'``: that engine returns
    the hemisphere-canonicalized UPPER BOUND ``sum_j w_j (1 - dot_j)``
    (equal to the true distance only when every per-joint dot >= 0), and
    its ranking is approximate for non-near pairs — it exists as the
    prescreen stage of :func:`fused_geodesic_topk_fast`, which reranks
    with the exact metric. 'mxu_bf16' is the true metric with single-pass
    bf16 noise (~1e-3).

    ``weights`` must be a CONCRETE (host) array for the fused path — it is
    baked into the kernel as constants (21 floats). k <= 32 (the running-
    best scratch widens in 8-lane steps).
    """
    kpad = max(_KPAD, -(-k // 8) * 8)   # running-best width, 8-lane steps
    if k > 32:
        raise ValueError(f"fused path supports k <= 32, got {k}")
    Q, J, four = query_quats.shape
    N = corpus_quats.shape[0]
    if N < k:
        raise ValueError(f"top-k needs a corpus of at least k={k} rows, got {N}")
    if weights is not None:
        weights = tuple(float(w) for w in np.asarray(weights).reshape(-1))
        if len(weights) != J:
            raise ValueError(f"weights must have {J} entries")

    # clamp tiles to the (padded) problem, keeping lane/sublane alignment
    tile_q = max(8, min(tile_q, -(-Q // 8) * 8))
    tile_t = max(128, min(tile_t, -(-N // 128) * 128))

    qf = query_quats.reshape(Q, J * four).astype(jnp.float32)
    pad_q = (-Q) % tile_q
    if pad_q:
        qf = jnp.concatenate(
            [qf, jnp.zeros((pad_q, J * four), jnp.float32)], axis=0)
    ct = corpus_quats.reshape(N, J * four).astype(jnp.float32).T  # (4J, N)
    pad_n = (-N) % tile_t
    if pad_n:
        ct = jnp.concatenate(
            [ct, jnp.zeros((J * four, pad_n), jnp.float32)], axis=1)

    if dot_impl not in ("vpu", "mxu", "mxu_bf16", "mxu_fast"):
        raise ValueError(
            f"dot_impl must be vpu|mxu|mxu_bf16|mxu_fast, got {dot_impl!r}")
    if dot_impl == "mxu_fast":
        # hemisphere canonicalization (geodesic-invariant: |<±q, ±c>| is
        # unchanged) makes per-joint dots of near neighbors positive, so
        # the kernel's single-pass upper bound is tight where it matters
        qf = _canonicalize_flat(qf, J)
        ct = _canonicalize_flat(ct.T, J).T
        if weights is not None:
            # fold the joint weights into the corpus rows: the kernel's
            # one dot then yields sum_j w_j dot_j directly
            s = jnp.asarray(np.repeat(np.asarray(weights, np.float32), 4))
            ct = ct * s[:, None]
        else:
            ct = ct * jnp.float32(1.0 / J)
    dists, idx = _fused_topk(qf, ct, k, tile_q, tile_t, weights,
                             interpret, N, dot_impl, kpad=kpad)
    return dists[:Q], idx[:Q]


def geodesic_bound_scores(
    query_quats: jax.Array,   # (Q, J, 4)
    corpus_quats: jax.Array,  # (N, J, 4)
    weights: Optional[np.ndarray] = None,
) -> jax.Array:
    """Pure-XLA form of the 'fast' engine's prescreen bound: the
    hemisphere-canonicalized ``sum_j w_j (1 - dot_j)`` as ONE (Q, 4J) @
    (4J, N) contraction — exactly the quantity the ``mxu_fast`` kernel
    ranks by (to fp32 precision here; the kernel's 3-pass bf16 split is
    within ~4e-6 of it). Backend-agnostic: this is what the corpus-safety
    probe (``data/prepare.py::probe_fast_safety``) evaluates the bound
    with, so 'auto' engine selection works identically on CPU and TPU.
    Returns (Q, N) bound scores (>= the true geodesic distance, equality
    iff every canonicalized per-joint dot >= 0).
    """
    Q, J, _ = query_quats.shape
    qf = _canonicalize_flat(query_quats.reshape(Q, J * 4)
                            .astype(jnp.float32), J)
    N = corpus_quats.shape[0]
    cf = _canonicalize_flat(corpus_quats.reshape(N, J * 4)
                            .astype(jnp.float32), J)
    if weights is not None:
        w = np.asarray(weights, np.float32).reshape(-1)
        cf = cf * jnp.asarray(np.repeat(w, 4))[None, :]
        w_total = float(w.sum())
    else:
        cf = cf * jnp.float32(1.0 / J)
        w_total = 1.0
    return w_total - jax.lax.dot_general(
        qf, cf.T, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def _canonicalize_flat(qf: jax.Array, J: int) -> jax.Array:
    """Flip each joint quaternion of (B, 4J) rows into the w >= 0
    hemisphere (sign(0) treated as +). Geodesic distances are unchanged."""
    B = qf.shape[0]
    q = qf.reshape(B, J, 4)
    flip = jnp.where(q[..., :1] < 0.0, -1.0, 1.0)
    return (q * flip).reshape(B, J * 4)


def fused_geodesic_topk_fast(
    query_quats: jax.Array,   # (Q, J, 4)
    corpus_quats: jax.Array,  # (N, J, 4)
    k: int,
    *,
    prescreen_k: Optional[int] = None,
    weights: Optional[np.ndarray] = None,
    tile_q: int = 256,
    tile_t: int = 8192,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage exact-metric top-k: single-MXU-pass upper-bound prescreen
    (``dot_impl='mxu_fast'``) to ``prescreen_k`` candidates, then exact
    fp32 geodesic rerank of those candidates (``ops/knn.py::
    geodesic_rerank``). The TPU-shaped analog of the reference's
    faiss-euclidean-then-geodesic pipeline (``data/prepare_traindata.py:
    45,192-199``) — except the prescreen bound is geodesic-aware (tight
    for near neighbors), so a candidate depth of 8 replaces faiss' 500.

    Exactness contract: the prescreen orders by an upper bound that equals
    the true distance when every per-joint dot of the (canonicalized)
    pair is >= 0. On POSE corpora that holds for near neighbors: SMPL
    joint rotations have theta < pi so w = cos(theta/2) is bounded away
    from the w=0 canonicalization boundary, sign flips are consistent
    within a neighborhood, and dots of near pairs are ~1 > 0 — so the
    true top-k survives the prescreen and the rerank returns the exact
    answer (tests/test_fused_knn.py pins this bit-for-bit on pose-like
    clusters). On uniform-random S^3 corpora (~15% of joints within
    sign-flip range of w=0) recall degrades gracefully instead — the
    adversarial test bounds it — and the returned distances are always
    the exact metric of whatever candidates survive.

    ``prescreen_k`` defaults to ``max(2*k, 8)`` so the exact rerank always
    has candidate margin to correct prescreen ordering errors (at
    ``prescreen_k == k`` the rerank can only re-sort, and recall rests
    entirely on the bound's tightness). Still one kernel pass either way —
    the running-best scratch rounds to 8-lane steps.
    """
    if prescreen_k is None:
        prescreen_k = max(2 * k, _KPAD)
    if k > prescreen_k:
        raise ValueError(f"k={k} > prescreen_k={prescreen_k}")
    prescreen_k = max(k, min(prescreen_k, corpus_quats.shape[0]))
    w = None if weights is None else jnp.asarray(weights, jnp.float32)
    _, cand = fused_geodesic_topk(
        query_quats, corpus_quats, prescreen_k, weights=weights,
        tile_q=tile_q, tile_t=tile_t, dot_impl="mxu_fast",
        interpret=interpret)
    from posendf_tpu.ops.knn import geodesic_rerank

    return geodesic_rerank(query_quats, corpus_quats, cand, k, w)
