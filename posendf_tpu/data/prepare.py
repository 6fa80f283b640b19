"""Data manufacturing: AMASS sampling + noisy-pose generation + kNN labeling.

Capability parity with the reference's three-stage pipeline:

  stage 1 — ``data/sample_poses.py``: walk raw AMASS ``<subset>/<seq>/*.npz``
    mocap clips, skip shape/template files, keep a random ~24% of the middle
    80% of each clip (avoids T-poses at clip boundaries), write per-sequence
    ``pose_body`` (N, 63+) axis-angle + ``root_orient`` + ``betas``.
  stage 2 — ``data/prepare_data.py``: the reference generates a 409-line bash
    script (optionally a Slurm array job) running one GPU process per
    sequence. Here that fan-out is GONE: stage 3 is a single sharded program.
  stage 3 — ``data/prepare_traindata.py`` + ``data/dist_utils.py``: for each
    sequence, draw noisy quaternion queries (sigma grid
    [0.01, 0.05, 0.1, 0.25, 0.5], uniform noise, per-joint renormalize,
    ``data/create_data.py:51-52,83-96``), search candidates (faiss k=500),
    re-rank by the exact quaternion geodesic to k=5, save
    ``{pose, dist, nn_pose}``.

TPU-native design: the kNN search + geodesic re-rank is one jitted program
(``posendf_tpu.ops.knn``) over the whole query batch, shardable over a
``data`` mesh axis (``mesh=``); the quaternion corpus is replicated (100M
floats fits HBM). The reference's two-stage search is kept as options
(``k_candidates=500`` quat-space candidates, or ``space='joints'`` for its
joint-position index), but the default is the EXACT single-stage geodesic
top-k — affordable on the MXU, and it removes the candidate-set
approximation entirely. Multi-host fan-out (the Slurm replacement) is
``label_split(shard=(i, n))``: host i of n takes every n-th sequence,
restart-safe via the per-sequence skip guard.
"""

from __future__ import annotations

import functools
import glob
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from posendf_tpu.data.splits import AMASS_SPLITS

__all__ = [
    "sample_amass", "build_corpus", "NoiseSpec", "sample_noisy_queries",
    "probe_fast_safety", "resolve_knn_precision",
    "label_sequence", "label_split", "run_cli",
]


# --------------------------------------------------------------------------
# stage 1: raw AMASS -> per-sequence sampled pose files (host-side, IO bound)
# --------------------------------------------------------------------------

def sample_amass(
    raw_dir: str,
    out_dir: str,
    subsets: Sequence[str],
    keep_frac: float = 0.3,
    middle_frac: float = 0.8,
    seed: int = 0,
    skip_if_exists: bool = True,
) -> List[str]:
    """Subsample raw AMASS mocap clips into per-sequence pose files.

    Keeps ``keep_frac`` of the middle ``middle_frac`` of each clip (the
    reference's 0.3 * 0.8 heuristic, ``data/sample_poses.py:42-44``), writing
    ``pose_body`` (N, 63) (SMPL body joints 1..21), ``root_orient`` (N, 3)
    and ``betas``. Idempotent: skips existing outputs (the reference's
    restart guard, ``sample_poses.py:31-33``).
    """
    rng = np.random.default_rng(seed)
    written = []
    for subset in subsets:
        sub_dir = os.path.join(raw_dir, subset)
        if not os.path.isdir(sub_dir):
            continue
        for seq_dir in sorted(os.listdir(sub_dir)):
            seq_path = os.path.join(sub_dir, seq_dir)
            if not os.path.isdir(seq_path):
                continue
            for npz in sorted(glob.glob(os.path.join(seq_path, "*.npz"))):
                base = os.path.basename(npz)
                if "shape" in base or "stagei" in base or base.startswith("neutral"):
                    continue
                out_sub = os.path.join(out_dir, subset)
                os.makedirs(out_sub, exist_ok=True)
                out_path = os.path.join(out_sub, f"{seq_dir}_{base}")
                if skip_if_exists and os.path.exists(out_path):
                    written.append(out_path)
                    continue
                try:
                    with np.load(npz) as z:
                        if "poses" in z:
                            poses = np.asarray(z["poses"])      # (T, 156/72...)
                            pose_body = poses[:, 3:66]          # 21 body joints
                            root_orient = poses[:, :3]
                        elif "pose_body" in z:
                            pose_body = np.asarray(z["pose_body"])[:, :63]
                            root_orient = np.asarray(z.get("root_orient",
                                                           np.zeros((len(pose_body), 3))))
                        else:
                            continue
                        betas = np.asarray(z.get("betas", np.zeros(10)))
                except (OSError, ValueError, KeyError):
                    continue
                T = len(pose_body)
                if T < 10:
                    continue
                lo = int(T * (1 - middle_frac) / 2)
                hi = T - lo
                n_keep = max(1, int(keep_frac * (hi - lo)))
                idx = np.sort(rng.choice(np.arange(lo, hi), size=min(n_keep, hi - lo),
                                         replace=False))
                np.savez(
                    out_path,
                    pose_body=pose_body[idx].astype(np.float32),
                    root_orient=root_orient[idx].astype(np.float32),
                    betas=betas.astype(np.float32),
                )
                written.append(out_path)
    return written


# --------------------------------------------------------------------------
# corpus assembly + noisy query sampling
# --------------------------------------------------------------------------

def _to_quats(pose_body: np.ndarray) -> np.ndarray:
    """(N, 63) axis-angle -> (N, 21, 4) unit quaternions (host numpy math,
    same conventions as posendf_tpu.quat)."""
    aa = pose_body.reshape(-1, 21, 3).astype(np.float64)
    angle = np.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    safe = np.where(small, 1.0, angle)
    s = np.where(small, 0.5 - angle * angle / 48.0, np.sin(half) / safe)
    return np.concatenate([np.cos(half), aa * s], axis=-1).astype(np.float32)


def build_corpus(sampled_dir: str, subsets: Sequence[str]) -> Tuple[np.ndarray, List[str]]:
    """Concatenate every sampled sequence of the given subsets into one
    (N, 21, 4) quaternion corpus. Returns (corpus, file list)."""
    files = [
        f for f in sorted(glob.glob(os.path.join(sampled_dir, "*", "*.npz")))
        if os.path.basename(os.path.dirname(f)) in subsets
    ]
    chunks = []
    for f in files:
        with np.load(f) as z:
            key = "pose_body" if "pose_body" in z else "pose"
            arr = np.asarray(z[key])
        if arr.ndim == 3 and arr.shape[-1] == 4:
            chunks.append(arr.astype(np.float32))
        else:
            chunks.append(_to_quats(arr[:, :63]))
    if not chunks:
        raise FileNotFoundError(f"no sampled sequences under {sampled_dir} for {subsets}")
    return np.concatenate(chunks), files


@dataclass
class NoiseSpec:
    """Sigma grid of the reference noisy-query sampler
    (``data/create_data.py:51-52``), plus the framework's structured-noise
    extension.

    ``structured_frac > 0`` diverts that fraction of each run's samples to
    LIMB-STRUCTURED corruption: a random kinematic chain
    (``SMPL_LIMB_CHAINS``) gets per-joint gaussian quaternion noise at a
    sigma drawn from ``structured_sigma``, all other joints stay clean.
    Why: the reference's noise family perturbs ALL joints at once, so a
    field trained on it is measurably blind to few-joint large errors —
    the occlusion/tracking-failure corruption class of the partial task
    (probe: true 5-NN 0.119 read as d=0.011,
    docs/quality/partial_closed_loop.json). Structured samples teach the
    field that direction class. Default 0.0 = reference-exact sampler.
    """

    sigmas: Tuple[float, ...] = (0.01, 0.05, 0.1, 0.25, 0.5)
    distribution: Tuple[float, ...] = (0.2, 0.2, 0.2, 0.2, 0.2)
    structured_frac: float = 0.0
    structured_sigma: Tuple[float, float] = (0.3, 1.0)

    def counts(self, num_samples: int) -> np.ndarray:
        return np.rint(num_samples * np.asarray(self.distribution)).astype(np.int64)


# SMPL body-pose joint chains (kinematics.py numbering: body joint i =
# skeleton joint i+1) — the corruption units of structured noise and the
# occlusion sets of the partial-observation benchmark
SMPL_LIMB_CHAINS: Tuple[Tuple[int, ...], ...] = (
    (12, 15, 17, 19),    # left arm: collar, shoulder, elbow, wrist
    (13, 16, 18, 20),    # right arm
    (0, 3, 6, 9),        # left leg: hip, knee, ankle, foot
    (1, 4, 7, 10),       # right leg
    (2, 5, 8, 11, 14),   # spine1-3, neck, head
)


def quat_doublecover(quats: np.ndarray, samples: int,
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Randomly negate ``samples`` joint quaternions so training data covers
    both hemispheres of the q == -q double cover (reference augmentation,
    ``data/create_data.py:22-27``)."""
    rng = rng or np.random.default_rng(0)
    out = quats.reshape(-1, 4).copy()
    idx = rng.integers(0, len(out), samples)
    out[idx] = -out[idx]
    return out.reshape(quats.shape)


def sample_noisy_queries(
    clean_quats: np.ndarray,
    num_samples: int,
    spec: NoiseSpec = NoiseSpec(),
    rng: Optional[np.random.Generator] = None,
    *,
    per_pose_noise: bool = False,
    runs: int = 1,
) -> np.ndarray:
    """Draw noisy queries: pick clean poses, add sigma * U[0,1) noise,
    renormalize each joint quaternion (reference semantics:
    ``create_data.py:85-91``). Returns (runs * sum(counts), 21, 4) float32.

    Reference quirk kept on the DEFAULT path: the reference draws ONE
    (21, 4) uniform noise sample per sigma group and broadcasts it across
    *all* poses of that group (``sampled_pose + self.sigma[i]*np.random.rand(21,4)``,
    ``data/create_data.py:88`` — rand(21,4), not rand(n,21,4)), so noise is
    fully correlated within a group. The group granularity is one
    ``__getitem__`` of the reference's query loader — ``num_samples`` poses —
    and the labeler iterates ``runs=1000`` of them per sequence
    (``prepare_traindata.py:45,104``): pass ``runs`` to reproduce that draw
    structure (``num_samples`` is the total; each run draws
    ``counts(num_samples // runs)``). ``per_pose_noise=True`` is the
    corrected variant with an independent draw per pose — statistically
    better coverage of the noise ball, but a divergence from the data
    distribution the reference trained on.
    """
    rng = rng or np.random.default_rng(0)
    if runs > 1 and num_samples % runs:
        raise ValueError(
            f"num_samples={num_samples} must divide evenly into runs={runs} "
            "(the reference draws equal-sized run batches, "
            "prepare_traindata.py:45) — truncating silently would return "
            "fewer queries than requested")
    out = []
    per_run = num_samples // runs if runs > 1 else num_samples
    n_struct = int(round(per_run * spec.structured_frac))
    n_grid = per_run - n_struct
    # structured-only requests (n_grid == 0) legitimately need no grid
    # draws — only raise when GRID samples were requested but every
    # per-sigma count rounded to zero
    if n_struct == 0 and int(spec.counts(per_run).sum()) == 0:
        raise ValueError(
            f"num_samples={num_samples} over runs={runs} rounds every "
            "per-sigma count to zero — nothing to sample")
    if n_struct and n_grid > 0 and int(spec.counts(n_grid).sum()) == 0:
        raise ValueError(
            f"structured_frac={spec.structured_frac} leaves only {n_grid} "
            "grid samples per run, which rounds every per-sigma count to "
            "zero")
    for _ in range(runs):
        for sigma, n in zip(spec.sigmas, spec.counts(n_grid)):
            if n == 0:
                continue
            idx = rng.integers(0, len(clean_quats), n)
            shape = (n, 21, 4) if per_pose_noise else (21, 4)
            noisy = clean_quats[idx] + sigma * rng.random(shape, dtype=np.float32)
            noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True)
            out.append(noisy.astype(np.float32))
        if n_struct:
            # structured samples: ONE random limb chain per query gets
            # per-joint gaussian noise at a per-query sigma, all other
            # joints stay exactly clean. Gaussian (not the grid's U[0,1))
            # is deliberate: this is a new corruption class, not a
            # reference quirk, and the zero-mean draw covers the chain's
            # rotation neighborhood symmetrically. rng is only touched
            # when n_struct > 0, so structured_frac=0.0 reproduces the
            # reference draw stream bit-for-bit.
            idx = rng.integers(0, len(clean_quats), n_struct)
            base = clean_quats[idx].copy()
            chain_ids = rng.integers(0, len(SMPL_LIMB_CHAINS), n_struct)
            sig = rng.uniform(*spec.structured_sigma,
                              size=n_struct).astype(np.float32)
            for c, chain in enumerate(SMPL_LIMB_CHAINS):
                m = chain_ids == c
                if not m.any():
                    continue
                noise = rng.standard_normal(
                    (int(m.sum()), len(chain), 4)).astype(np.float32)
                base[np.ix_(m, np.asarray(chain))] += sig[m, None, None] * noise
            base /= np.linalg.norm(base, axis=-1, keepdims=True)
            out.append(base.astype(np.float32))
    return np.concatenate(out)


# --------------------------------------------------------------------------
# 'fast'-engine corpus-safety probe (auto engine selection)
# --------------------------------------------------------------------------

def probe_fast_safety(
    corpus_np: np.ndarray,      # (N, 21, 4)
    rng: Optional[np.random.Generator] = None,
    *,
    k: int = 5,
    weights: Optional[np.ndarray] = None,
    n_queries: int = 256,
    corpus_cap: int = 16384,
    margin: float = 0.05,
    spec: Optional[NoiseSpec] = None,
) -> dict:
    """Measure whether THIS corpus is safe for the 'fast' kNN engine.

    The 'fast' engine's prescreen ranks by an upper bound that is tight
    only when per-joint dots of canonicalized near pairs stay positive —
    guaranteed on pose-like corpora (SMPL joint angles < pi keep |w| away
    from the sign-flip boundary) but measurably broken on uniform-random
    S^3 corpora (~0.22 recall, ARCHITECTURE §4). This probe replaces that
    documented footgun with two measured statistics, for microseconds
    against a labeling job:

      * ``w_margin_frac`` — fraction of joint quaternions within ``margin``
        of the w=0 canonicalization boundary (the bound's failure channel);
        pose corpora measure ~0, uniform S^3 ~2*margin/(pi/2) ~ 6%;
      * ``topk_overlap`` / ``label_mae`` — direct bound-vs-exact agreement
        on ``n_queries`` noisy queries (the training sampler's sigma grid)
        against a <= ``corpus_cap``-row corpus sample, evaluating the
        prescreen bound in pure XLA (``ops/fused_knn.py::
        geodesic_bound_scores`` — the kernel's exact math to fp32) and
        reranking exactly, versus the exact top-k.

    ``safe`` = w_margin_frac <= 0.02 AND topk_overlap >= 0.995. The
    reference picks its faiss prescreen depth 500 blind
    (``data/prepare_traindata.py:45,192-199``); this measures instead.
    """
    import jax
    import jax.numpy as jnp

    from posendf_tpu.ops.fused_knn import geodesic_bound_scores
    from posendf_tpu.ops.knn import geodesic_rerank, geodesic_topk

    rng = rng or np.random.default_rng(12345)
    spec = spec or NoiseSpec()
    N = len(corpus_np)
    if N > corpus_cap:
        sub = corpus_np[rng.choice(N, corpus_cap, replace=False)]
    else:
        sub = corpus_np
    k_eff = min(k, len(sub))
    queries = sample_noisy_queries(sub, n_queries, spec, rng,
                                   per_pose_noise=True)

    w_frac = float(np.mean(np.abs(
        np.concatenate([sub, queries])[..., 0]) < margin))

    q = jnp.asarray(queries)
    c = jnp.asarray(sub)
    w_dev = None if weights is None else jnp.asarray(weights, jnp.float32)
    d_exact, i_exact = geodesic_topk(q, c, k=k_eff, weights=w_dev,
                                     precision="highest")
    scores = geodesic_bound_scores(q, c, weights=weights)
    prescreen_k = min(max(2 * k_eff, 8), len(sub))
    _, cand = jax.lax.top_k(-scores, prescreen_k)
    d_fast, i_fast = geodesic_rerank(q, c, cand, k_eff, w_dev)

    ie, if_ = np.asarray(i_exact), np.asarray(i_fast)
    overlap = float(np.mean([
        len(set(ie[r]) & set(if_[r])) / k_eff for r in range(len(ie))]))
    de, df = np.asarray(d_exact), np.asarray(d_fast)
    mae = float(np.mean(np.abs(df - de)))
    scale = max(float(np.mean(de)), 1e-12)
    return {
        "safe": bool(w_frac <= 0.02 and overlap >= 0.995),
        "w_margin_frac": w_frac,
        "topk_overlap": overlap,
        "label_mae": mae,
        "label_mae_rel": mae / scale,
        "n_queries": int(len(queries)),
        "corpus_probe_rows": int(len(sub)),
        "k": int(k_eff),
    }


def resolve_knn_precision(
    precision: str,
    corpus_np: np.ndarray,
    *,
    k: int = 5,
    weighted: bool = False,
    metric: str = "geo",
    k_candidates: int = 0,
    space: str = "quat",
    fused=None,
    mesh=None,
    rng: Optional[np.random.Generator] = None,
    backend: Optional[str] = None,
    verbose: bool = True,
) -> Tuple[str, Optional[dict]]:
    """Resolve ``precision='auto'`` to a concrete engine with a measured
    corpus-safety probe; other values pass through unchanged.

    'auto' picks **fast** (prescreen + exact rerank, ~2.4-3.4x the exact
    kernel) when the fast engine applies to this search (single-stage
    geodesic, k <= 8, TPU backend, fused not disabled, and — when a mesh
    is given — fused=True, since the sharded DEFAULT engine is the XLA
    scan, which has no prescreen analog) AND :func:`probe_fast_safety`
    passes on this corpus; **highest** (exact) otherwise. The measured
    statistic is logged either way and returned. ``backend`` overrides
    backend detection (tests).
    """
    if precision != "auto":
        return precision, None
    import jax

    if backend is None:
        backend = jax.default_backend()
    eligible = (metric == "geo" and space == "quat" and not k_candidates
                and k <= 8 and fused is not False and backend == "tpu"
                and (mesh is None or fused is True))
    if not eligible:
        if verbose:
            print("knn auto: fast engine not applicable to this search "
                  f"(metric={metric}, space={space}, k_candidates="
                  f"{k_candidates}, k={k}, backend={backend}, "
                  f"sharded={mesh is not None}) -> exact 'highest'")
        return "highest", None
    from posendf_tpu.quat import SMPL_JOINT_RANK

    w_np = None
    if weighted:
        w_np = (np.asarray(SMPL_JOINT_RANK, np.float32)
                / np.linalg.norm(SMPL_JOINT_RANK))
    stats = probe_fast_safety(corpus_np, rng, k=k, weights=w_np)
    choice = "fast" if stats["safe"] else "highest"
    if verbose:
        print(f"knn auto probe: w-margin frac {stats['w_margin_frac']:.4f}, "
              f"top-{stats['k']} overlap {stats['topk_overlap']:.4f}, "
              f"label MAE {stats['label_mae']:.2e} "
              f"({100 * stats['label_mae_rel']:.2f}% of label scale) over "
              f"{stats['n_queries']} queries x "
              f"{stats['corpus_probe_rows']} rows -> "
              f"{'FAST (bound tight on this corpus)' if stats['safe'] else 'exact HIGHEST (bound not trustworthy here)'}")
    return choice, stats


# --------------------------------------------------------------------------
# stage 3: device-side labeling
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _sharded_fused_search(mesh, k: int, weighted: bool,
                          dot_impl: str = "vpu"):
    """Cached jit(shard_map) single-kernel search for
    ``label_sequence(fused=True, mesh=...)``.

    Cached on (mesh, k, weighted), bounded so stale Mesh objects (and
    their device handles) don't pin forever: rebuilding the jitted wrapper
    per label_sequence call forces a retrace + executable fetch per
    sequence (measured ~1 s/batch — 10x the kernel itself; inside one jit
    object the shard_map'd kernel times IDENTICAL to the raw kernel,
    79.9 vs 80.5 ms at 4096x262k)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from posendf_tpu.ops.fused_knn import (fused_geodesic_topk,
                                           fused_geodesic_topk_fast)
    from posendf_tpu.quat import SMPL_JOINT_RANK

    w_np = None
    if weighted:
        w_np = (np.asarray(SMPL_JOINT_RANK, np.float32)
                / np.linalg.norm(SMPL_JOINT_RANK))
    if dot_impl == "fast":
        # one-MXU-pass upper-bound prescreen + exact rerank (all XLA-safe
        # ops, so it shard_maps like the plain kernel)
        fn = functools.partial(fused_geodesic_topk_fast, k=k, weights=w_np)
    else:
        fn = functools.partial(fused_geodesic_topk, k=k, weights=w_np,
                               dot_impl=dot_impl)
    return jax.jit(jax.shard_map(
        fn,
        mesh=mesh, in_specs=(P("data"), P()),
        out_specs=(P("data"), P("data")), check_vma=False,
    ))


def _fk_joint_embedding(quats: np.ndarray, body_model, batch: int = 8192) -> np.ndarray:
    """(N, 21, 4) -> (N, 75) posed joint positions via SMPL forward
    kinematics — the joint-space search embedding. The reference builds its
    faiss index over ``joints[:, :25]`` (``prepare_traindata.py:42,147``:
    24 skeleton joints + the nose landmark); for synthetic test meshes with
    no landmark vertices Jtr is (N, 24, 3) and the embedding is 72-D."""
    import jax.numpy as jnp

    from posendf_tpu.quat import quaternion_to_axis_angle

    outs = []
    for s in range(0, len(quats), batch):
        aa = quaternion_to_axis_angle(jnp.asarray(quats[s:s + batch]))
        out = body_model(pose_body=aa.reshape(len(aa), 63))
        j = np.asarray(out.Jtr)[:, :25]  # prepare_traindata.py:147
        outs.append(j.reshape(len(aa), -1).astype(np.float32))
    return np.concatenate(outs)

def label_sequence(
    seq_quats: np.ndarray,     # clean poses of the sequence (for query sampling)
    corpus: "object",          # (N, 21, 4) jax array (possibly device-put once)
    *,
    num_queries: int,
    k: int = 5,
    k_candidates: int = 0,
    metric: str = "geo",
    weighted: bool = False,
    query_batch: int = 4096,
    rng: Optional[np.random.Generator] = None,
    spec: NoiseSpec = NoiseSpec(),
    mesh=None,
    space: str = "quat",
    body_model=None,
    corpus_emb=None,
    corpus_np: Optional[np.ndarray] = None,
    precision: str = "highest",
    per_pose_noise: bool = False,
    runs: int = 1,
    fused: Optional[bool] = None,
) -> dict:
    """Label one sequence: noisy queries + their k nearest distances against
    the corpus. ``metric``: 'geo' (quaternion geodesic, reference default) or
    'euc' (per-joint L2, ``dist_utils.euc``); ``weighted`` uses the
    joint-rank weights (``dist_utils.py:16,39``). ``k_candidates > 0``
    selects the reference-shaped two-stage search (L2 candidates -> re-rank);
    0 = exact single-stage geodesic top-k.

    ``space``: the candidate-search embedding. 'quat' searches raw 84-D
    quaternions (reference ``faiss_idx_torch``, ``prepare_traindata.py:86-93``);
    'joints' runs SMPL forward kinematics and searches posed joint positions
    (reference ``faiss_idx_np``'s 75-D ``joints[:, :25]`` index, ``:50-58``
    — 75-D here too on real SMPL meshes, 24 skeleton joints + the nose
    landmark; 72-D on synthetic test meshes with no landmark vertices),
    followed by the exact metric re-rank either way. Requires ``body_model``; uses the
    reference's 500-wide candidate set when ``k_candidates`` is 0.

    ``corpus_emb`` / ``corpus_np``: corpus-wide invariants a caller labeling
    many sequences against one corpus should compute ONCE and pass in
    (``label_split`` does); both are derived here when absent.

    ``precision``: matmul precision of the distance searches. 'auto'
    resolves to 'fast' or 'highest' via the measured corpus-safety probe
    (:func:`resolve_knn_precision` — the prepare-data CLI default);
    'highest' (this function's default) is exact — matches faiss fp32
    neighbor-for-neighbor on TPU;
    'default' uses single-pass bf16 MXU (~2x faster) with ~1e-3 distance
    noise that can swap near-tie neighbors; 'fast' (fused path only) runs
    the single-MXU-pass upper-bound prescreen + exact fp32 rerank
    (``ops/fused_knn.py::fused_geodesic_topk_fast``) — EXACT results for
    queries with near neighbors (measured on pose-like manifold corpora,
    4k rows / 100 queries / k=5: top-5 identity 100% at noise sigma
    <= 0.1, 99.4% at 0.25, ~0.75 recall with ~7e-3 label MAE = ~2.5% of
    the 0.27 label scale at sigma 0.5 — the far-query regime where label
    precision matters least), falling back to 'default'-precision XLA
    where the fused path doesn't apply.

    ``fused``: None (auto) takes the single-kernel Pallas search
    (``ops/fused_knn.py``, ~1.7x the XLA scan) whenever it applies —
    single-stage geodesic, k <= 8, single device, on a TPU backend. Under
    'highest' precision the kernel runs exact fp32 VPU dots; under
    'default' it runs single-pass bf16 MXU dots (``dot_impl='mxu_bf16'``,
    a further 1.6-1.8x) — the same approximation class as the
    default-precision XLA einsum. ``fused=True`` with ``mesh`` runs the kernel per-chip
    under the module-cached ``jit(shard_map)`` wrapper (queries sharded,
    corpus replicated, bit-identical results; indivisible tail batches use
    the XLA scan). On this relay-attached single chip it only TIES the
    scan (14.3k vs 14.1k qps — per-batch host I/O dominates; the wrapped
    kernel itself times IDENTICAL to raw inside one jit, 79.9 vs 80.5 ms),
    so auto mode keeps the scan whenever a mesh is given; on
    directly-attached multi-chip hardware the kernel path may win — it is
    exact either way. False forces the scan."""
    import jax.numpy as jnp

    from posendf_tpu.ops import (
        euclidean_rerank, euclidean_topk, geodesic_rerank, geodesic_topk,
        l2_topk)
    from posendf_tpu.quat import SMPL_JOINT_RANK

    queries = sample_noisy_queries(seq_quats, num_queries, spec, rng,
                                   per_pose_noise=per_pose_noise, runs=runs)
    corpus = jnp.asarray(corpus)
    N = corpus.shape[0]
    if corpus_np is None:
        corpus_np = np.asarray(corpus)

    if precision == "auto":
        # measured corpus-safety probe -> 'fast' or 'highest' (callers
        # labeling many sequences resolve ONCE via label_split instead)
        precision, _ = resolve_knn_precision(
            precision, corpus_np, k=k, weighted=weighted, metric=metric,
            k_candidates=k_candidates, space=space, fused=fused, mesh=mesh)

    if space == "joints" and corpus_emb is None:
        if body_model is None:
            raise ValueError("space='joints' requires a body_model")
        corpus_emb = jnp.asarray(_fk_joint_embedding(corpus_np, body_model))
    query_sharding = None
    if mesh is not None:
        # shard queries over the data axis; the corpus is replicated — each
        # chip scans it locally, no collectives (SURVEY.md §2.2)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        query_sharding = NamedSharding(mesh, P("data"))
        n_dev = mesh.devices.size
        query_batch = max(query_batch, n_dev) // n_dev * n_dev
    w = w_np = None
    if weighted:
        w = jnp.asarray(SMPL_JOINT_RANK) / jnp.linalg.norm(jnp.asarray(SMPL_JOINT_RANK))
        w_np = np.asarray(w)

    # precision='highest' -> exact fp32 VPU dots (the identity contract);
    # precision='default' -> single-pass bf16 MXU dots inside the same
    # kernel (dot_impl='mxu_bf16'): measured 1.6-1.8x the exact kernel
    # (61.0k vs 38.7k qps at 262k corpus, 21.2k vs 11.9k at 1M) with the
    # same ~1e-3 approximation class as the default-precision XLA einsum
    # (95% of top-5 sets identical on random corpora)
    fused_dot = {"highest": "vpu", "fast": "fast"}.get(precision, "mxu_bf16")
    # XLA calls (scan fallback, two-stage, euclidean) have no 'fast' engine.
    # 'fast' promises prescreen + EXACT rerank, so its only faithful XLA
    # fallback is exact 'highest' — mapping it to bf16 'default' would
    # silently trade the promised exactness for near-tie neighbor swaps
    # (hit by indivisible sharded tail batches and mesh+fused=None calls)
    xla_precision = "highest" if precision == "fast" else precision
    fused_eligible = (metric == "geo" and corpus_emb is None
                      and not k_candidates and k <= 8
                      and precision in ("highest", "default", "fast"))
    if fused is None:
        import jax

        # auto: single-device only. The sharded kernel path only TIES the
        # XLA scan on the relay-attached chip (see the docstring), so the
        # scan stays the sharded default; fused=True still forces the
        # (exact, tested) sharded kernel path.
        use_fused = (fused_eligible and mesh is None
                     and jax.default_backend() == "tpu")
    elif fused and not fused_eligible:
        raise ValueError(
            "fused=True requires the single-stage geodesic search "
            "(metric='geo', no candidates/embedding, k<=8, "
            "precision='highest', 'default' or 'fast')")
    else:
        use_fused = fused

    dists, idxs = [], []
    for start in range(0, len(queries), query_batch):
        q = jnp.asarray(queries[start:start + query_batch])
        if query_sharding is not None and len(q) % mesh.devices.size == 0:
            import jax

            q = jax.device_put(q, query_sharding)
        if corpus_emb is not None or k_candidates:
            # two-stage search: candidates in the requested embedding, then
            # the exact metric re-rank (reference default width: faiss k=500,
            # prepare_traindata.py:45)
            kc = min(k_candidates if k_candidates else 500, N)
            if corpus_emb is not None:
                q_emb = jnp.asarray(_fk_joint_embedding(np.asarray(q), body_model))
                _, cand = l2_topk(q_emb, corpus_emb, k=kc,
                                  precision=xla_precision)
            else:
                _, cand = l2_topk(q.reshape(len(q), -1), corpus.reshape(N, -1),
                                  k=kc, precision=xla_precision)
            rerank = euclidean_rerank if metric == "euc" else geodesic_rerank
            d, i = rerank(q, corpus, cand, k=k, weights=w)
        elif metric == "euc":
            # exact single-stage per-joint-L2 top-k (streamed, no candidates)
            d, i = euclidean_topk(q, corpus, k=k, weights=w,
                                  precision=xla_precision)
        elif use_fused:
            # geodesic search with the top-k merge fused into the distance
            # kernel (ops/fused_knn.py) — ~1.7x the XLA scan on v5e; under
            # 'highest' bit-identical neighbor sets (fp32 VPU math both
            # paths), under 'default' bf16 MXU dots (fused_dot above)
            from posendf_tpu.ops.fused_knn import fused_geodesic_topk

            if mesh is not None and len(q) % mesh.devices.size == 0:
                # per-chip kernel under the MODULE-CACHED jit(shard_map)
                # wrapper (_sharded_fused_search): queries sharded over
                # 'data', corpus replicated (passed as an ARGUMENT — a
                # closure would embed it as a jaxpr constant), indices
                # already global since every chip scans the whole corpus
                d, i = _sharded_fused_search(mesh, k, weighted,
                                             fused_dot)(q, corpus)
            elif mesh is not None:
                # indivisible tail batch: XLA scan (same exact math)
                d, i = geodesic_topk(q, corpus, k=k, weights=w,
                                     precision=xla_precision)
            elif fused_dot == "fast":
                from posendf_tpu.ops.fused_knn import fused_geodesic_topk_fast

                d, i = fused_geodesic_topk_fast(q, corpus, k, weights=w_np)
            else:
                d, i = fused_geodesic_topk(q, corpus, k, weights=w_np,
                                           dot_impl=fused_dot)
        else:
            # exact single-stage geodesic top-k (weighted or not)
            d, i = geodesic_topk(q, corpus, k=k, weights=w,
                                 precision=xla_precision)
        # keep results ON DEVICE until every batch is dispatched: a
        # per-batch np.asarray blocks on the relay round-trip and
        # serializes dispatch against compute (results are (Q, k) — tiny)
        dists.append(d)
        idxs.append(i)
    dist = np.concatenate([np.asarray(d) for d in dists])
    idx = np.concatenate([np.asarray(i) for i in idxs])
    nn_pose = corpus_np[idx]  # (Q, k, 21, 4)
    return {"pose": queries, "dist": dist, "nn_pose": nn_pose}


def label_split(
    sampled_dir: str,
    out_dir: str,
    subsets: Sequence[str],
    *,
    num_queries: int = 100,
    runs: int = 1000,
    k: int = 5,
    k_candidates: int = 0,
    metric: str = "geo",
    weighted: bool = False,
    space: str = "quat",
    body_model=None,
    seed: int = 0,
    skip_if_exists: bool = True,
    shard: Optional[Tuple[int, int]] = None,
    precision: str = "highest",
    per_pose_noise: bool = False,
    fused: Optional[bool] = None,
    spec: NoiseSpec = NoiseSpec(),
) -> List[str]:
    """Label every sequence of a split against the split-wide corpus.

    ``runs * num_queries`` queries per sequence (the reference's
    1000-run x num_samples loop, ``prepare_traindata.py:45,104``), one
    sharded device program per batch instead of one Slurm job per sequence.
    Idempotent per sequence (skip-if-exists restart guard).
    ``precision='auto'`` runs the corpus-safety probe ONCE against the
    split-wide corpus and uses the resolved engine for every sequence.
    """
    import jax.numpy as jnp

    corpus, files = build_corpus(sampled_dir, subsets)
    if shard is not None:
        i, n = shard
        files = files[i::n]
    precision, _ = resolve_knn_precision(
        precision, corpus, k=k, weighted=weighted, metric=metric,
        k_candidates=k_candidates, space=space, fused=fused,
        rng=np.random.default_rng([seed, 9999]))
    corpus_dev = jnp.asarray(corpus)
    # corpus-wide invariants, computed ONCE for the whole split (a full-corpus
    # SMPL forward + device->host copy per sequence would make labeling
    # O(S * N) instead of O(N + S * queries))
    corpus_emb = None
    if space == "joints":
        if body_model is None:
            raise ValueError("space='joints' requires a body_model")
        corpus_emb = jnp.asarray(_fk_joint_embedding(corpus, body_model))
    rng = np.random.default_rng(seed)
    written = []
    for f in files:
        subset = os.path.basename(os.path.dirname(f))
        os.makedirs(os.path.join(out_dir, subset), exist_ok=True)
        out_path = os.path.join(out_dir, subset, os.path.basename(f))
        if skip_if_exists and os.path.exists(out_path):
            written.append(out_path)
            continue
        with np.load(f) as z:
            key = "pose_body" if "pose_body" in z else "pose"
            arr = np.asarray(z[key])
        seq_quats = arr.astype(np.float32) if arr.ndim == 3 else _to_quats(arr[:, :63])
        labeled = label_sequence(
            seq_quats, corpus_dev,
            num_queries=num_queries * runs, k=k, k_candidates=k_candidates,
            metric=metric, weighted=weighted, rng=rng,
            space=space, body_model=body_model,
            corpus_emb=corpus_emb, corpus_np=corpus, precision=precision,
            per_pose_noise=per_pose_noise, runs=runs, fused=fused, spec=spec,
        )
        np.savez(out_path, **labeled)
        written.append(out_path)
    return written


def _maybe_body_model(bm_path, space):
    if space != "joints":
        return None
    if not bm_path:
        raise SystemExit(
            "--space joints requires --bm-path (a real SMPL model file); "
            "the synthetic test skeleton would silently corrupt the labels")
    from posendf_tpu.smpl import BodyModel

    return BodyModel(bm_path=bm_path)


def run_cli(args) -> None:
    subsets = AMASS_SPLITS.get(args.split, [args.split])
    sampled_dir = os.path.join(args.out_dir, "sampled")
    labeled_dir = os.path.join(args.out_dir, "labeled")
    if args.stage in ("sample", "all"):
        out = sample_amass(args.amass_raw, sampled_dir, subsets)
        print(f"stage 1: sampled {len(out)} sequences -> {sampled_dir}")
    if args.stage in ("label", "all"):
        src = sampled_dir if os.path.isdir(sampled_dir) else args.amass_raw
        out = label_split(
            src, labeled_dir, subsets,
            num_queries=args.num_samples, runs=args.runs,
            k=args.k, k_candidates=args.k_candidates,
            metric=getattr(args, "metric", "geo"),
            weighted=getattr(args, "weighted", False),
            space=getattr(args, "space", "quat"),
            body_model=_maybe_body_model(getattr(args, "bm_path", None),
                                         getattr(args, "space", "quat")),
            precision=getattr(args, "knn_precision", "highest"),
            per_pose_noise=getattr(args, "per_pose_noise", False),
            fused={"auto": None, "on": True, "off": False}[
                getattr(args, "fused_knn", "auto")],
            spec=NoiseSpec(
                structured_frac=getattr(args, "structured_frac", 0.0),
                structured_sigma=tuple(
                    getattr(args, "structured_sigma", (0.3, 1.0)))),
        )
        print(f"stage 3: labeled {len(out)} sequences -> {labeled_dir}")
