"""Partial-observation completion: fit a sequence under the field prior when
only part of the motion is reliable.

Capability parity with the reference ``experiments/partial_observation.py``:
identical structure to motion denoising but with its own gentler schedule
(temp 100 * L * (1+it), data 10 * L / (1+it), pose_pr 100 * L / (1+it),
``partial_observation.py:31-34``), iterations=10 x steps_per_iter=10, capped
at the first ``max_frames`` frames (reference caps at 120, ``:116,129``),
and no ground-truth metric.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from posendf_tpu.experiments.denoise import MotionDenoiser, _load_pose_file
from posendf_tpu.experiments.optim import AnnealSpec
from posendf_tpu.smpl import BodyModel

__all__ = ["PARTIAL_SPECS", "INPAINT_SPECS", "PartialCompleter",
           "observation_mask", "dof_mask", "complete_by_retrieval",
           "run_cli"]

PARTIAL_SPECS = {
    "pose_pr": AnnealSpec(scale=100.0, power=1, anneal=-1.0),
    "temp": AnnealSpec(scale=100.0, power=1, anneal=+1.0),
    "data": AnnealSpec(scale=10.0, power=1, anneal=-1.0, active_after=0),
}

# Jtr rows 24..44 are smplx's vertex-picked landmarks (lbs.py
# SMPL_VERTEX_LANDMARKS: 5 face, 6 feet, 10 finger tips); each is carried
# by one skeleton joint — head(15), feet(10/11), hands(22/23)
_LANDMARK_CARRIER = (15,) * 5 + (10,) * 3 + (11,) * 3 + (22,) * 5 + (23,) * 5


# Inpaint-mode schedule: with the observed dofs FROZEN (dof_mask) there is
# nothing for a data term to do — the masked-in (observed) Jtr rows depend
# only on frozen dofs on a real SMPL tree, so a data term would be a
# constant with zero gradient; it is OMITTED from the spec (the solver
# weights only the keys present). The solve is pure completion: the
# denoise prior form (self-weighted 1e7 L^2, the weighting measured best
# throughout ARCHITECTURE §7) pulls the unobserved limb onto the manifold
# consistent with the frozen body, and the temporal term keeps the
# completed limb's motion smooth across frames.
INPAINT_SPECS = {
    "pose_pr": AnnealSpec(scale=1e7, power=2, anneal=-1.0),
    "temp": AnnealSpec(scale=10.0, power=1, anneal=+1.0),
}


def dof_mask(occluded_joints, num_dofs: int = 69) -> np.ndarray:
    """(num_dofs,) float mask with 1.0 on the OCCLUDED body-pose joints'
    axis-angle dofs and 0.0 elsewhere — the ``param_mask`` of an inpaint
    solve (only unobserved dofs move; observed dofs stay bit-exact)."""
    m = np.zeros(num_dofs, np.float32)
    for j in occluded_joints:
        j = int(j)
        if not 0 <= 3 * j + 2 < num_dofs:
            raise ValueError(f"occluded joint {j} out of range for "
                             f"{num_dofs} dofs")
        m[3 * j: 3 * j + 3] = 1.0
    return m


def observation_mask(body_model: BodyModel, occluded_joints) -> np.ndarray:
    """Per-joint observation mask over ``body_model``'s Jtr rows for the
    data term of a partial-observation solve (``MotionDenoiser.optimize``'s
    ``data_joint_mask``).

    ``occluded_joints``: BODY-POSE joint indices 0..20/22 (SMPL body joint
    i = skeleton joint i+1). A skeleton joint is masked out (0.0) when it
    or any kinematic ancestor is occluded — an unobserved shoulder makes
    every downstream joint position unreliable even if the elbow angle
    itself were known — and a vertex landmark is masked with its carrier
    skeleton joint. Everything else is 1.0 (observed).

    The reference's partial task (``partial_observation.py``) anchors ALL
    joints to the (partially wrong) initialization — it has no notion of
    which joints are unobserved; this mask implements the task's intended
    capability. Default solves (mask=None) keep the reference behavior.
    """
    parents = body_model.model.parents
    K = len(parents)
    occ_sk = {int(j) + 1 for j in occluded_joints}
    if not all(1 <= j < K for j in occ_sk):
        raise ValueError(
            f"occluded_joints must be body-pose joint indices in "
            f"[0, {K - 2}], got {sorted(occluded_joints)}")
    masked = np.zeros(K, bool)
    for k in range(K):
        a = k
        while a != -1:
            if a in occ_sk:
                masked[k] = True
                break
            a = parents[a]
    mask = (~masked).astype(np.float32)
    # same static predicate as lbs.with_landmarks: real SMPL meshes (vertex
    # count covers the landmark ids) get 24 + 21 Jtr rows, synthetic test
    # meshes the bare skeleton — no LBS forward needed just to count rows
    from posendf_tpu.smpl.lbs import SMPL_VERTEX_LANDMARKS

    if body_model.model.v_template.shape[0] > int(SMPL_VERTEX_LANDMARKS.max()):
        mask = np.concatenate(
            [mask, mask[np.asarray(_LANDMARK_CARRIER, int)]])
    return mask


class PartialCompleter(MotionDenoiser):
    def __init__(self, module, params, body_model: BodyModel, specs=None):
        super().__init__(module, params, body_model,
                         specs=specs or PARTIAL_SPECS)

    def optimize(self, pose_body, gt_pose_body=None, iterations=10,
                 steps_per_iter=10, occluded_joints=None, mode="anchor",
                 **kw):
        """``occluded_joints``: body-pose joint indices known to be
        unobserved. With ``mode="anchor"`` the data term anchors only the
        OBSERVED joints (observation_mask) and every dof still moves —
        the reference solve made occlusion-aware. ``mode="inpaint"``
        additionally FREEZES the observed dofs (dof_mask) so the solve
        completes only the unobserved limb — build the completer with
        ``specs=INPAINT_SPECS`` for the measured completion schedule
        (scripts/partial_quality.py). ``occluded_joints=None`` keeps the
        reference's anchor-everything behavior exactly
        (``partial_observation.py`` has no notion of which joints are
        missing). gt is optional and metric-only (the reference task has
        no ground truth; the closed loop passes it to score the
        completion)."""
        if mode not in ("anchor", "inpaint"):
            raise ValueError(f"mode must be 'anchor' or 'inpaint', "
                             f"got {mode!r}")
        if isinstance(gt_pose_body, int):
            # the pre-r5 signature had iterations as the 2nd positional
            # parameter; fail with a migration hint instead of a confusing
            # len() TypeError deep inside the base optimize
            raise TypeError(
                f"got int {gt_pose_body} for gt_pose_body — since r5 the "
                "2nd parameter is the optional ground-truth sequence; pass "
                "iterations/steps_per_iter as keywords")
        if occluded_joints is not None:
            kw.setdefault("data_joint_mask",
                          observation_mask(self.body_model, occluded_joints))
            if mode == "inpaint":
                kw.setdefault("param_mask", dof_mask(occluded_joints))
        elif mode == "inpaint":
            raise ValueError("mode='inpaint' requires occluded_joints")
        return super().optimize(pose_body, gt_pose_body, iterations,
                                steps_per_iter, **kw)


def _aligned_quat_mean(q: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Sign-align ``q`` (..., M, J, 4) to ``ref`` (..., 1, J, 4) (q = -q on
    S^3), mean over axis -3, renormalize."""
    sgn = np.sign(np.sum(q * ref, axis=-1, keepdims=True))
    sgn = np.where(sgn == 0, 1.0, sgn)
    m = (q * sgn).mean(axis=-3)
    return m / np.maximum(np.linalg.norm(m, axis=-1, keepdims=True), 1e-12)


def complete_by_retrieval(
    corpus,                    # (N, 21, 4) manifold poses
    quats,                     # (T, 21, 4) observed sequence (quaternions)
    occluded_joints,
    *,
    k: int = 5,
    temporal_window: int = 5,
    precision: str = "highest",
) -> np.ndarray:
    """Retrieval-based limb completion: for each frame, find the ``k``
    manifold poses nearest in the VISIBLE joints only (the per-joint
    weighted geodesic search, ``ops/knn.geodesic_topk`` with the occluded
    joints' weights zeroed), splice their sign-aligned mean into the
    occluded joints, then smooth the spliced joints with a
    ``temporal_window``-frame quaternion moving average. Observed joints
    are returned bit-exact.

    Why this exists: the trained field is measurably BLIND to structured
    (per-limb) corruptions — its training noise perturbs all joints at
    once (``create_data.py:88``), so a few-joint large-error pose reads
    d near the clean floor while its true corpus distance is ~10x larger
    (measured: docs/quality/partial_closed_loop.json's detectability
    probe), and prior-driven inpainting drifts anywhere in the field's
    wide zero region. Matching on the visible joints directly against the
    manifold corpus sidesteps the field entirely and measures ~5x
    occluded-joint error reduction where the prior inpaint fails. The
    reference's partial task (``partial_observation.py``) has no
    completion mechanism at all — it re-runs the denoise solve with
    different weights.
    """
    import jax.numpy as jnp

    from posendf_tpu.ops.knn import geodesic_topk

    if temporal_window > 1 and temporal_window % 2 == 0:
        raise ValueError(
            f"temporal_window={temporal_window} must be odd (the smoothing "
            "window is centered on each frame); an even value would "
            "silently average one frame more than requested")
    corpus_np = np.asarray(corpus)
    q_np = np.asarray(quats, np.float32)
    occ = np.asarray(sorted({int(j) for j in occluded_joints}), int)
    J = q_np.shape[-2]
    if not (0 < len(occ) < J) or occ.min() < 0 or occ.max() >= J:
        raise ValueError(
            f"occluded_joints must be a proper nonempty subset of "
            f"range({J}), got {occ.tolist()}")
    w = np.ones(J, np.float32)
    w[occ] = 0.0
    w /= np.linalg.norm(w)
    _, idx = geodesic_topk(jnp.asarray(q_np), jnp.asarray(corpus_np),
                           k=k, weights=jnp.asarray(w),
                           precision=precision)
    nn = corpus_np[np.asarray(idx)]                  # (T, k, 21, 4)
    mean_q = _aligned_quat_mean(nn, nn[:, :1])       # (T, 21, 4)
    out = q_np.copy()
    out[:, occ] = mean_q[:, occ]
    if temporal_window > 1 and len(out) > 1:
        T = len(out)
        win = [np.clip(np.arange(T) + o, 0, T - 1)
               for o in range(-(temporal_window // 2),
                              temporal_window // 2 + 1)]
        stack = np.stack([out[s][:, occ] for s in win], axis=1)
        sm = _aligned_quat_mean(stack, out[:, None, occ])
        out[:, occ] = sm
    return out


def run_cli(args) -> None:
    from posendf_tpu.cli import _load, _load_params

    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    bm = BodyModel(bm_path=args.bm_path) if args.bm_path else BodyModel()
    pose = _load_pose_file(args.motion_data)[: args.max_frames]
    occluded = getattr(args, "occluded_joints", None)
    mode = getattr(args, "mode", "anchor")
    metrics = {}
    if mode == "retrieval":
        from posendf_tpu.quat import (axis_angle_to_quaternion,
                                      quaternion_to_axis_angle)

        if not getattr(args, "corpus", None) or not occluded:
            raise SystemExit("--mode retrieval requires --corpus and "
                             "--occluded-joints")
        with np.load(args.corpus) as z:
            corpus = np.asarray(z["pose"], np.float32).reshape(-1, 21, 4)
        T = len(pose)
        quats = axis_angle_to_quaternion(
            jnp.asarray(pose[:, :63]).reshape(T, 21, 3))
        done = complete_by_retrieval(
            corpus, np.asarray(quats), occluded,
            k=args.retrieval_k, temporal_window=args.temporal_window)
        out63 = np.asarray(quaternion_to_axis_angle(
            jnp.asarray(done))).reshape(T, 63)
        final_pose = jnp.asarray(np.concatenate(
            [out63, pose[:, 63:]], axis=1))
    else:
        specs = INPAINT_SPECS if mode == "inpaint" else None
        completer = PartialCompleter(module, params, bm, specs=specs)
        final_pose, metrics = completer.optimize(
            jnp.asarray(pose), occluded_joints=occluded, mode=mode)
    for k, v in metrics.items():
        print(f"{k}: {v:0.8f}")
    if args.out:
        np.savez(args.out, pose_body=np.asarray(final_pose))
        print(f"wrote {args.out}")
    if getattr(args, "save_mesh", False) or getattr(args, "render", False):
        # before/after meshes like the reference (partial_observation.py
        # renders via the shared exp_utils.py:30-63 path)
        from posendf_tpu.experiments.render import export_pose_meshes

        out_dir = args.mesh_dir or "./partial_out"
        export_pose_meshes(out_dir, bm,
                           [("init", jnp.asarray(pose)), ("out", final_pose)],
                           save_mesh=args.save_mesh, render=args.render)
        print(f"wrote meshes/renders -> {out_dir}")
