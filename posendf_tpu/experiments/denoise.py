"""Motion denoising: optimize a noisy SMPL pose sequence under the field prior.

Capability parity with the reference ``MotionDenoise``
(``experiments/motion_denoise.py:20-121``):

  * optimize body_pose (B frames x 69) with Adam(0.02), 10 iterations x 50
    steps;
  * losses: ``pose_pr`` (mean field distance of the 21-joint quaternions),
    ``temp`` (mean adjacent-frame vertex displacement — the sequence-axis
    coupling), ``data`` (mean joint distance to the initial noisy joints,
    active after iteration 0);
  * annealed self-weighted schedule (``motion_denoise.py:31-34``):
    temp 10 * L * (1+it), data 100 * L / (1+it), pose_pr 1e7 * L^2 / (1+it);
  * metric: v2v error vs ground truth in cm (``:114-120``).

TPU-native: the full 500-step solve is ONE jitted lax.scan (see optim.py).
Long sequences shard frames over the ``data`` mesh axis; the temporal term's
1-frame halo is handled by XLA's SPMD partitioner under jit (see
``parallel/halo.py`` for the explicit shard_map formulation and its
equivalence test).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu.experiments.optim import AnnealSpec, make_annealed_solver
from posendf_tpu.quat import axis_angle_to_quaternion
from posendf_tpu.smpl import BodyModel
from posendf_tpu.smpl.lbs import lbs_forward, with_landmarks

__all__ = ["MotionDenoiser", "DENOISE_SPECS", "BALANCED_SPECS",
           "ADAPTIVE_SPECS", "estimate_clip_noise",
           "estimate_clip_noise_many", "adaptive_runtime",
           "v2v_cm", "run_cli"]


DENOISE_SPECS = {
    "pose_pr": AnnealSpec(scale=1e7, power=2, anneal=-1.0),
    "temp": AnnealSpec(scale=10.0, power=1, anneal=+1.0),
    "data": AnnealSpec(scale=100.0, power=1, anneal=-1.0, active_after=0),
}

# A gentler alternative for inputs whose noise sits near or below the
# field's resolution: 1000x weaker prior peak, 10x weaker temporal term,
# data term active from iteration 0. Measured on the synthetic L=8 family
# (docs/ARCHITECTURE.md §7, docs/quality/run_l8_balanced_solve.json): the
# prior's v2v gain turns positive at all four benchmark sigmas and the
# reference schedule's low-sigma over-smoothing halves; the reference
# schedule keeps the larger win when noise dominates (sigma 0.5). Selected
# via `cli denoise --specs balanced`; the default stays reference-exact.
BALANCED_SPECS = {
    "pose_pr": AnnealSpec(scale=1e4, power=2, anneal=-1.0),
    "temp": AnnealSpec(scale=1.0, power=1, anneal=+1.0),
    "data": AnnealSpec(scale=100.0, power=1, anneal=-1.0),
}

# Field-adaptive schedule (``--specs adaptive``): the STATIC fields below
# are the s=1 endpoint (= reference-exact); per clip, runtime overrides
# interpolate scale/anneal/gating toward a strongly input-anchored s=0
# endpoint as a function of the field's own noise estimate (see
# ``estimate_clip_noise`` / ``adaptive_runtime``). Fixes the measured
# low-sigma regression: the fixed reference schedule quadruples the error
# of near-clean clips (docs/quality/seed_robustness_*.json, sigma 0.01:
# v2v 0.72 -> 5.8 cm reference / 2.9 cm balanced) because its annealed
# data weight decays 10x and its temporal weight grows 10x regardless of
# how noisy the input actually is.
ADAPTIVE_SPECS = {
    "pose_pr": AnnealSpec(scale=1e7, power=2, anneal=-1.0),
    "temp": AnnealSpec(scale=10.0, power=1, anneal=+1.0),
    "data": AnnealSpec(scale=100.0, power=1, anneal=-1.0, active_after=0),
}


def adaptive_runtime(s: float, prior_gain: float = 1.0) -> dict:
    """Map a clip-level noise estimate ``s in [0, 1]`` to the runtime
    schedule overrides (``aux['anneal_runtime']`` for the adaptive solver).

    s = 1 reproduces the reference schedule EXACTLY
    (``motion_denoise.py:31-34``); s = 0 is the near-clean endpoint —
    1000x weaker prior peak, 100x weaker temporal weight, and a data
    anchor that stays at full strength for the whole solve instead of
    decaying 10x (log-space interpolation in between):

      pose_pr scale: 10^(4 + 3s)   (1e4 .. 1e7)
      temp    scale: 10^(2s - 1)   (0.1 .. 10)
      data   anneal: -s            (constant .. 1/(1+it) decay)
      data     gate: active when it > s - 1  (always .. after iter 0)

    The weight map alone cannot bound a near-clean clip's drift: Adam is
    invariant to global loss scale, so its late-step oscillation floor is
    set by the LEARNING RATE, not the weights — the companion
    ``aux['lr_runtime'] = 10^(2(s-1))`` (0.01x .. 1x, set by
    MotionDenoiser) shrinks the step size in lockstep with the estimated
    noise (measured: at the 10^(s-1) half-slope a sigma-0.01 clip still
    drifted 1.1 cm off its 0.7 cm input).

    Values are returned as jnp scalars so they are traced ARGUMENTS of the
    jitted solve — one compile serves every clip's schedule.
    """
    s = float(np.clip(s, 0.0, 1.0))
    return {
        "pose_pr": {"scale": jnp.float32(prior_gain * 10.0 ** (4.0 + 3.0 * s))},
        "temp": {"scale": jnp.float32(10.0 ** (2.0 * s - 1.0))},
        "data": {"anneal": jnp.float32(-s),
                 "active_after": jnp.float32(s - 1.0)},
    }


@functools.lru_cache(maxsize=8)
def _noise_stat_fn_many(module, sigma_ref: float, floor_steps: int):
    """Vmapped (over a clip axis) variant of ``_noise_stat_fn`` — the
    batched solve estimates every clip's field statistics in ONE dispatch
    (a serial per-clip loop would pay a host round-trip per clip, undoing
    the point of ``optimize_many``)."""
    return jax.jit(jax.vmap(_noise_stat_fn(module, sigma_ref, floor_steps),
                            in_axes=(None, 0, 0)))


@functools.lru_cache(maxsize=8)
def _noise_stat_fn(module, sigma_ref: float, floor_steps: int):
    """Cached jitted (d_input, d_floor, d_probe) stats for
    ``estimate_clip_noise``. Module-level cache keyed on the hashable
    linen module: a per-call ``@jax.jit`` closure would retrace (and over
    the remote-compile relay, RECOMPILE — ~minutes for the projection
    scan) on every clip of a benchmark sweep."""
    from posendf_tpu.projection import project

    @jax.jit
    def stats(params, quats, key):
        d_input = jnp.mean(module.apply({"params": params}, quats))
        proj, _ = project(module, params, quats, steps=floor_steps)
        d_floor = jnp.mean(module.apply({"params": params}, proj))
        noise = sigma_ref * jax.random.uniform(key, quats.shape)
        probe = quats + noise
        probe = probe / jnp.linalg.norm(probe, axis=-1, keepdims=True)
        d_probe = jnp.mean(module.apply({"params": params}, probe))
        return d_input, d_floor, d_probe

    return stats


def estimate_clip_noise(module, params, quats: jax.Array,
                        key: "jax.Array" = None, *,
                        sigma_ref: float = 0.1,
                        sigma_ref_temporal: float = 0.2,
                        floor_steps: int = 10) -> dict:
    """Estimate a clip's noise level (no ground truth): two independent
    sensors, combined as ``s = max(s_field, s_temporal)``.

    **Field sensor** — three cheap field statistics (two forwards + a
    ``floor_steps``-step projection, microseconds next to the 500-step
    solve):

      d_input = mean field distance of the input poses;
      d_floor = mean distance after projecting the clip onto the manifold
                (the field's OWN attainable floor in this region — absorbs
                any constant bias of the learned field);
      d_probe = mean distance of the input re-noised at a reference level
                (``sigma_ref`` uniform quaternion noise, the training
                sampler's family, ``create_data.py:88``);

    ``s_field = clip((d_input - d_floor) / (d_probe - d_floor), 0, 1)``.
    Catches smooth-but-off-manifold drift, but COMPRESSES above the
    field's resolution (measured on the trained L=8 field: d rises only
    0.0064 -> 0.0125 from clean to sigma 0.5, so s_field reads 0.06-0.09
    at every benchmark sigma). A degenerate field (zero span) yields 0.

    **Temporal sensor** — mocap noise is white per frame while motion is
    smooth, so the classical two-lag estimator separates them with no
    model at all: for per-dof axis-angle differences
    ``d1 = E[(x[t+1]-x[t])^2]`` and ``d2 = E[(x[t+2]-x[t])^2]``, locally
    linear motion gives ``d1 = v^2 + 2n^2`` and ``d2 = 4v^2 + 2n^2``, so
    ``n^2 = (4*d1 - d2)/6`` — exact for any motion speed.
    ``s_temporal = n / sigma_ref_temporal``, clipped. The 0.2 scale is
    measured, not guessed: on the trained L=8 grid a sigma-0.1 clip maps
    to s=0.5 — the middle of the balanced<->reference interpolation,
    where the solve measures best (reference-strength weights there cost
    +1.5 cm) — while sigma-0.5 still saturates to s=1 (the reference
    schedule's win regime). Needs >= 3 frames (falls back to the field
    sensor alone otherwise); frames must be in order (the clip
    contract).

    Returns ``{"s", "s_field", "s_temporal", "d_input", "d_floor",
    "d_probe"}``.
    """
    from posendf_tpu.quat import quaternion_to_axis_angle

    if key is None:
        key = jax.random.key(0)
    quats = quats.reshape(-1, quats.shape[-2], 4)
    stats = _noise_stat_fn(module, float(sigma_ref), int(floor_steps))
    d_input, d_floor, d_probe = (float(x) for x in stats(params, quats, key))
    span = d_probe - d_floor
    s_field = (d_input - d_floor) / span if span > 1e-12 else 0.0
    s_field = float(np.clip(s_field, 0.0, 1.0))

    s_temporal = 0.0
    if quats.shape[0] >= 3:
        aa = np.asarray(quaternion_to_axis_angle(quats)).reshape(
            quats.shape[0], -1)
        d1 = float(np.mean((aa[1:] - aa[:-1]) ** 2))
        d2 = float(np.mean((aa[2:] - aa[:-2]) ** 2))
        n2 = max((4.0 * d1 - d2) / 6.0, 0.0)
        s_temporal = float(np.clip(np.sqrt(n2) / sigma_ref_temporal,
                                   0.0, 1.0))

    return {"s": max(s_field, s_temporal), "s_field": s_field,
            "s_temporal": s_temporal, "d_input": d_input,
            "d_floor": d_floor, "d_probe": d_probe}


def estimate_clip_noise_many(module, params, quats: jax.Array,
                             key: "jax.Array" = None, *,
                             sigma_ref: float = 0.1,
                             sigma_ref_temporal: float = 0.2,
                             floor_steps: int = 10) -> list:
    """Batched :func:`estimate_clip_noise` over a clip stack
    ``(C, T, J, 4)`` — ONE vmapped device dispatch for all clips' field
    statistics (the three numbers each cost two forwards + a short
    projection), temporal sensor on host per clip. Returns a list of C
    per-clip dicts identical to the serial estimator's."""
    from posendf_tpu.quat import quaternion_to_axis_angle

    if key is None:
        key = jax.random.key(0)
    C, T = quats.shape[:2]
    # the SAME probe key for every clip — matches the serial estimator's
    # default draw exactly (the probe is a fixed reference-noise draw;
    # sharing it across clips is what a serial sweep did all along)
    keys = jnp.broadcast_to(key, (C,) + jnp.shape(key))
    stats = _noise_stat_fn_many(module, float(sigma_ref), int(floor_steps))
    d_input, d_floor, d_probe = (np.asarray(x)
                                 for x in stats(params, quats, keys))
    aa_all = np.asarray(quaternion_to_axis_angle(quats)).reshape(C, T, -1)

    out = []
    for c in range(C):
        span = float(d_probe[c] - d_floor[c])
        s_field = ((float(d_input[c]) - float(d_floor[c])) / span
                   if span > 1e-12 else 0.0)
        s_field = float(np.clip(s_field, 0.0, 1.0))
        s_temporal = 0.0
        if T >= 3:
            aa = aa_all[c]
            d1 = float(np.mean((aa[1:] - aa[:-1]) ** 2))
            d2 = float(np.mean((aa[2:] - aa[:-2]) ** 2))
            n2 = max((4.0 * d1 - d2) / 6.0, 0.0)
            s_temporal = float(np.clip(np.sqrt(n2) / sigma_ref_temporal,
                                       0.0, 1.0))
        out.append({"s": max(s_field, s_temporal), "s_field": s_field,
                    "s_temporal": s_temporal,
                    "d_input": float(d_input[c]),
                    "d_floor": float(d_floor[c]),
                    "d_probe": float(d_probe[c])})
    return out


def v2v_cm(verts_a: jax.Array, verts_b: jax.Array, axis=None):
    """Mean per-vertex distance in centimeters (reference metric,
    ``motion_denoise.py:119``). ``axis=None`` (default) reduces over
    everything and returns a float; an axis tuple (e.g. ``(1, 2)`` for a
    (C, T, V, 3) clip stack) returns a per-clip ndarray — ONE formula for
    the serial and batched paths."""
    d = jnp.sqrt(jnp.sum((verts_a - verts_b) ** 2, axis=-1))
    if axis is None:
        return float(jnp.mean(d) * 100.0)
    return np.asarray(jnp.mean(d, axis=axis) * 100.0)


class MotionDenoiser:
    def __init__(self, module, params, body_model: BodyModel, specs=None,
                 prior_gain: float = 1.0):
        """``specs``: a spec dict (default: the reference-exact
        ``DENOISE_SPECS``), or the string ``"adaptive"`` for the
        field-adaptive schedule — per clip, ``estimate_clip_noise`` reads
        the noise level off the field and ``adaptive_runtime`` interpolates
        the anneal weights between the input-anchored (s=0) and
        reference-exact (s=1) endpoints. ``prior_gain`` multiplies the
        ADAPTIVE prior weight only (0.0 = the ablation's prior-off solve
        with an otherwise identical adaptive schedule)."""
        self.module = module
        self.params = params
        self.body_model = body_model
        self.adaptive = specs == "adaptive"
        if isinstance(specs, str):
            # named schedules, matching the CLI flag values — an unknown
            # string must fail HERE, not as a TypeError iterating the
            # string's characters inside the first optimize()
            named = {"adaptive": dict(ADAPTIVE_SPECS),
                     "balanced": dict(BALANCED_SPECS),
                     "reference": dict(DENOISE_SPECS)}
            if specs not in named:
                raise ValueError(
                    f"unknown specs name {specs!r}; expected one of "
                    f"{sorted(named)} or a spec dict")
            self.specs = named[specs]
        else:
            self.specs = specs or DENOISE_SPECS
        self.prior_gain = prior_gain
        # jitted solvers cached by (iterations, steps_per_iter): sequence
        # data flows through the aux pytree, so a benchmark sweep over many
        # clips of one shape compiles the solve exactly once (adaptive
        # schedules flow through aux as runtime scalars — still one compile)
        self._solvers = {}

    def _solver(self, iterations: int, steps_per_iter: int):
        key = (iterations, steps_per_iter)
        if key not in self._solvers:
            module = self.module

            def loss_terms(pose_body, aux):
                B = pose_body.shape[0]
                quat = axis_angle_to_quaternion(pose_body.reshape(B, 23, 3)[:, :21])
                dist = module.apply({"params": aux["params"]}, quat)
                verts, joints = lbs_forward(
                    aux["smpl"], aux["betas"],
                    jnp.zeros((B, 3), pose_body.dtype), pose_body)
                # full smplx Jtr (45 joints on real meshes) — matches the
                # init_joints captured from BodyModel and the reference data
                # term (motion_denoise.py:93 uses the complete Jtr)
                joints = with_landmarks(verts, joints)
                if B > 1:
                    temp = jnp.mean(jnp.sqrt(jnp.sum(
                        (verts[:-1] - verts[1:]) ** 2, axis=-1) + 1e-12))
                else:
                    # a single frame has no temporal stencil; jnp.mean over
                    # the empty (0, V) delta would be NaN and poison the solve
                    temp = jnp.zeros((), pose_body.dtype)
                diff = jnp.sqrt(jnp.sum(
                    (joints - aux["init_joints"]) ** 2, axis=-1) + 1e-12)
                if "data_joint_mask" in aux:
                    # partial observation: anchor only the OBSERVED joints
                    # (mask over Jtr rows; see partial.observation_mask) —
                    # unobserved parts are then governed by the prior and
                    # the temporal term alone
                    m = aux["data_joint_mask"]
                    data = (jnp.sum(diff * m[None, :])
                            / (diff.shape[0] * jnp.maximum(jnp.sum(m), 1e-9)))
                else:
                    data = jnp.mean(diff)
                return {"pose_pr": jnp.mean(dist), "temp": temp, "data": data}

            self._solvers[key] = make_annealed_solver(
                loss_terms, self.specs,
                iterations=iterations, steps_per_iter=steps_per_iter, lr=0.02)
        return self._solvers[key]

    def optimize(
        self,
        noisy_pose_body: jax.Array,   # (B, 69) or (B, 63) axis-angle
        gt_pose_body: Optional[jax.Array] = None,
        iterations: int = 10,
        steps_per_iter: int = 50,
        betas: Optional[jax.Array] = None,
        mesh=None,
        mesh_axis: str = "data",
        data_joint_mask: Optional[jax.Array] = None,
        param_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, float]]:
        """Returns (denoised pose_body (B, 69), metrics).

        ``data_joint_mask``: optional per-joint float mask over the body
        model's Jtr rows; the data term anchors only the masked-in
        (observed) joints. Build with
        :func:`posendf_tpu.experiments.partial.observation_mask`.

        ``param_mask``: optional float mask broadcastable to the (B, 69)
        pose — zeroed dofs are FROZEN at their initial values (the
        partial-observation inpaint mode optimizes only the unobserved
        joints' dofs; :func:`posendf_tpu.experiments.partial.dof_mask`).

        ``mesh``: shard the frame axis over the given mesh axis — the jitted
        solve then runs SPMD, with the temporal term's 1-frame halo handled
        by XLA's partitioner (see parallel/halo.py for the explicit idiom).
        The reference caps clips at one GPU (120 frames,
        ``partial_observation.py:116``); sharding removes that cap.
        """
        if gt_pose_body is not None and len(gt_pose_body) != len(noisy_pose_body):
            raise ValueError(
                f"gt sequence has {len(gt_pose_body)} frames but the noisy input "
                f"has {len(noisy_pose_body)}; align them before optimizing")
        init_out = self.body_model(pose_body=noisy_pose_body, betas=betas)
        pose0 = init_out.body_pose
        B = pose0.shape[0]
        betas_arr = init_out.betas
        init_joints = jax.lax.stop_gradient(init_out.Jtr)
        init_verts = jax.lax.stop_gradient(init_out.vertices)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            frame_sharding = NamedSharding(mesh, P(mesh_axis))
            pose0 = jax.device_put(pose0, frame_sharding)
            betas_arr = jax.device_put(betas_arr, frame_sharding)
            init_joints = jax.device_put(init_joints, frame_sharding)

        aux = {
            "params": self.params,
            "smpl": self.body_model.model,
            "betas": betas_arr,
            "init_joints": init_joints,
        }
        if data_joint_mask is not None:
            mask = jnp.asarray(data_joint_mask, jnp.float32)
            if mask.shape != init_joints.shape[1:2]:
                raise ValueError(
                    f"data_joint_mask has shape {mask.shape}; expected "
                    f"({init_joints.shape[1]},) to match this body model's "
                    "Jtr rows")
            aux["data_joint_mask"] = mask
        if param_mask is not None:
            mask = jnp.asarray(param_mask, jnp.float32)
            try:
                aux["param_mask"] = jnp.broadcast_to(mask, pose0.shape)
            except (ValueError, TypeError):
                raise ValueError(
                    f"param_mask has shape {mask.shape}; expected a shape "
                    f"broadcastable to the optimized pose {pose0.shape} "
                    f"(e.g. ({pose0.shape[-1]},))") from None
        noise_est = None
        if self.adaptive:
            # the field as the noise sensor: one clip-level estimate picks
            # this solve's schedule (the fixed reference schedule measurably
            # QUADRUPLES the error of near-clean inputs — ADAPTIVE_SPECS)
            B0 = noisy_pose_body.shape[0]
            in_quats = axis_angle_to_quaternion(
                jnp.asarray(noisy_pose_body)[:, :63].reshape(B0, 21, 3))
            noise_est = estimate_clip_noise(self.module, self.params, in_quats)
            aux["anneal_runtime"] = adaptive_runtime(noise_est["s"],
                                                     self.prior_gain)
            # step-size scale 10^(2(s-1)): see adaptive_runtime's docstring
            # (a quadratic exponent 10^(-2(1-s)^2) was probed and REJECTED:
            # the extra mid-range movement it allows over-smooths rather
            # than denoises — same-clips v2v worse at every sigma)
            aux["lr_runtime"] = jnp.float32(
                10.0 ** (2.0 * (float(np.clip(noise_est["s"], 0.0, 1.0))
                                - 1.0)))
        solve = self._solver(iterations, steps_per_iter)
        final_pose, history = solve(pose0, aux)

        out = self.body_model(pose_body=final_pose, betas=betas)
        metrics = {
            "v2v_vs_input_cm": v2v_cm(out.vertices, init_verts),
            "final_pose_pr": float(history["pose_pr"][-1]),
            "final_temp": float(history["temp"][-1]),
        }
        if noise_est is not None:
            metrics["noise_level_s"] = noise_est["s"]
            metrics["noise_d_input"] = noise_est["d_input"]
            metrics["noise_d_floor"] = noise_est["d_floor"]
            metrics["noise_d_probe"] = noise_est["d_probe"]
        if gt_pose_body is not None:
            gt_out = self.body_model(pose_body=gt_pose_body, betas=betas)
            metrics["v2v_cm"] = v2v_cm(out.vertices, gt_out.vertices)
            # the number denoising must beat: the raw input's error
            metrics["v2v_input_cm"] = v2v_cm(init_verts, gt_out.vertices)
        return final_pose, metrics

    def _solver_many(self, iterations: int, steps_per_iter: int,
                     axes_key: tuple):
        """jit(vmap(solve)) over a leading clip axis — ONE dispatch solves a
        whole stack of same-length clips. Cached per (schedule shape, aux
        structure): a benchmark sweep pays one compile per clip length, then
        every level/sigma batch is a single device program (each serial
        solve costs a dispatch round-trip — ~30 ms on a relay-attached
        chip, comparable to the 60-frame solve itself)."""
        key = ("many", iterations, steps_per_iter, axes_key)
        if key not in self._solvers:
            solve = self._solver(iterations, steps_per_iter)
            in_axes_aux = {"params": None, "smpl": None,
                           "betas": 0, "init_joints": 0}
            for name, ax in axes_key:
                in_axes_aux[name] = ax
            self._solvers[key] = jax.jit(
                jax.vmap(solve, in_axes=(0, in_axes_aux)))
        return self._solvers[key]

    def optimize_many(
        self,
        noisy_pose_body: jax.Array,   # (C, T, 69|63) axis-angle clip stack
        gt_pose_body: Optional[jax.Array] = None,
        iterations: int = 10,
        steps_per_iter: int = 50,
        betas: Optional[jax.Array] = None,
        data_joint_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, np.ndarray]]:
        """Batched :meth:`optimize` over ``C`` same-length clips in ONE
        jitted vmapped solve — per-clip math identical to the serial path
        (clips are independent; the solver is vmapped over the clip axis,
        field params and body model held shared), metrics returned as
        (C,)-arrays. The adaptive schedule stays PER CLIP: each clip's
        noise estimate flows in as a vmapped runtime scalar.

        ``betas``: None or one shared (num_betas,) vector.
        """
        noisy = jnp.asarray(noisy_pose_body)
        if noisy.ndim != 3:
            raise ValueError(
                f"optimize_many expects (clips, frames, dofs), got "
                f"{noisy.shape}")
        C, T = noisy.shape[:2]
        if gt_pose_body is not None:
            gt = jnp.asarray(gt_pose_body)
            if gt.shape[:2] != (C, T):
                raise ValueError(
                    f"gt stack {gt.shape[:2]} does not match the noisy "
                    f"stack {(C, T)}")
        if betas is not None:
            # one shared betas vector, pre-broadcast to the flattened
            # (C*T) frame batch (BodyModel returns betas AS PASSED, so a
            # bare (num_betas,) vector would not reshape to (C, T, -1))
            b = jnp.asarray(betas)
            if b.ndim == 1:
                b = b[None]
            if b.shape[0] == 1:
                betas = jnp.broadcast_to(b, (C * T, b.shape[1]))
            elif b.shape[0] != C * T:
                raise ValueError(
                    f"betas must be None, (num_betas,), or per-frame "
                    f"({C * T}, num_betas); got {b.shape}")
        init_out = self.body_model(pose_body=noisy.reshape(C * T, -1),
                                   betas=betas)
        pose0 = init_out.body_pose.reshape(C, T, 69)
        betas_arr = init_out.betas.reshape(C, T, -1)
        init_joints = jax.lax.stop_gradient(init_out.Jtr).reshape(
            C, T, *init_out.Jtr.shape[1:])
        init_verts = jax.lax.stop_gradient(init_out.vertices).reshape(
            C, T, *init_out.vertices.shape[1:])

        aux = {
            "params": self.params,
            "smpl": self.body_model.model,
            "betas": betas_arr,
            "init_joints": init_joints,
        }
        axes = []
        if data_joint_mask is not None:
            mask = jnp.asarray(data_joint_mask, jnp.float32)
            if mask.shape != init_joints.shape[2:3]:
                raise ValueError(
                    f"data_joint_mask has shape {mask.shape}; expected "
                    f"({init_joints.shape[2]},)")
            aux["data_joint_mask"] = mask
            axes.append(("data_joint_mask", None))
        noise_s = None
        if self.adaptive:
            # all clips' field statistics in ONE vmapped dispatch (a
            # serial estimator loop would pay a host round-trip per clip,
            # halving the batched solve's win on a relay-attached chip)
            in_quats = axis_angle_to_quaternion(
                noisy[:, :, :63].reshape(C, T, 21, 3))
            ests = estimate_clip_noise_many(self.module, self.params,
                                            in_quats)
            runtimes = [adaptive_runtime(e["s"], self.prior_gain)
                        for e in ests]
            aux["anneal_runtime"] = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack(leaves), *runtimes)
            aux["lr_runtime"] = jnp.asarray(
                [10.0 ** (2.0 * (float(np.clip(e["s"], 0.0, 1.0)) - 1.0))
                 for e in ests], jnp.float32)
            axes += [("anneal_runtime", 0), ("lr_runtime", 0)]
            noise_s = np.asarray([e["s"] for e in ests])

        solve = self._solver_many(iterations, steps_per_iter, tuple(axes))
        final_pose, history = solve(pose0, aux)   # (C, T, 69), {k: (C, S)}

        out = self.body_model(pose_body=final_pose.reshape(C * T, 69),
                              betas=betas)
        out_verts = out.vertices.reshape(C, T, *out.vertices.shape[1:])

        metrics: Dict[str, np.ndarray] = {
            "v2v_vs_input_cm": v2v_cm(out_verts, init_verts, axis=(1, 2)),
            "final_pose_pr": np.asarray(history["pose_pr"][:, -1]),
            "final_temp": np.asarray(history["temp"][:, -1]),
        }
        if noise_s is not None:
            metrics["noise_level_s"] = noise_s
        if gt_pose_body is not None:
            gt_out = self.body_model(pose_body=gt.reshape(C * T, -1),
                                     betas=betas)
            gt_verts = gt_out.vertices.reshape(C, T, *gt_out.vertices.shape[1:])
            metrics["v2v_cm"] = v2v_cm(out_verts, gt_verts, axis=(1, 2))
            metrics["v2v_input_cm"] = v2v_cm(init_verts, gt_verts,
                                             axis=(1, 2))
        return final_pose, metrics


def _load_pose_file(path: str, frames: Optional[int] = None) -> np.ndarray:
    """Load a pose sequence (key ``pose_body`` or ``pose``) zero-padded to
    (T, 69); ``frames`` truncates to the first ``frames`` rows."""
    with np.load(path) as z:
        key = "pose_body" if "pose_body" in z else "pose"
        pb = np.asarray(z[key]).astype(np.float32)
    out = np.zeros((len(pb), 69), np.float32)
    out[:, : min(pb.shape[1], 69)] = pb[:, :69]
    return out[:frames] if frames else out


def run_cli(args) -> None:
    from posendf_tpu.cli import _load, _load_params

    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    bm = BodyModel(bm_path=args.bm_path) if args.bm_path else BodyModel()

    noisy = _load_pose_file(args.motion_data)
    # align gt to the noisy clip up front — a frame-count mismatch would
    # otherwise surface only after the full solve
    gt = _load_pose_file(args.gt_data, frames=len(noisy)) if args.gt_data else None
    if gt is not None and len(gt) < len(noisy):
        noisy = noisy[: len(gt)]
    specs = {"balanced": BALANCED_SPECS, "adaptive": "adaptive"}.get(
        getattr(args, "specs", "reference"))
    denoiser = MotionDenoiser(module, params, bm, specs=specs)
    final_pose, metrics = denoiser.optimize(jnp.asarray(noisy),
                                            jnp.asarray(gt) if gt is not None else None)
    for k, v in metrics.items():
        print(f"{k}: {v:0.8f}")
    if args.out:
        np.savez(args.out, pose_body=np.asarray(final_pose), **metrics)
        print(f"wrote {args.out}")
    if getattr(args, "save_mesh", False) or getattr(args, "render", False):
        # before/after meshes like the reference denoiser
        # (motion_denoise.py:61,112 via exp_utils.py:30-63)
        from posendf_tpu.experiments.render import export_pose_meshes

        out_dir = args.mesh_dir or "./denoised"
        export_pose_meshes(out_dir, bm,
                           [("init", jnp.asarray(noisy)),
                            ("out", final_pose)],
                           save_mesh=args.save_mesh, render=args.render)
        print(f"wrote meshes/renders -> {out_dir}")
