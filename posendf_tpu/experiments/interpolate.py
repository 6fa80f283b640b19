"""Pose interpolation: geodesic slerp between poses + per-step manifold
projection.

The reference advertises interpolation (README.md:74-76) but ships only a
stub (``experiments/interpolation.py`` — loads a checkpoint, evaluates two
random poses, drops into a debugger). This implements the intended
capability: spherical-linear interpolation per joint between two poses, then
projection of every intermediate onto the learned manifold so the path stays
on plausible poses — all in one jitted program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu.projection import project, random_poses
from posendf_tpu.quat import quat_slerp

__all__ = ["interpolate", "run_cli"]


def interpolate(
    module,
    params,
    pose_a: jax.Array,      # (21, 4)
    pose_b: jax.Array,      # (21, 4)
    num_steps: int = 10,
    projection_steps: int = 10,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (path (num_steps, 21, 4), field distances (num_steps,)):
    slerp waypoints projected onto the manifold."""
    t = jnp.linspace(0.0, 1.0, num_steps)
    path = quat_slerp(pose_a, pose_b, t)  # (num_steps, 21, 4)
    projected, hist = project(module, params, path, steps=projection_steps)
    dist = module.apply({"params": params}, projected)[:, 0]
    return projected, dist


def _load_endpoint(path: str) -> jax.Array:
    """Load one pose from an .npz: accepts 'pose' (21, 4) quats or
    'pose_body' (63,) axis-angle (first frame of either)."""
    from posendf_tpu.quat import axis_angle_to_quaternion

    with np.load(path) as z:
        if "pose" in z:
            arr = np.asarray(z["pose"], np.float32)
            q = arr.reshape(-1, 21, 4)[0]
            return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))
        arr = np.asarray(z["pose_body"], np.float32).reshape(-1)[:63]
        return axis_angle_to_quaternion(jnp.asarray(arr.reshape(21, 3)))


def run_cli(args) -> None:
    from posendf_tpu.cli import _load, _load_params

    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    if bool(args.pose_a) != bool(args.pose_b):
        raise SystemExit("--pose-a and --pose-b must be given together")
    random_endpoints = False
    if args.pose_a and args.pose_b:
        pose_a = _load_endpoint(args.pose_a)
        pose_b = _load_endpoint(args.pose_b)
    else:
        key = jax.random.key(args.seed)
        ka, kb = jax.random.split(key)
        pose_a = random_poses(ka, 1)[0]
        pose_b = random_poses(kb, 1)[0]
        random_endpoints = True
    path, dist = interpolate(module, params, pose_a, pose_b, num_steps=args.num_steps)
    if random_endpoints:
        # measured on trained fields (docs/quality/interp_closed_loop_*.json):
        # uniform-random poses sit ~5x beyond the max training label, where
        # the field reads near-zero and projection has no signal — the
        # small printed distances then do NOT mean the path is on-manifold
        print("NOTE: interpolating between RANDOM poses (no --pose-a/-b). "
              "Far off-manifold is outside the trained field's validity "
              "shell — the field under-reports distance there and the "
              "projected path generally stays far from real poses "
              "(ARCHITECTURE §7). Pass real pose endpoints for meaningful "
              "interpolation.")
    print(f"interpolated {args.num_steps} steps; field distance per waypoint:")
    print(" ".join(f"{float(d):.5f}" for d in dist))
    if args.out:
        np.savez(args.out, path=np.asarray(path), dist=np.asarray(dist))
        print(f"wrote {args.out}")
