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

__all__ = ["PARTIAL_SPECS", "PartialCompleter", "run_cli"]

PARTIAL_SPECS = {
    "pose_pr": AnnealSpec(scale=100.0, power=1, anneal=-1.0),
    "temp": AnnealSpec(scale=100.0, power=1, anneal=+1.0),
    "data": AnnealSpec(scale=10.0, power=1, anneal=-1.0, active_after=0),
}


class PartialCompleter(MotionDenoiser):
    def __init__(self, module, params, body_model: BodyModel):
        super().__init__(module, params, body_model, specs=PARTIAL_SPECS)

    def optimize(self, pose_body, iterations=10, steps_per_iter=10, **kw):
        return super().optimize(pose_body, None, iterations, steps_per_iter, **kw)


def run_cli(args) -> None:
    from posendf_tpu.cli import _load, _load_params

    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    bm = BodyModel(bm_path=args.bm_path) if args.bm_path else BodyModel()
    pose = _load_pose_file(args.motion_data)[: args.max_frames]
    completer = PartialCompleter(module, params, bm)
    final_pose, metrics = completer.optimize(jnp.asarray(pose))
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
