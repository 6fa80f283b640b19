"""Closed-loop quality benchmark for image fitting (the reference's other
flagship downstream task, ``experiments/image_fitting.py:94-221``).

No real images/OpenPose exist in this environment, so the loop is closed
synthetically with the framework's own production paths — the denoising
benchmark's protocol (scripts/quality_grid.py) applied to image fitting:

  1. GT: sample poses from the trained field's manifold family, pick a GT
     camera (depth ~10, the reference's ``trans_estimation``), project the
     mapped BODY_25 joints to 2D keypoints through the production
     ``project_points``;
  2. corrupt: pixel noise on the 2D keypoints and/or dropped (occluded)
     limb keypoints — the reference's motivating regime (confidence-weighted
     fitting exists exactly because detections are noisy/missing);
  3. fit: the full 3-stage ``ImageFitter.optimize`` from zero pose, prior-on
     vs prior-off (``prior_scale=0``, schedule otherwise identical);
  4. report: per-joint pose geodesic error (deg), body-frame joint error
     (cm, zero orient/betas so the camera/orient gauge ambiguity cancels),
     and the 2D residual on observed keypoints.

Camera-rotation gauge: stage 1 optimizes camera rotation AND global orient
against torso keypoints, so (R_cam, orient) is only identified jointly —
all pose metrics therefore compare body_pose at zero orient.

Run (CPU is fine — the solves are small; ~2 min/seed). NB the
``--device cpu`` flag, not the env var: this image's sitecustomize pins
``jax_platforms="axon,cpu"`` before user code, so ``JAX_PLATFORMS=cpu``
alone is IGNORED and the run would land on the shared remote TPU
(CLAUDE.md "Environment quirks"); the flag does the required
``jax.config.update`` instead:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/fit_image_quality.py \
        --device cpu --ckpt docs/quality/ckpt_l8_best.msgpack \
        --seeds 1 2 3 --out docs/quality/fit_image_closed_loop.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# BODY_25 limb keypoints eligible for occlusion (elbows/wrists/knees/ankles)
LIMB_KPTS = (3, 4, 6, 7, 10, 11, 13, 14)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="docs/quality/ckpt_l8_best.msgpack",
                    help="trained field (msgpack, quality_grid --save-ckpt "
                         "payload); its manifold family must match "
                         "--latents/--freq/--family-seed")
    ap.add_argument("--latents", type=int, default=8)
    ap.add_argument("--freq", type=float, nargs=2, default=[0.5, 1.2])
    ap.add_argument("--family-seed", type=int, default=123,
                    help="the seed-0 quality-grid family (gentle_family "
                         "seed 123 — the family ckpt_l8_best was trained on)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3],
                    help="evaluation seeds (GT poses, camera, noise, "
                         "occlusion draws); the field is fixed")
    ap.add_argument("--batch", type=int, default=4, help="poses per fit")
    ap.add_argument("--noise-px", type=float, default=5.0)
    ap.add_argument("--drop", type=int, default=4,
                    help="occluded limb keypoints in the 'occluded' condition")
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--steps-per-iter", type=int, default=10)
    ap.add_argument("--prior-form", choices=("reference", "self"),
                    default="self",
                    help="'self' (default here): the denoise schedule's "
                         "self-weighted prior — the reference's linear "
                         "weighting measurably pins the fit inside the "
                         "field's zero region from the zero-pose init "
                         "(see fit_image.SELF_WEIGHTED_PRIOR); pass "
                         "'reference' to reproduce that failure mode")
    ap.add_argument("--device", choices=("default", "cpu"), default="default")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        _repo, ".jax_cache_cpu" if args.device == "cpu" else ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.data.synthetic import (manifold_family,
                                            synthetic_manifold_poses)
    from posendf_tpu.experiments.camera import project_points
    from posendf_tpu.experiments.fit_image import ImageFitter
    from posendf_tpu.quat import (axis_angle_to_quaternion,
                                  quaternion_to_axis_angle)
    from posendf_tpu.smpl import BodyModel
    from posendf_tpu.smpl.lbs import lbs_forward, with_landmarks

    family = manifold_family(
        np.random.default_rng(args.family_seed), 21,
        latents=args.latents, freq_range=tuple(args.freq))

    cfg = PoseNDFConfig()
    module = cfg.make_model()
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    from flax import serialization as fser

    with open(args.ckpt, "rb") as f:
        payload = fser.from_bytes(
            {"epoch": 0, "state": {"params": params}}, f.read())
    params = jax.device_put(payload["state"]["params"])
    print(f"== loaded {args.ckpt} (trained to step {payload['epoch']}); "
          f"devices: {jax.devices()}", flush=True)

    body = BodyModel()
    fit_on = ImageFitter(module, params, body, prior_form=args.prior_form)
    fit_off = ImageFitter(module, params, body, prior_scale=0.0,
                          prior_form=args.prior_form)
    center = np.array([500.0, 500.0], np.float32)
    B = args.batch

    def body_frame_joints(pose69):
        _, j = lbs_forward(body.model, jnp.zeros((B, body.num_betas)),
                           jnp.zeros((B, 3)), pose69)
        return j

    def pose_metrics(fit_pose69, gt_pose69, gt_quats):
        fq = axis_angle_to_quaternion(
            jnp.asarray(fit_pose69)[:, :63].reshape(B, 21, 3))
        dots = jnp.abs(jnp.sum(fq * jnp.asarray(gt_quats), axis=-1))
        ang = 2.0 * jnp.arccos(jnp.clip(dots, 0.0, 1.0))
        jf = body_frame_joints(jnp.asarray(fit_pose69))
        jg = body_frame_joints(jnp.asarray(gt_pose69))
        jerr = jnp.mean(jnp.sqrt(jnp.sum((jf - jg) ** 2, -1) + 1e-12))
        return (float(jnp.mean(ang) * 180.0 / np.pi),
                float(jerr * 100.0))

    rows = []
    for seed in args.seeds:
        rng = np.random.default_rng([seed, 77])
        gt_quats = synthetic_manifold_poses(rng, B, family=family)
        gt_pose = np.zeros((B, 69), np.float32)
        gt_pose[:, :63] = np.asarray(quaternion_to_axis_angle(
            jnp.asarray(gt_quats))).reshape(B, 63)
        gt_orient = rng.normal(scale=0.2, size=(B, 3)).astype(np.float32)
        trans = np.zeros((B, 3), np.float32)
        trans[:, :2] = rng.uniform(-0.3, 0.3, (B, 2))
        trans[:, 2] = 10.0 + rng.uniform(-1.0, 1.0, B)

        # GT keypoints through the production projection path
        verts, joints = lbs_forward(body.model,
                                    jnp.zeros((B, body.num_betas)),
                                    jnp.asarray(gt_orient),
                                    jnp.asarray(gt_pose))
        joints = with_landmarks(verts, joints)
        cam = {"rotation": jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
               "translation": jnp.asarray(trans)}
        gt_xy = np.asarray(project_points(
            cam, fit_on._mapped_joints(joints), fit_on.focal_length,
            jnp.tile(jnp.asarray(center)[None], (B, 1))))

        conditions = {
            "clean": (0.0, 0),
            "noise": (args.noise_px, 0),
            "occluded": (args.noise_px, args.drop),
        }
        for cond, (sig_px, n_drop) in conditions.items():
            kp = np.ones((B, 25, 3), np.float32)
            kp[..., :2] = gt_xy + sig_px * rng.standard_normal(gt_xy.shape)
            for b in range(B):
                if n_drop:
                    drop = rng.choice(LIMB_KPTS, n_drop, replace=False)
                    kp[b, drop, 2] = 0.0
            for label, fitter in (("on", fit_on), ("off", fit_off)):
                t0 = time.perf_counter()
                res, m = fitter.optimize(kp, iterations=args.iterations,
                                         steps_per_iter=args.steps_per_iter,
                                         center=center)
                dt = time.perf_counter() - t0
                pose_deg, joint_cm = pose_metrics(res["pose_body"], gt_pose,
                                                  gt_quats)
                row = {"seed": seed, "condition": cond, "prior": label,
                       "noise_px": sig_px, "dropped": n_drop,
                       "pose_err_deg": round(pose_deg, 3),
                       "joint_err_cm": round(joint_cm, 3),
                       "stage2_px_residual": round(m["stage2_final_data"], 3),
                       "solve_s": round(dt, 2)}
                rows.append(row)
                print(f"   seed {seed} {cond:>8} prior={label:>3}: pose "
                      f"{pose_deg:6.2f} deg, joints {joint_cm:6.2f} cm, "
                      f"2D residual {m['stage2_final_data']:8.2f} "
                      f"({dt:.1f}s)", flush=True)

    # aggregate: prior gain per condition (positive = prior reduced error)
    summary = []
    for cond in ("clean", "noise", "occluded"):
        on = [r for r in rows if r["condition"] == cond and r["prior"] == "on"]
        off = [r for r in rows if r["condition"] == cond and r["prior"] == "off"]
        mean = lambda rs, k: float(np.mean([r[k] for r in rs]))  # noqa: E731
        summary.append({
            "condition": cond,
            "pose_err_deg_on": round(mean(on, "pose_err_deg"), 3),
            "pose_err_deg_off": round(mean(off, "pose_err_deg"), 3),
            "joint_err_cm_on": round(mean(on, "joint_err_cm"), 3),
            "joint_err_cm_off": round(mean(off, "joint_err_cm"), 3),
            "prior_gain_deg": round(mean(off, "pose_err_deg")
                                    - mean(on, "pose_err_deg"), 3),
            "prior_gain_cm": round(mean(off, "joint_err_cm")
                                   - mean(on, "joint_err_cm"), 3),
            "seeds_prior_wins": sum(
                1 for a, b in zip(sorted(on, key=lambda r: r["seed"]),
                                  sorted(off, key=lambda r: r["seed"]))
                if a["joint_err_cm"] < b["joint_err_cm"]),
        })
        s = summary[-1]
        print(f"== {cond:>8}: pose {s['pose_err_deg_on']:.2f} vs "
              f"{s['pose_err_deg_off']:.2f} deg (gain "
              f"{s['prior_gain_deg']:+.2f}), joints {s['joint_err_cm_on']:.2f}"
              f" vs {s['joint_err_cm_off']:.2f} cm (gain "
              f"{s['prior_gain_cm']:+.2f}), prior wins "
              f"{s['seeds_prior_wins']}/{len(args.seeds)} seeds", flush=True)

    result = {"ckpt": args.ckpt, "latents": args.latents,
              "freq": list(args.freq), "family_seed": args.family_seed,
              "batch": B, "noise_px": args.noise_px, "drop": args.drop,
              "iterations": args.iterations,
              "steps_per_iter": args.steps_per_iter,
              "prior_form": args.prior_form,
              "seeds": list(args.seeds), "summary": summary, "runs": rows}
    print(json.dumps({"summary": summary}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
