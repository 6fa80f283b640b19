"""Closed-loop quality benchmark for pose interpolation (reference
component #24: README advertises interpolation but ships an unimplemented
stub, ``experiments/interpolation.py`` — two random poses, one eval, ipdb).

The framework implements the intended capability (slerp waypoints +
per-waypoint manifold projection, ``experiments/interpolate.py``); this
script MEASURES it against the truth oracle the synthetic protocol makes
possible — the true 5-NN geodesic distance to a fresh manifold corpus,
NOT the field's own value (which would be circular):

  per seed x condition, draw two endpoints, slerp ``--num-steps``
  waypoints, project each; report (raw vs projected) true 5-NN mean/max
  along the path, the field's d, and path smoothness (max adjacent-step
  geodesic).

Endpoint conditions:
  * ``clean``  — two family poses (the advertised use: travel between
    real poses through the manifold);
  * ``noisy``  — family poses + sigma-0.25 uniform quaternion noise (the
    training-noise regime: projection must clean the path);
  * ``random`` — uniform random poses (the reference stub's own setup;
    measures the field's reach far off-manifold).

Run on the 8-latent checkpoint of record AND the 2-latent contrast field
(trained by scripts/quality_grid.py --latents 2): the 8-dof family is
nearly slerp-convex (raw paths already sit at the corpus floor) while
the 2-dof sheet is where mid-path drift and the projector's correction
are visible.

Run (CPU is fine; the ``--device cpu`` FLAG, not JAX_PLATFORMS — this
image's sitecustomize pins jax_platforms before user code, CLAUDE.md):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/interp_quality.py \
        --device cpu --ckpt docs/quality/ckpt_l8_best.msgpack \
        --seeds 1 2 3 --out docs/quality/interp_closed_loop_l8.json
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/interp_quality.py \
        --device cpu --ckpt docs/quality/ckpt_l2_interp.msgpack \
        --latents 2 --freq 0.15 0.4 --seeds 1 2 3 \
        --out docs/quality/interp_closed_loop_l2.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="docs/quality/ckpt_l8_best.msgpack")
    ap.add_argument("--family-seed", type=int, default=123,
                    help="gentle_family seed of the checkpoint's family")
    ap.add_argument("--latents", type=int, default=8)
    ap.add_argument("--freq", type=float, nargs=2, default=[0.5, 1.2])
    ap.add_argument("--num-steps", type=int, default=20)
    ap.add_argument("--projection-steps", type=int, default=50)
    ap.add_argument("--pairs", type=int, default=4, help="endpoint pairs per seed")
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--corpus-size", type=int, default=131072)
    ap.add_argument("--noise-sigma", type=float, default=0.25)
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

    from flax import serialization as fser

    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.data.synthetic import (manifold_family,
                                            synthetic_manifold_poses)
    from posendf_tpu.experiments.interpolate import interpolate
    from posendf_tpu.ops.knn import geodesic_topk
    from posendf_tpu.quat import quat_slerp

    family = manifold_family(
        np.random.default_rng(args.family_seed), 21,
        latents=args.latents, freq_range=tuple(args.freq))

    cfg = PoseNDFConfig()
    module = cfg.make_model()
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    with open(args.ckpt, "rb") as f:
        payload = fser.from_bytes(
            {"epoch": 0, "state": {"params": params}}, f.read())
    params = jax.device_put(payload["state"]["params"])
    print(f"== loaded {args.ckpt} (trained to step {payload['epoch']}); "
          f"latents={args.latents} devices: {jax.devices()}", flush=True)

    corpus = jnp.asarray(synthetic_manifold_poses(
        np.random.default_rng(777), args.corpus_size, family=family))

    def true_d(path):
        knn, _ = geodesic_topk(jnp.asarray(path), corpus, k=5,
                               precision="highest")
        return np.asarray(knn).mean(-1)

    def max_step(path):
        p = np.asarray(path)
        return float((1 - np.abs(np.sum(p[1:] * p[:-1], -1))).mean(-1).max())

    def endpoints(rng, cond):
        if cond == "random":
            q = rng.normal(size=(2, 21, 4)).astype(np.float32)
            return q / np.linalg.norm(q, axis=-1, keepdims=True)
        e = synthetic_manifold_poses(rng, 2, family=family)
        if cond == "noisy":
            # the training sampler's noise family (create_data.py:88)
            e = e + args.noise_sigma * rng.random((2, 21, 4)).astype(
                np.float32)
            e = e / np.linalg.norm(e, axis=-1, keepdims=True)
        return e

    conditions = ("clean", "noisy", "random")
    t = jnp.linspace(0.0, 1.0, args.num_steps)
    rows = []
    t0 = time.perf_counter()
    for seed in args.seeds:
        rng = np.random.default_rng([seed, 602])
        for cond in conditions:
            acc = {}

            def add(k, v):
                acc.setdefault(k, []).append(float(v))

            for _ in range(args.pairs):
                e = endpoints(rng, cond)
                a, b = jnp.asarray(e[0]), jnp.asarray(e[1])
                raw = quat_slerp(a, b, t)
                proj, d_proj = interpolate(
                    module, params, a, b, num_steps=args.num_steps,
                    projection_steps=args.projection_steps)
                tr, tp = true_d(raw), true_d(proj)
                add("sep", float(jnp.mean(1 - jnp.abs(jnp.sum(a * b, -1)))))
                add("true_raw_mean", tr.mean()), add("true_raw_max", tr.max())
                add("true_proj_mean", tp.mean()), add("true_proj_max", tp.max())
                add("field_raw_mean", float(jnp.mean(
                    module.apply({"params": params}, raw))))
                add("field_proj_mean", float(np.asarray(d_proj).mean()))
                add("max_step_raw", max_step(raw))
                add("max_step_proj", max_step(proj))
            row = {"seed": seed, "condition": cond,
                   **{k: float(np.mean(v)) for k, v in acc.items()}}
            row["true_gain_pct"] = float(
                100 * (1 - row["true_proj_mean"]
                       / max(row["true_raw_mean"], 1e-12)))
            rows.append(row)
            print(f"seed {seed} {cond:6s}: endpoint sep {row['sep']:.4f} | "
                  f"true 5-NN raw {row['true_raw_mean']:.5f} -> proj "
                  f"{row['true_proj_mean']:.5f} ({row['true_gain_pct']:+.1f}%)"
                  f" | field d {row['field_raw_mean']:.5f} -> "
                  f"{row['field_proj_mean']:.5f} | max step "
                  f"{row['max_step_raw']:.5f} -> {row['max_step_proj']:.5f}",
                  flush=True)

    # the corpus's own 5-NN floor (what "on-manifold" reads on this family)
    floor_probe = synthetic_manifold_poses(
        np.random.default_rng(888), 256, family=family)
    floor = float(np.mean(true_d(jnp.asarray(floor_probe))))

    summary = {}
    for cond in conditions:
        sel = [r for r in rows if r["condition"] == cond]
        summary[cond] = {k: float(np.mean([r[k] for r in sel]))
                         for k in sel[0] if k not in ("seed", "condition")}
        summary[cond]["proj_improves_true_seeds"] = int(sum(
            r["true_proj_mean"] < r["true_raw_mean"] for r in sel))
        summary[cond]["n"] = len(sel)
    result = {"ckpt": args.ckpt, "family_seed": args.family_seed,
              "latents": args.latents, "freq": list(args.freq),
              "num_steps": args.num_steps,
              "projection_steps": args.projection_steps,
              "pairs": args.pairs, "seeds": list(args.seeds),
              "corpus_size": args.corpus_size,
              "noise_sigma": args.noise_sigma,
              "manifold_5nn_floor": floor,
              "rows": rows, "summary": summary,
              "wall_s": round(time.perf_counter() - t0, 1)}
    print(f"\nmanifold 5-NN floor: {floor:.5f}")
    print("summary:", json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
