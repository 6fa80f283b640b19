"""Closed-loop quality benchmark for partial-observation completion
(reference task: ``experiments/partial_observation.py`` — the denoise solver
re-run with a gentler schedule on sequences where part of the body is
unreliable; the reference ships no ground truth, no occlusion model, and no
completion mechanism).

Protocol (same trained checkpoint / family / honesty rules as
scripts/quality_grid.py and fit_image_quality.py):

  1. GT: temporally-smooth clips from the trained field's manifold family;
  2. corrupt ONLY an occluded joint set, rest stays clean (the reliable
     observation). Two conditions:
       * ``drop_arm``  — left-arm chain zeroed (tracker lost the limb);
       * ``noise_arms`` — both arm chains at sigma-1.0 jitter;
  3. DETECTABILITY PROBE per condition: the field's d and the TRUE 5-NN
     geodesic distance (fresh corpus) at GT vs corrupted — whether the
     corruption is visible to the metric and to the trained field at all;
  4. complete with every strategy the framework ships, prior-on vs
     prior-off where a prior weight exists:
       * ``anchor``    — the reference PARTIAL_SPECS schedule (10x10) with
                         the data term made occlusion-aware (observed-joint
                         anchors; the fully anchor-everything solve measures
                         within 0.3 deg of it — ARCHITECTURE §7 footnote);
       * ``inpaint``   — observed dofs FROZEN, occluded dofs optimized
                         under INPAINT_SPECS (10x50);
       * ``retrieval`` — visible-joint-weighted kNN splice + temporal
                         smoothing (complete_by_retrieval, k=5, window 5);
  5. report v2v vs GT and per-joint-angle error split occluded/visible.

Headline findings this artifact documents (see ARCHITECTURE §7):
the corruption detectability probe shows a zeroed arm is NEAR-MANIFOLD on
this family (true 5-NN at/below GT's own floor) — no prior can recover
what the metric cannot see; for detectable corruptions the trained field
still under-reports them ~10x (its training noise moves all joints at
once, structured limb errors are off its distribution), so prior-driven
inpainting fails, while the retrieval engine (which matches on visible
joints directly) reduces occluded-joint error ~5x with observed joints
bit-exact.

Run (CPU is fine; the ``--device cpu`` FLAG, not JAX_PLATFORMS — this
image's sitecustomize pins jax_platforms before user code, CLAUDE.md):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/partial_quality.py \
        --device cpu --ckpt docs/quality/ckpt_l8_best.msgpack \
        --seeds 1 2 3 --out docs/quality/partial_closed_loop.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# SMPL body-pose joint indices (kinematics.py): left-arm chain and both-arm
# chains — the occlusion sets of the two conditions
LEFT_ARM = (12, 15, 17, 19)
BOTH_ARMS = (12, 13, 15, 16, 17, 18, 19, 20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="docs/quality/ckpt_l8_best.msgpack")
    ap.add_argument("--family-seed", type=int, default=123,
                    help="the seed-0 quality-grid family (gentle_family "
                         "seed 123 — the family ckpt_l8_best was trained on)")
    ap.add_argument("--latents", type=int, default=8)
    ap.add_argument("--freq", type=float, nargs=2, default=[0.5, 1.2])
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--clips", type=int, default=2, help="clips per seed")
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--corpus-size", type=int, default=131072)
    ap.add_argument("--noise-sigma", type=float, default=1.0)
    ap.add_argument("--retrieval-k", type=int, default=5)
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
                                            synthetic_manifold_poses,
                                            synthetic_motion_sequence)
    from posendf_tpu.experiments.partial import (INPAINT_SPECS,
                                                 PARTIAL_SPECS,
                                                 PartialCompleter,
                                                 complete_by_retrieval)
    from posendf_tpu.ops.knn import geodesic_topk
    from posendf_tpu.quat import (axis_angle_to_quaternion,
                                  quaternion_to_axis_angle)
    from posendf_tpu.smpl import BodyModel

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
          f"devices: {jax.devices()}", flush=True)

    # fresh corpus: the retrieval engine's database AND the truth oracle of
    # the detectability probe (disjoint stream from every training draw)
    corpus = synthetic_manifold_poses(
        np.random.default_rng(777), args.corpus_size, family=family)
    corpus_dev = jnp.asarray(corpus)

    body = BodyModel()

    def off_specs(specs):
        s = dict(specs)
        s["pose_pr"] = s["pose_pr"]._replace(scale=0.0)
        return s

    solvers = {
        ("anchor", True): PartialCompleter(module, params, body),
        ("anchor", False): PartialCompleter(module, params, body,
                                            specs=off_specs(PARTIAL_SPECS)),
        ("inpaint", True): PartialCompleter(module, params, body,
                                            specs=INPAINT_SPECS),
        ("inpaint", False): PartialCompleter(module, params, body,
                                              specs=off_specs(INPAINT_SPECS)),
    }

    def probe(p63_gt, p63_bad):
        out = {}
        for tag, p63 in (("gt", p63_gt), ("corrupted", p63_bad)):
            q = axis_angle_to_quaternion(
                jnp.asarray(p63).reshape(-1, 21, 3))
            out[f"field_d_{tag}"] = float(jnp.mean(
                module.apply({"params": params}, q)))
            knn, _ = geodesic_topk(q, corpus_dev, k=5, precision="highest")
            out[f"true_5nn_{tag}"] = float(jnp.mean(knn))
        return out

    conditions = {
        "drop_arm": (np.asarray(LEFT_ARM), "zero"),
        "noise_arms": (np.asarray(BOTH_ARMS), "noise"),
    }
    rows = []
    t0 = time.perf_counter()
    for seed in args.seeds:
        rng = np.random.default_rng([seed, 501])
        for cond, (occ, kind) in conditions.items():
            vis = np.asarray([j for j in range(21)
                              if j not in set(occ.tolist())], int)
            accum = {}

            def add(key, val):
                accum.setdefault(key, []).append(float(val))

            for c in range(args.clips):
                gt_q = synthetic_motion_sequence(rng, args.frames,
                                                 family=family)
                gt63 = np.asarray(quaternion_to_axis_angle(
                    jnp.asarray(gt_q))).reshape(args.frames, 63)
                bad = gt63.copy().reshape(args.frames, 21, 3)
                if kind == "zero":
                    bad[:, occ] = 0.0
                else:
                    bad[:, occ] += (args.noise_sigma * rng.standard_normal(
                        (args.frames, len(occ), 3)))
                bad63 = bad.reshape(args.frames, 63).astype(np.float32)

                for key, val in probe(gt63, bad63).items():
                    add(key, val)

                def deg(pose69_or_63):
                    a = np.asarray(pose69_or_63)[:, :63]
                    q = axis_angle_to_quaternion(
                        jnp.asarray(a).reshape(-1, 21, 3))
                    dots = jnp.abs(jnp.sum(q * jnp.asarray(gt_q), axis=-1))
                    ang = np.asarray(2 * jnp.arccos(jnp.clip(dots, 0, 1))
                                     ) * 180.0 / np.pi
                    return ang[:, occ].mean(), ang[:, vis].mean()

                o, v = deg(bad63)
                add("occ_in", o), add("vis_in", v)

                for (mode, prior_on), solver in solvers.items():
                    its, spi = (10, 10) if mode == "anchor" else (10, 50)
                    pose, m = solver.optimize(
                        jnp.asarray(bad63), jnp.asarray(gt63),
                        iterations=its, steps_per_iter=spi,
                        occluded_joints=occ.tolist(), mode=mode)
                    tag = f"{mode}_{'on' if prior_on else 'off'}"
                    o, v = deg(pose)
                    add(f"v2v_{tag}", m["v2v_cm"])
                    add(f"occ_{tag}", o), add(f"vis_{tag}", v)
                    if mode == "anchor" and prior_on:
                        add("v2v_in", m["v2v_input_cm"])

                quats_bad = axis_angle_to_quaternion(
                    jnp.asarray(bad63).reshape(args.frames, 21, 3))
                done = complete_by_retrieval(
                    corpus, np.asarray(quats_bad), occ.tolist(),
                    k=args.retrieval_k)
                out63 = np.asarray(quaternion_to_axis_angle(
                    jnp.asarray(done))).reshape(args.frames, 63)
                o, v = deg(out63)
                add("occ_retrieval", o), add("vis_retrieval", v)
                gt_v = body(pose_body=jnp.asarray(gt63)).vertices
                out_v = body(pose_body=jnp.asarray(out63)).vertices
                add("v2v_retrieval", float(jnp.mean(jnp.sqrt(jnp.sum(
                    (out_v - gt_v) ** 2, -1))) * 100.0))

            row = {"seed": seed, "condition": cond,
                   "occluded_joints": occ.tolist(),
                   **{k: float(np.mean(v)) for k, v in accum.items()}}
            rows.append(row)
            print(f"seed {seed} {cond:10s}: "
                  f"probe field d {row['field_d_gt']:.4f}->"
                  f"{row['field_d_corrupted']:.4f}, true5nn "
                  f"{row['true_5nn_gt']:.4f}->"
                  f"{row['true_5nn_corrupted']:.4f} | occluded deg "
                  f"in {row['occ_in']:6.2f} -> anchor "
                  f"{row['occ_anchor_on']:6.2f} inpaint "
                  f"{row['occ_inpaint_on']:6.2f}/"
                  f"{row['occ_inpaint_off']:6.2f} retrieval "
                  f"{row['occ_retrieval']:6.2f} | visible in "
                  f"{row['vis_in']:.3f} -> anchor "
                  f"{row['vis_anchor_on']:6.2f} retrieval "
                  f"{row['vis_retrieval']:.3f}", flush=True)

    summary = {}
    for cond in conditions:
        sel = [r for r in rows if r["condition"] == cond]
        summary[cond] = {k: float(np.mean([r[k] for r in sel]))
                         for k in sel[0]
                         if k not in ("seed", "condition", "occluded_joints")}
        summary[cond]["retrieval_occ_wins_vs_input"] = int(sum(
            r["occ_retrieval"] < r["occ_in"] for r in sel))
        summary[cond]["n"] = len(sel)
    result = {"ckpt": args.ckpt, "family_seed": args.family_seed,
              "latents": args.latents, "freq": list(args.freq),
              "frames": args.frames, "clips": args.clips,
              "seeds": list(args.seeds), "corpus_size": args.corpus_size,
              "noise_sigma": args.noise_sigma,
              "retrieval_k": args.retrieval_k,
              "conditions": {c: {"occluded": o.tolist(), "kind": k}
                             for c, (o, k) in conditions.items()},
              "rows": rows, "summary": summary,
              "wall_s": round(time.perf_counter() - t0, 1)}
    print("\nsummary:", json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
