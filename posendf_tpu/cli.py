"""Unified CLI for the PoseNDF-TPU framework.

Mirrors (and repairs) the reference's entry points:
  * ``train``      — ``trainer.py --config ...`` (reference trainer.py:27-38)
  * ``generate``   — pose generation via manifold projection; the reference's
    ``trainer.py --test`` path is dead code (``model/train_posendf.py:112``
    comments out inference), its working form being
    ``experiments/sample_poses.py`` — here it is a first-class mode.
  * ``denoise`` / ``fit-image`` / ``interpolate`` / ``partial`` — the
    downstream experiments (consistent names; the reference README names
    don't match its actual files, README.md:75-85).
  * ``prepare-data`` — the data-manufacturing pipeline (replaces the
    reference's generated bash/Slurm fan-out with one sharded program).
  * ``denoise-bench`` — the reference's HuMoR-style noise-grid sweep
    (``motion_denoise.py:158-191``) with per-level v2v aggregation.

Usage: ``python -m posendf_tpu.cli <command> [options]``.
"""

from __future__ import annotations

import argparse


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", "-c", default="configs/amass.yaml", help="Path to config YAML")
    p.add_argument("--ckpt", default=None,
                   help="Checkpoint: native .msgpack or reference torch .tar")


def _load(args):
    from posendf_tpu.config import load_config

    return load_config(args.config)


def _add_mesh_out(p: argparse.ArgumentParser, default_dir: str):
    """Mesh/render output flags shared by the experiment subcommands — the
    reference renders before/after meshes in every experiment
    (exp_utils.py:30-63; motion_denoise.py:61,112; sample_poses.py:59-62)."""
    p.add_argument("--save-mesh", action="store_true",
                   help=f"write OBJ meshes (default dir: {default_dir})")
    p.add_argument("--render", action="store_true",
                   help="write PNG renders (PIL) or .npy grayscale")
    p.add_argument("--mesh-dir", default=None,
                   help=f"mesh/render output dir (default {default_dir})")


def _load_params(cfg, ckpt_path):
    from posendf_tpu.field import load_field

    field = load_field(ckpt_path, config=cfg)
    return field.module, field.params


def cmd_train(args):
    from posendf_tpu.data.pipeline import TrainingBatcher
    from posendf_tpu.parallel import make_mesh
    from posendf_tpu.training.trainer import Trainer
    from posendf_tpu.utils import enable_nan_debugging, trace

    if args.test:
        # reference CLI parity: `trainer.py --test` means pose generation
        # (dead code upstream, model/train_posendf.py:112; first-class here).
        # Re-parse through the real generate subparser so its defaults stay
        # the single source of truth.
        argv = ["generate", "--config", args.config]
        if args.ckpt:
            argv += ["--ckpt", args.ckpt]
        gen_args = build_parser().parse_args(argv)
        return gen_args.fn(gen_args)
    if args.debug_nans:
        enable_nan_debugging()
    cfg = _load(args)
    if args.max_epoch is not None:
        cfg.train.max_epoch = args.max_epoch
    if args.fused_grads:
        cfg.train.fused_grads = True
    if args.early_stop_patience is not None:
        cfg.train.early_stop_patience = args.early_stop_patience
    if cfg.train.early_stop_patience:
        cfg.experiment.val = True  # patience is meaningless without val
        # (applies to the YAML key too, not just the CLI flag)
    if args.val_every is not None:
        cfg.experiment.val_every = args.val_every
    mesh = make_mesh(("data",))
    batcher = TrainingBatcher(
        cfg.data.data_dir, cfg.data.amass_dir,
        batch_size=cfg.train.batch_size, num_pts=cfg.train.num_pts,
        flip=cfg.train.flip,
    )
    val_batcher = None
    if cfg.experiment.val:
        try:
            val_batcher = TrainingBatcher(
                cfg.data.data_dir, cfg.data.amass_dir, split="vald",
                batch_size=cfg.train.batch_size, num_pts=cfg.train.num_pts,
                flip=cfg.train.flip,
            )
        except FileNotFoundError as e:
            # the effective config, not just the CLI flag: patience set via
            # the YAML (train.early_stop_patience) must fail just as loud —
            # its whole point is the erosion guardrail, and degrading it to
            # an unvalidated full-length run would be a silent no-op
            if cfg.train.early_stop_patience:
                raise SystemExit(
                    "early-stop patience requires validation data, but no "
                    f"vald-split files were found ({e}); provide a vald split "
                    "under data.data_dir or drop the flag/config key") from e
            print("experiment.val=True but no vald-split data found; skipping validation")
    trainer = Trainer(cfg, mesh=mesh, config_path=args.config)
    if args.matched_head_init:
        stats = trainer.matched_head_init(batcher.sample_batch())
        if stats is None:
            print("matched-head init skipped: resuming from a checkpoint")
        else:
            print(f"matched-head init: z {stats['z_mean']:+.4f} +- "
                  f"{stats['z_std']:.4f} -> x{stats['scale']:.4f}, head bias "
                  f"{stats['new_bias']:+.4f} (labels {stats['label_mean']:.4f}"
                  f" +- {stats['label_std']:.4f})")
    epochs = cfg.train.max_epoch - trainer.epoch
    print(f"training {cfg.exp_name()} from epoch {trainer.epoch} for {epochs} epochs "
          f"on {mesh.devices.size} device(s)")
    with trace(args.profile):
        # validation-gated best retention + optional early stop live inside
        # fit (reference cadence val_every=100, trainer.py:23-24; unlike the
        # reference's "best"-that-is-latest, checkpoint_best.* here really
        # holds the best validation loss)
        trainer.fit(batcher, epochs=epochs,
                    val_batcher=val_batcher,
                    val_every=cfg.experiment.val_every,
                    early_stop_patience=cfg.train.early_stop_patience)
    if val_batcher is not None:
        info = trainer.store.best_info()
        if info:
            print(f"best checkpoint: epoch {info['epoch']} "
                  f"({info['mode']} total={info['metric']:.6f}) -> "
                  f"{trainer.store.directory}/checkpoint_best.*")


def cmd_generate(args):
    import jax
    import numpy as np

    from posendf_tpu.projection import project, random_poses

    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    key = jax.random.key(args.seed)
    noisy = random_poses(key, args.num_poses)
    out, hist = project(module, params, noisy, steps=args.steps,
                        renormalize=not args.no_renorm,
                        fused=getattr(args, "fused", False))
    if args.steps > 0:
        print(f"projected {args.num_poses} poses, {args.steps} steps: "
              f"mean dist {float(hist[0].mean()):.6f} -> {float(hist[-1].mean()):.6f}")
        if (float(jax.numpy.max(hist[0])) == 0.0
                and module.activation in ("lrelu", "relu")):
            print("WARNING: the field is identically zero on every input "
                  "(untrained weights, or the lrelu/relu init coin flip — "
                  "see dfnet.live_head); projection is a no-op. Load a "
                  "trained checkpoint with --ckpt.")
    else:
        print(f"projected {args.num_poses} poses, 0 steps (passthrough)")
    if args.out:
        np.savez(args.out, pose=np.asarray(out), pose_init=np.asarray(noisy),
                 dist_history=np.asarray(hist))
        print(f"wrote {args.out}")
    if args.save_mesh or args.render:
        # mesh/render output like the reference projection script
        # (sample_poses.py:59-62,79-82): SMPL forward on init + result poses
        from posendf_tpu.experiments.render import export_pose_meshes
        from posendf_tpu.quat import quaternion_to_axis_angle
        from posendf_tpu.smpl import BodyModel

        bm = BodyModel(bm_path=args.bm_path) if args.bm_path else BodyModel()
        out_dir = args.mesh_dir or "./generated"

        def aa(quats):
            return quaternion_to_axis_angle(quats).reshape(args.num_poses, 63)

        export_pose_meshes(out_dir, bm, [("init", aa(noisy)), ("out", aa(out))],
                           save_mesh=args.save_mesh, render=args.render)
        print(f"wrote meshes/renders -> {out_dir}")


def cmd_denoise(args):
    from posendf_tpu.experiments.denoise import run_cli

    run_cli(args)


def cmd_partial(args):
    from posendf_tpu.experiments.partial import run_cli

    run_cli(args)


def cmd_export(args):
    from posendf_tpu.export import (export_forward, export_forward_int8,
                                    export_project, save_artifact)

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    if args.int8 or args.quantized:
        if args.what != "forward":
            raise SystemExit(
                "--int8 exports the forward only (the int8 path is value-"
                "only; projection needs the f32 gradient paths)")
        qfield = _load_quantized(args)
        exp = export_forward_int8(qfield, batch=args.batch,
                                  platforms=platforms)
        save_artifact(exp, args.out)
        win = tuple(qfield.qparams["window"])
        batch = args.batch if args.batch is not None else "symbolic"
        print(f"exported int8 forward (quantized layers {win[0]}..{win[1]-1}, "
              f"batch={batch}, platforms={','.join(exp.platforms)}) "
              f"-> {args.out}")
        return
    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    if args.what == "forward":
        exp = export_forward(module, params, batch=args.batch,
                             platforms=platforms)
    else:
        exp = export_project(module, params, steps=args.steps,
                             batch=args.batch, platforms=platforms,
                             renormalize=not args.no_renorm)
    save_artifact(exp, args.out)
    batch = args.batch if args.batch is not None else "symbolic"
    print(f"exported {args.what} (batch={batch}, "
          f"platforms={','.join(exp.platforms)}) -> {args.out}")


def _load_quantized(args):
    """The int8 source for `export --int8`: a saved quantized-field file
    (--quantized), or post-training quantization of the loaded checkpoint
    against --calib poses (random uniform poses with a warning otherwise —
    a representative calibration set gives tighter activation scales)."""
    import jax
    import numpy as np

    from posendf_tpu.field import QuantizedField, make_field

    if args.quantized:
        return QuantizedField.load(args.quantized)
    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    field = make_field(module, params)
    if args.calib:
        with np.load(args.calib) as z:
            key = next((k for k in ("pose", "pose_body", "quats", "poses")
                        if k in z), None)
            if key is None:
                raise SystemExit(
                    f"--calib {args.calib}: no recognized pose key; "
                    f"found {sorted(z.files)}, expected one of "
                    "pose/pose_body/quats/poses")
            calib = np.asarray(z[key], np.float32)
        if calib.ndim == 2 and calib.shape[1] in (63, 69, 72, 156):
            from posendf_tpu.quat import axis_angle_to_quaternion
            import jax.numpy as jnp

            # 72/156: SMPL/SMPL-X full pose incl. root — body joints start
            # at index 3 (reference slices 3:72, data/sample_poses.py:48-56)
            start = 3 if calib.shape[1] in (72, 156) else 0
            calib = np.asarray(axis_angle_to_quaternion(
                jnp.asarray(calib[:, start:start + 63]).reshape(
                    len(calib), 21, 3)))
        elif calib.ndim == 2 and calib.shape[1] != module.num_joints * 4:
            raise SystemExit(
                f"--calib {args.calib}: key {key!r} has width "
                f"{calib.shape[1]}; expected axis-angle 63/69/72/156 or "
                f"quaternion {module.num_joints * 4}")
        try:
            calib = calib.reshape(-1, module.num_joints, 4)
        except ValueError:
            raise SystemExit(
                f"--calib {args.calib}: key {key!r} shape "
                f"{calib.shape} does not reshape to "
                f"(-1, {module.num_joints}, 4) quaternions") from None
    else:
        from posendf_tpu.projection import random_poses

        print("WARNING: no --calib set; calibrating activation scales on "
              "4096 uniform random poses (pass a representative pose file "
              "for tighter scales)")
        calib = random_poses(jax.random.key(0), 4096)
    qfield = field.quantize_int8(jax.numpy.asarray(calib))
    if args.save_quantized:
        qfield.save(args.save_quantized)
        print(f"saved quantized field -> {args.save_quantized}")
    return qfield


def cmd_interpolate(args):
    from posendf_tpu.experiments.interpolate import run_cli

    run_cli(args)


def cmd_fit_image(args):
    from posendf_tpu.experiments.fit_image import run_cli

    run_cli(args)


def cmd_denoise_bench(args):
    from posendf_tpu.experiments.denoise import BALANCED_SPECS, MotionDenoiser
    from posendf_tpu.experiments.denoise_benchmark import run_sweep, synthesize_grid
    from posendf_tpu.smpl import BodyModel

    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    bm = BodyModel(bm_path=args.bm_path) if args.bm_path else BodyModel()
    data_root = args.data_root
    if args.synthesize:
        data_root = synthesize_grid(args.data_root, seqs_per_level=args.seqs_per_level,
                                    family_seed=args.family_seed)
    specs = {"balanced": BALANCED_SPECS, "adaptive": "adaptive"}.get(args.specs)
    denoiser = MotionDenoiser(module, params, bm, specs=specs)
    run_sweep(denoiser, data_root, iterations=args.iterations,
              steps_per_iter=args.steps_per_iter, out_path=args.out,
              batch_clips=not getattr(args, "serial_clips", False))


def cmd_prepare_data(args):
    from posendf_tpu.data.prepare import run_cli

    run_cli(args)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="posendf_tpu", description=__doc__)
    from posendf_tpu import __version__

    ap.add_argument("--version", action="version",
                    version=f"posendf-tpu {__version__}")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="train the distance field")
    _add_common(p)
    p.add_argument("--max-epoch", type=int, default=None)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise immediately on any NaN under jit")
    p.add_argument("--test", action="store_true",
                   help="reference-CLI parity: generate poses instead of training")
    p.add_argument("--matched-head-init", action="store_true",
                   help="from-scratch aid: moment-match the distance head "
                        "to the first batch's labels so the final ReLU "
                        "cannot start in (or be pushed into) its absorbing "
                        "dead-zero state (training/init_utils.py); ignored "
                        "when resuming")
    p.add_argument("--fused-grads", action="store_true",
                   help="fused Pallas train-gradient kernel (TPU fast path, "
                        "lrelu/relu; multi-chip via shard_map+pmean, 1.75x)")
    p.add_argument("--early-stop-patience", type=int, default=None,
                   metavar="N",
                   help="stop after N consecutive non-improving validations "
                        "(enables experiment.val); the retained "
                        "checkpoint_best.* guards against the measured "
                        "training-length erosion (docs/quality/)")
    p.add_argument("--val-every", type=int, default=None, metavar="E",
                   help="validation cadence in epochs (default 100, the "
                        "reference cadence)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("generate", help="sample poses by manifold projection")
    _add_common(p)
    p.add_argument("--num-poses", type=int, default=10)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-renorm", action="store_true",
                   help="reference-exact mode: skip per-step re-normalization")
    p.add_argument("--fused", action="store_true",
                   help="single-kernel projection step (TPU fast path: "
                        "1.07-3.5x the XLA scan, growing with batch)")
    p.add_argument("--out", default=None, help="output .npz path")
    _add_mesh_out(p, "./generated")
    p.add_argument("--bm-path", default=None, help="SMPL model file")
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("export",
                       help="serialize the model for serving (jax.export "
                            "artifact; loads anywhere jax runs, no "
                            "posendf_tpu needed)")
    _add_common(p)
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--what", choices=("forward", "project"),
                   default="forward",
                   help="forward: pose -> distance; project: a whole "
                        "N-step projection solve")
    p.add_argument("--steps", type=int, default=10,
                   help="projection steps baked into a 'project' artifact")
    p.add_argument("--batch", type=int, default=None,
                   help="static batch size (default: symbolic — one "
                        "artifact, any batch)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering platforms, e.g. tpu,cpu "
                        "(default: current backend)")
    p.add_argument("--no-renorm", action="store_true",
                   help="reference-exact projection (no per-step renorm)")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantization of the DFNet's "
                        "wide layers before export (value path only; 2x "
                        "MXU rate on TPU, ~1%% MAE/std on the trained "
                        "checkpoint — ops/fused_int8.py)")
    p.add_argument("--calib", default=None, metavar="NPZ",
                   help="calibration poses for --int8 (npz key pose/"
                        "pose_body/quats; axis-angle or quaternions). "
                        "Default: 4096 uniform random poses, with a warning")
    p.add_argument("--save-quantized", default=None, metavar="PATH",
                   help="with --int8: also persist the quantized field "
                        "(QuantizedField.save msgpack; reload with "
                        "--quantized or QuantizedField.load)")
    p.add_argument("--quantized", default=None, metavar="PATH",
                   help="export from a SAVED quantized-field file instead "
                        "of quantizing --ckpt (implies --int8)")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("denoise", help="motion denoising with the field prior")
    _add_common(p)
    p.add_argument("--motion-data", required=True)
    p.add_argument("--gt-data", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--bm-path", default=None, help="SMPL model file (.pkl/.npz)")
    p.add_argument("--specs", choices=("reference", "balanced", "adaptive"),
                   default="reference",
                   help="anneal schedule: 'reference' = motion_denoise.py:31-34"
                        " exact; 'balanced' = gentler prior/temporal weights "
                        "for near-manifold inputs; 'adaptive' = per-clip "
                        "schedule scaled by the field's own noise estimate — "
                        "fixes the reference schedule's measured low-sigma "
                        "regression (docs/ARCHITECTURE.md §7)")
    _add_mesh_out(p, "./denoised")
    p.set_defaults(fn=cmd_denoise)

    p = sub.add_parser("partial", help="partial-observation completion")
    _add_common(p)
    p.add_argument("--motion-data", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--bm-path", default=None)
    p.add_argument("--max-frames", type=int, default=120)
    p.add_argument("--occluded-joints", type=int, nargs="+", default=None,
                   help="body-pose joint indices known to be unobserved; "
                        "anchors the data term to observed joints only "
                        "(observation_mask). Default: the reference's "
                        "anchor-everything behavior")
    p.add_argument("--mode", choices=("anchor", "inpaint", "retrieval"),
                   default="anchor",
                   help="'anchor': reference solve (occlusion-aware data "
                        "term with --occluded-joints); 'inpaint': freeze "
                        "observed dofs, complete only the occluded limb "
                        "(INPAINT_SPECS); 'retrieval': visible-joint-"
                        "weighted kNN splice against --corpus (the engine "
                        "measured best for structured occlusions — "
                        "docs/quality/partial_closed_loop.json)")
    p.add_argument("--corpus", default=None,
                   help=".npz of manifold poses ('pose' (N,21,4) quats) "
                        "for --mode retrieval")
    p.add_argument("--retrieval-k", type=int, default=5)
    p.add_argument("--temporal-window", type=int, default=5)
    _add_mesh_out(p, "./partial_out")
    p.set_defaults(fn=cmd_partial)

    p = sub.add_parser("interpolate", help="slerp + projection between poses")
    _add_common(p)
    p.add_argument("--num-steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pose-a", default=None, help=".npz endpoint (pose or pose_body)")
    p.add_argument("--pose-b", default=None, help=".npz endpoint (pose or pose_body)")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_interpolate)

    p = sub.add_parser("fit-image", help="image-based SMPL fitting with the prior")
    _add_common(p)
    p.add_argument("--image-folder", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--bm-path", default=None)
    p.add_argument("--prior-form", choices=("reference", "self"),
                   default="reference",
                   help="stage 2-3 prior weighting: 'reference' = linear "
                        "1e2*L/(1+it) (image_fitting.py:40); 'self' = the "
                        "denoise schedule's self-weighted 1e7*L^2/(1+it), "
                        "which escapes the measured zero-region pinning of "
                        "the linear form on trained relu-head fields "
                        "(docs/quality/fit_image_closed_loop.json)")
    _add_mesh_out(p, "the image folder")
    p.set_defaults(fn=cmd_fit_image)

    p = sub.add_parser("denoise-bench", help="motion-denoising benchmark sweep (HuMoR-style grid)")
    _add_common(p)
    p.add_argument("--data-root", required=True,
                   help="grid root: <root>/<level>/<seq>/observations.npz")
    p.add_argument("--synthesize", action="store_true",
                   help="fabricate a synthetic noise grid under --data-root first")
    p.add_argument("--family-seed", type=int, default=0,
                   help="with --synthesize: manifold-family seed; must match "
                        "the seed the checkpoint's synthetic training set was "
                        "written with (write_synthetic_dataset seed)")
    p.add_argument("--seqs-per-level", type=int, default=2)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--steps-per-iter", type=int, default=50)
    p.add_argument("--serial-clips", action="store_true",
                   help="solve clips one at a time instead of the default "
                        "batched vmapped solve per level (the escape hatch "
                        "if a shape hits a compiler issue under vmap; "
                        "results are equivalence-tested identical)")
    p.add_argument("--specs", choices=("reference", "balanced", "adaptive"),
                   default="reference",
                   help="anneal schedule for every solve in the sweep "
                        "(see `denoise --specs`)")
    p.add_argument("--bm-path", default=None)
    p.add_argument("--out", default=None, help="aggregate results .npz")
    p.set_defaults(fn=cmd_denoise_bench)

    p = sub.add_parser("prepare-data", help="AMASS sampling + kNN distance labeling")
    _add_common(p)
    p.add_argument("--amass-raw", required=True, help="raw AMASS root")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--stage", choices=["sample", "label", "all"], default="all")
    p.add_argument("--split", default="train")
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--runs", type=int, default=1000)
    p.add_argument("--k-candidates", type=int, default=0,
                   help="0 (default): exact single-stage top-k; >0: the "
                        "reference-shaped two-stage search (L2 candidate "
                        "prefilter of this width, then exact re-rank — "
                        "faiss k=500 in the reference)")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--metric", choices=["geo", "euc"], default="geo")
    p.add_argument("--weighted", action="store_true",
                   help="joint-rank-weighted distance (dist_utils.py:39)")
    p.add_argument("--space", choices=["quat", "joints"], default="quat",
                   help="candidate-search embedding: raw quats or SMPL FK joints")
    p.add_argument("--bm-path", default=None, help="SMPL model for --space joints")
    p.add_argument("--knn-precision",
                   choices=["auto", "highest", "high", "default", "fast"],
                   default="auto",
                   help="search engine: 'auto' (default) runs a measured "
                        "corpus-safety probe once per split and picks 'fast' "
                        "(2.4-3.4x) when the prescreen bound is tight on THIS "
                        "corpus, exact 'highest' otherwise — the probe "
                        "statistics are logged either way; 'highest' is "
                        "exact like faiss fp32; 'default' is single-pass "
                        "bf16, ~2x faster with ~1e-3 distance noise; 'fast' "
                        "forces the upper-bound prescreen + exact rerank "
                        "(see data/prepare.py::probe_fast_safety)")
    p.add_argument("--fused-knn", choices=["auto", "on", "off"],
                   default="auto",
                   help="single-kernel Pallas kNN search (auto: on-TPU exact "
                        "geodesic searches only; see ops/fused_knn.py)")
    p.add_argument("--per-pose-noise", action="store_true",
                   help="corrected noise sampling: an independent noise draw "
                        "per query pose. Default reproduces the reference "
                        "quirk — ONE (21,4) draw shared by every pose of a "
                        "sigma group (create_data.py:88)")
    p.add_argument("--structured-frac", type=float, default=0.0,
                   help="fraction of queries given LIMB-structured noise "
                        "(one random kinematic chain corrupted, others "
                        "clean) instead of the all-joint sigma grid — "
                        "trains fields that can SEE occlusion-class "
                        "corruption, which the reference noise family is "
                        "measurably blind to (ARCHITECTURE §7, partial "
                        "closed loop). 0.0 = reference-exact sampler")
    p.add_argument("--structured-sigma", type=float, nargs=2,
                   default=[0.3, 1.0],
                   help="per-query sigma range of structured chain noise")
    p.set_defaults(fn=cmd_prepare_data)

    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
