"""Multi-chip demo: every sharded code path on one mesh, end to end.

The reference has no distributed machinery at all (SURVEY.md §2.2 — one GPU
plus a Slurm shell fan-out for data prep). This demo walks the framework's
multi-chip surface on whatever devices exist:

    # 8 virtual CPU devices (no TPU needed):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py

    # or on a real TPU pod slice: just run it; the mesh spans all chips.

Stages (all hermetic — synthetic manifold + synthetic body model):
  1. mesh-sharded kNN labeling: queries split over the ``data`` axis, the
     corpus replicated, zero collectives (the Slurm-fan-out replacement);
  2. SPMD training: params replicated, batch sharded, XLA inserts the one
     gradient all-reduce over ICI;
  3. frame-sharded motion denoising: frames split over the mesh; the
     temporal loss's 1-frame halo is handled by the SPMD partitioner
     (the explicit ppermute formulation is parallel/halo.py);
  4. sharded batch projection of random poses onto the learned manifold.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax

    # honor JAX_PLATFORMS even where site startup pins a platform list
    # before user code runs (the env var alone is ignored then; see
    # tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    import jax.numpy as jnp

    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.data.pipeline import TrainingBatcher
    from posendf_tpu.data.prepare import label_sequence
    from posendf_tpu.data.synthetic import write_synthetic_dataset
    from posendf_tpu.experiments import MotionDenoiser
    from posendf_tpu.parallel import data_sharding, make_mesh
    from posendf_tpu.projection import project, random_poses
    from posendf_tpu.quat import quaternion_to_axis_angle
    from posendf_tpu.smpl import BodyModel, synthetic_model
    from posendf_tpu.training.trainer import Trainer

    mesh = make_mesh(("data",))
    n = mesh.devices.size
    print(f"== mesh: {n} x {mesh.devices.flat[0].platform} over axis 'data'")

    workdir = args.workdir or tempfile.mkdtemp(prefix="posendf_multichip_")

    # ---- 1. mesh-sharded kNN labeling --------------------------------------
    labeled, amass = write_synthetic_dataset(workdir)
    rng = np.random.default_rng(0)
    corpus = rng.random((4096, 21, 4)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    clean = corpus[:256]
    out = label_sequence(clean, jnp.asarray(corpus), num_queries=n * 64, k=5,
                         mesh=mesh, rng=rng)
    print(f"== 1. sharded labeling: {out['pose'].shape[0]} queries x "
          f"{len(corpus)} corpus -> dist {out['dist'].shape}, "
          f"mean top-1 {out['dist'][:, 0].mean():.4f}")

    # ---- 2. SPMD training ---------------------------------------------------
    cfg = PoseNDFConfig()
    cfg.data.data_dir, cfg.data.amass_dir = labeled, amass
    cfg.experiment.root_dir = workdir
    cfg.dfnet.dims = [64, 64]
    cfg.dfnet.act = "softplus"
    cfg.strenc.act = "softplus"
    cfg.train.optimizer_param = 1e-3
    cfg.train.continue_train = False
    trainer = Trainer(cfg, mesh=mesh)
    batcher = TrainingBatcher(labeled, amass, batch_size=2,
                              num_pts=64 * n, seed=0)
    stats = None
    for _ in range(max(args.epochs, 1)):
        stats = trainer.train_epoch(iter([batcher.sample_batch()
                                          for _ in range(2)]))
        trainer.epoch += 1
    print(f"== 2. SPMD training ({max(args.epochs, 1)} epochs): total="
          f"{stats['total']:.5f} dist={stats['dist']:.5f}")

    # ---- 3. frame-sharded denoising ----------------------------------------
    body = BodyModel(model=synthetic_model(num_vertices=96, seed=1))
    den = MotionDenoiser(trainer.module, trainer.params, body)
    frames = 8 * n  # divisible by the mesh so frames shard evenly
    noisy = jnp.asarray(rng.normal(scale=0.1, size=(frames, 69))
                        .astype(np.float32))
    out_pose, metrics = den.optimize(noisy, iterations=3, steps_per_iter=10,
                                     mesh=mesh)
    print(f"== 3. frame-sharded denoise ({frames} frames over {n} devices): "
          f"final prior {metrics['final_pose_pr']:.5f}, moved "
          f"{metrics['v2v_vs_input_cm']:.3f} cm v2v from the noisy input")

    # ---- 4. sharded projection ----------------------------------------------
    poses = random_poses(jax.random.key(1), 128 * n)
    poses = jax.device_put(poses, data_sharding(mesh))
    projected, hist = project(trainer.module, trainer.params, poses, steps=20)
    print(f"== 4. sharded projection ({poses.shape[0]} poses): mean distance "
          f"{float(hist[0].mean()):.5f} -> {float(hist[-1].mean()):.5f}")
    print("== done")


if __name__ == "__main__":
    main()
