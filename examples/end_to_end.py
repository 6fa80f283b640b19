"""End-to-end demo: manufacture data -> train -> project -> denoise ->
complete an occluded limb.

Runs hermetically (synthetic manifold + synthetic body model, no licensed
data) on CPU or TPU:

    python examples/end_to_end.py [--epochs 40] [--workdir DIR]

Walks the full product surface: the data pipeline labels noisy poses with
exact kNN geodesic distances, the trainer fits the field (sharded over all
local devices), random quaternions project onto the learned manifold
(distances drop), and a noisy motion sequence denoises under the trained
prior.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.data.pipeline import TrainingBatcher
    from posendf_tpu.data.synthetic import write_synthetic_dataset
    from posendf_tpu.experiments import MotionDenoiser
    from posendf_tpu.parallel import make_mesh
    from posendf_tpu.projection import project, random_poses
    from posendf_tpu.quat import quaternion_to_axis_angle
    from posendf_tpu.smpl import BodyModel
    from posendf_tpu.training.trainer import Trainer

    workdir = args.workdir or tempfile.mkdtemp(prefix="posendf_demo_")
    print(f"== workdir {workdir}; devices: {jax.devices()}")

    print("== 1. manufacturing synthetic dataset (clean manifold + kNN-labeled noisy poses)")
    labeled, amass = write_synthetic_dataset(
        workdir, poses_per_seq=512, queries_per_seq=512)

    cfg = PoseNDFConfig()
    cfg.data.data_dir, cfg.data.amass_dir = labeled, amass
    cfg.experiment.root_dir = os.path.join(workdir, "runs")
    cfg.dfnet.dims = [64, 64]
    cfg.dfnet.act = cfg.strenc.act = "softplus"
    cfg.train.optimizer_param = 1e-3
    cfg.train.batch_size = 2
    cfg.train.num_pts = 256

    print(f"== 2. training {args.epochs} epochs (mesh over {len(jax.devices())} device(s))")
    mesh = make_mesh(("data",))
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=512)
    trainer = Trainer(cfg, mesh=mesh)
    trainer.fit(batcher, epochs=args.epochs, log_every=10)

    print("== 3. projecting 64 random poses onto the learned manifold")
    from posendf_tpu.data.synthetic import synthetic_manifold_poses

    noisy = random_poses(jax.random.key(0), 64)
    out, hist = project(trainer.module, trainer.params, noisy, steps=20)
    print(f"   mean field distance: {float(hist[0].mean()):.5f} -> {float(hist[-1].mean()):.5f}")
    assert float(hist[-1].mean()) < float(hist[0].mean())

    print("== 4. denoising a 12-frame synthetic motion under the trained prior")

    rng = np.random.default_rng(0)
    clean = synthetic_manifold_poses(rng, 12)
    aa = np.asarray(quaternion_to_axis_angle(jnp.asarray(clean))).reshape(12, 63)
    noisy_seq = aa + 0.1 * rng.standard_normal(aa.shape).astype(np.float32)
    body = BodyModel()  # synthetic stand-in; pass bm_path= for real SMPL
    denoiser = MotionDenoiser(trainer.module, trainer.params, body)
    _, metrics = denoiser.optimize(
        jnp.asarray(noisy_seq), jnp.asarray(aa), iterations=3, steps_per_iter=10)
    print(f"   v2v vs ground truth: {metrics['v2v_cm']:.3f} cm "
          f"(prior at end: {metrics['final_pose_pr']:.5f})")

    print("== 5. completing an occluded limb by visible-joint retrieval")
    # partial observation: the tracker lost the left arm — complete it by
    # matching the OBSERVED joints against the clean manifold corpus
    # (experiments/partial.py::complete_by_retrieval; the engine the
    # closed-loop benchmark measures best for structured occlusions)
    from posendf_tpu.data.prepare import build_corpus
    from posendf_tpu.experiments.partial import complete_by_retrieval

    corpus, _ = build_corpus(amass, ("ACCAD", "CMU"))
    occ = [12, 15, 17, 19]  # l_collar, l_shoulder, l_elbow, l_wrist
    observed = clean.copy()
    observed[:, occ] += rng.standard_normal((12, len(occ), 4)).astype(np.float32)
    observed[:, occ] /= np.linalg.norm(observed[:, occ], axis=-1, keepdims=True)
    completed = complete_by_retrieval(corpus, observed, occ, k=5)

    def occ_err(q):
        return float(np.mean(1 - np.abs(np.sum(q[:, occ] * clean[:, occ], -1))))

    print(f"   occluded-joint geodesic error: {occ_err(observed):.4f} -> "
          f"{occ_err(completed):.4f} (visible joints bit-exact)")
    assert occ_err(completed) < occ_err(observed)
    print("== done")


if __name__ == "__main__":
    main()
