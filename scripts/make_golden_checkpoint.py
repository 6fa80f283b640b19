"""Build the committed golden checkpoint: a small PoseNDF trained on the
deterministic synthetic manifold, plus expected field distances.

    python scripts/make_golden_checkpoint.py          # writes examples/golden/

Purpose (round-3 brief item 8): gives ``generate``/``export``/``load_field``
an out-of-the-box demo that produces a NON-trivial field without licensed
data, and pins future refactors to an end-to-end numerical anchor beyond
fresh-init parity (``tests/test_golden.py``).

Everything is seeded; runs pinned to CPU so the artifact is reproducible
bit-for-bit across machines with the same jax/flax versions (the regression
test's tolerance absorbs backend drift, see tests/test_golden.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import flax.serialization as fser
import jax.numpy as jnp
import numpy as np

from posendf_tpu.config import PoseNDFConfig, save_config
from posendf_tpu.data.pipeline import TrainingBatcher
from posendf_tpu.data.synthetic import (
    synthetic_manifold_poses, write_synthetic_dataset)
from posendf_tpu.projection import random_poses
from posendf_tpu.training.trainer import Trainer

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "golden")
EPOCHS = 120


def golden_config(workdir: str) -> PoseNDFConfig:
    cfg = PoseNDFConfig()
    cfg.dfnet.dims = [64, 64]
    cfg.dfnet.act = cfg.strenc.act = "softplus"  # non-zero fresh field, no
    # dead-ReLU-head coin flip — the demo must show real distances
    cfg.train.optimizer_param = 1e-3
    cfg.train.batch_size = 2
    cfg.train.num_pts = 512
    cfg.train.max_epoch = EPOCHS
    cfg.experiment.root_dir = os.path.join(workdir, "runs")
    return cfg


def main():
    import tempfile

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    workdir = tempfile.mkdtemp(prefix="posendf_golden_")
    labeled, amass = write_synthetic_dataset(
        workdir, poses_per_seq=512, queries_per_seq=512, seed=0)

    cfg = golden_config(workdir)
    cfg.data.data_dir, cfg.data.amass_dir = labeled, amass
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=512,
                              seed=0)
    trainer = Trainer(cfg, mesh=None)
    trainer.fit(batcher, epochs=EPOCHS, log_every=20)

    # --- artifact 1: the checkpoint (load_field's plain-.msgpack layout) ---
    payload = {"epoch": EPOCHS, "state": {"params": trainer.params}}
    ckpt = os.path.join(GOLDEN_DIR, "golden.msgpack")
    with open(ckpt, "wb") as f:
        f.write(fser.to_bytes(payload))

    # --- artifact 2: the matching config ----------------------------------
    cfg_out = golden_config(".")  # no machine-local paths in the artifact
    cfg_out.data.data_dir = cfg_out.data.amass_dir = ""
    cfg_out.experiment.root_dir = "."
    save_config(cfg_out, os.path.join(GOLDEN_DIR, "golden.yaml"))

    # --- artifact 3: probe poses + expected distances ----------------------
    # the TRAINING manifold family: write_synthetic_dataset(seed=0) draws it
    # first thing from a fresh rng(0) — reproduce that draw so the
    # "near-manifold" probes actually lie on the learned surface
    from posendf_tpu.data.synthetic import manifold_family

    family = manifold_family(np.random.default_rng(0))
    rng = np.random.default_rng(7)
    on_manifold = synthetic_manifold_poses(rng, 64, family=family)
    off = np.asarray(random_poses(jax.random.key(7), 64))
    probes = np.concatenate([on_manifold, off]).astype(np.float32)
    dists = np.asarray(trainer.module.apply(
        {"params": trainer.params}, jnp.asarray(probes)))
    np.savez(os.path.join(GOLDEN_DIR, "expected.npz"),
             probes=probes, dist=dists)

    print(f"golden checkpoint: {ckpt} ({os.path.getsize(ckpt)} bytes)")
    print(f"  mean |d| on random probes:   {np.abs(dists[64:]).mean():.5f}")
    print(f"  mean |d| near the manifold:  {np.abs(dists[:64]).mean():.5f}")


if __name__ == "__main__":
    main()
