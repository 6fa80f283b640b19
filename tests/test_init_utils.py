"""moment_matched_head_init: the from-scratch recipe that avoids the
dead-ReLU-head attractor (training/init_utils.py; measured rationale there).

The contract under test: after matching, (a) the unclamped head
pre-activation has the LABEL distribution's moments — std equal, mean just
under the label mean — so the initial dist-L1 force is differential instead
of a uniform push into the ReLU dead zone; (b) a live fraction of probe
poses predicts > 0; (c) trained-checkpoint behavior is untouched (the
utility only rescales the existing draw, it never changes tree structure)."""

import numpy as np
import jax
import jax.numpy as jnp

from posendf_tpu.config import PoseNDFConfig
from posendf_tpu.projection import random_poses
from posendf_tpu.training import he_gain, moment_matched_head_init


def _fresh(act="lrelu", dims=(64, 64, 32)):
    cfg = PoseNDFConfig()
    cfg.dfnet.dims = list(dims)
    cfg.dfnet.act = act
    cfg.strenc.act = act
    module = cfg.make_model()
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    return module, params


def test_he_gain_scales_weights_only():
    _, params = _fresh()
    gained = he_gain(params)
    for top, sub in params.items():
        for k, v in sub.items():
            got = np.asarray(gained[top][k])
            want = np.asarray(v) * (np.sqrt(6.0) if k.startswith("w") else 1.0)
            np.testing.assert_allclose(got, want, rtol=1e-6)


def test_matched_head_hits_label_moments():
    module, params = _fresh()
    poses = random_poses(jax.random.key(1), 512)
    rng = np.random.default_rng(2)
    labels = np.abs(rng.normal(0.02, 0.025, size=512)).astype(np.float32)

    new_params, stats = moment_matched_head_init(module, params, poses, labels)

    # tree structure unchanged (optimizer-state compatible)
    assert jax.tree_util.tree_structure(new_params) == jax.tree_util.tree_structure(params)

    # re-measure the unclamped pre-activation of the matched params
    li = max(int(k[1:]) for k in new_params["dfnet"] if k[0] == "w")
    shifted = dict(new_params, dfnet=dict(
        new_params["dfnet"],
        **{f"b{li}": new_params["dfnet"][f"b{li}"] + 100.0}))
    z = np.asarray(module.apply({"params": shifted}, poses) - 100.0).ravel()

    assert abs(z.std() - labels.std()) < 0.25 * labels.std()
    # mean sits under the label mean (the anti-dead-zone asymmetry) but
    # not far under
    assert z.mean() < labels.mean()
    assert z.mean() > labels.mean() - 2.0 * labels.std()
    # a healthy live fraction right at init
    pred = np.asarray(module.apply({"params": new_params}, poses)).ravel()
    assert (pred > 0).mean() > 0.2
    assert stats["scale"] < 1.0  # the fresh spread always dwarfs kNN labels


def test_trainer_matched_head_init(tmp_path):
    from posendf_tpu.data.pipeline import TrainingBatcher
    from posendf_tpu.data.synthetic import write_synthetic_dataset
    from posendf_tpu.training.trainer import Trainer

    labeled, amass = write_synthetic_dataset(str(tmp_path / "synth"))
    cfg = PoseNDFConfig()
    cfg.data.data_dir, cfg.data.amass_dir = labeled, amass
    cfg.experiment.root_dir = str(tmp_path / "exp")
    cfg.dfnet.dims = [64, 64]
    cfg.train.batch_size = 2
    cfg.train.num_pts = 128
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=128, seed=0)

    trainer = Trainer(cfg)
    stats = trainer.matched_head_init(batcher.sample_batch())
    assert stats is not None and stats["scale"] < 1.0
    # optimizer state was rebuilt for the new params; a step must run clean
    m = trainer.train_epoch(iter([batcher.sample_batch() for _ in range(2)]))
    assert np.isfinite(m["total"])

    # resume guard: epochs > 0 means trained weights — never clobber them
    trainer.epoch = 3
    assert trainer.matched_head_init(batcher.sample_batch()) is None
