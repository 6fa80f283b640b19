"""Aux-subsystem tests: validation pass, metrics logging, profiling hooks,
euclidean re-rank metric, double-cover augmentation, positional encoding."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posendf_tpu.config import PoseNDFConfig
from posendf_tpu.data.pipeline import TrainingBatcher
from posendf_tpu.data.prepare import quat_doublecover
from posendf_tpu.data.synthetic import write_synthetic_dataset
from posendf_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("aux")
    return write_synthetic_dataset(str(root))


def test_validate_pass_and_metrics_log(dataset, tmp_path):
    labeled, amass = dataset
    cfg = PoseNDFConfig()
    cfg.data.data_dir, cfg.data.amass_dir = labeled, amass
    cfg.experiment.root_dir = str(tmp_path)
    cfg.dfnet.dims = [32]
    cfg.dfnet.act = cfg.strenc.act = "softplus"
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=32)
    trainer = Trainer(cfg)
    trainer.train_epoch(iter([batcher.sample_batch()]))
    stats = trainer.validate(iter([batcher.sample_batch()]))
    assert set(stats) >= {"total", "dist", "man_loss", "eikonal"}
    assert np.isfinite(stats["total"])

    with open(os.path.join(trainer.exp_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any("train/total" in l for l in lines)
    assert any("val/total" in l for l in lines)


def test_euclidean_rerank_matches_oracle(rng):
    from posendf_tpu.ops import euclidean_rerank

    q = rng.normal(size=(6, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c = rng.normal(size=(80, 21, 4)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    cand = jnp.tile(jnp.arange(80, dtype=jnp.int32)[None], (6, 1))
    d, i = euclidean_rerank(jnp.asarray(q), jnp.asarray(c), cand, k=5)
    ref = np.linalg.norm(q[:, None] - c[None], axis=-1).mean(-1)  # (6, 80)
    idx = np.argsort(ref, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(d), np.take_along_axis(ref, idx, 1), atol=1e-5)


def test_quat_doublecover(rng):
    q = rng.normal(size=(50, 21, 4)).astype(np.float32)
    out = quat_doublecover(q, samples=200, rng=np.random.default_rng(0))
    assert out.shape == q.shape
    flat_in, flat_out = q.reshape(-1, 4), out.reshape(-1, 4)
    flipped = (flat_in == -flat_out).all(axis=1)
    same = (flat_in == flat_out).all(axis=1)
    assert (flipped | same).all()
    assert flipped.sum() > 0


def test_positional_encoding():
    from posendf_tpu.models.pos_encoder import encoded_dim, positional_encoding

    x = jnp.asarray([[0.5, -1.0]])
    out = positional_encoding(x, num_frequencies=2)
    assert out.shape == (1, encoded_dim(2, 2))
    o = np.asarray(out[0])
    np.testing.assert_allclose(o[:2], [0.5, -1.0])
    np.testing.assert_allclose(o[2:4], np.sin([0.5, -1.0]), atol=1e-6)
    np.testing.assert_allclose(o[4:6], np.cos([0.5, -1.0]), atol=1e-6)
    np.testing.assert_allclose(o[6:8], np.sin([1.0, -2.0]), atol=1e-6)


def test_ff_enc_model_builds_and_runs(rng):
    cfg = PoseNDFConfig()
    cfg.dfnet.ff_enc = True
    cfg.dfnet.ff_freqs = 2
    cfg.dfnet.dims = [32]
    m = cfg.make_model()
    params = m.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    q = rng.normal(size=(4, 21, 4)).astype(np.float32)
    out = m.apply({"params": params}, jnp.asarray(q))
    assert out.shape == (4, 1)
    # input layer must expect the lifted dimension: 126 * (2*2+1)
    assert params["dfnet"]["w0"].shape[0] == 126 * 5


def test_profiling_utils(tmp_path):
    from posendf_tpu.utils import StepTimer, trace

    t = StepTimer()
    t.start()
    dt = t.stop()
    assert dt >= 0 and t.ema is not None
    with trace(None):  # no-op path
        pass


def test_manifold_family_latents():
    """The generalized L-latent manifold family (ARCHITECTURE §7: intrinsic
    dimension sets the clean 5-NN label floor; the 2-latent default must
    stay bit-identical so seeded round-3 artifacts reproduce)."""
    from posendf_tpu.data.synthetic import (manifold_family,
                                            synthetic_manifold_poses,
                                            synthetic_motion_sequence)

    # latents=2 reproduces the legacy inline construction draw-for-draw
    r = np.random.default_rng(123)
    axes = r.normal(size=(21, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    freq = r.uniform(0.15, 0.4, size=(21, 2))
    phase = r.uniform(0, 2 * np.pi, size=21)
    a2, f2, p2 = manifold_family(np.random.default_rng(123), 21,
                                 latents=2, freq_range=(0.15, 0.4))
    assert np.array_equal(axes, a2)
    assert np.array_equal(freq, f2)
    assert np.array_equal(phase, p2)

    # ...and the legacy pose stream too (golden-checkpoint reproducibility)
    fam = manifold_family(np.random.default_rng(5), 21)
    legacy = synthetic_manifold_poses(np.random.default_rng(9), 8, family=fam)
    again = synthetic_manifold_poses(np.random.default_rng(9), 8, family=fam)
    assert np.array_equal(legacy, again)

    # general-L family: unit quaternions, smooth sequences, weights 1/sqrt(L)
    for L in (1, 4, 6):
        famL = manifold_family(np.random.default_rng(7), 21, latents=L,
                               freq_range=(0.3, 0.8))
        assert famL[1].shape == (21, L) and famL[2].shape == (21, L)
        assert np.allclose(famL[3], 1.0 / np.sqrt(L))
        poses = synthetic_manifold_poses(np.random.default_rng(1), 16,
                                         family=famL)
        assert poses.shape == (16, 21, 4)
        assert np.allclose(np.linalg.norm(poses, axis=-1), 1.0, atol=1e-6)
        seq = synthetic_motion_sequence(np.random.default_rng(2), 24,
                                        family=famL)
        adj = 1.0 - np.abs(np.einsum("fjd,fjd->fj", seq[1:], seq[:-1]))
        assert adj.max() < 0.1  # temporally smooth (the property denoise needs)


def test_labeler_metric_variants(rng):
    from posendf_tpu.data.prepare import label_sequence
    from posendf_tpu.data.synthetic import synthetic_manifold_poses

    clean = synthetic_manifold_poses(rng, 32)
    corpus = synthetic_manifold_poses(rng, 64)
    for kwargs in ({"metric": "euc", "k_candidates": 64},
                   {"metric": "geo", "weighted": True},
                   {"metric": "geo", "k_candidates": 32}):
        lab = label_sequence(clean, corpus, num_queries=10, k=3,
                             rng=np.random.default_rng(0), **kwargs)
        assert lab["dist"].shape == (10, 3)
        assert (np.diff(lab["dist"], axis=1) >= -1e-6).all()


def test_weighted_exact_geodesic_topk(rng):
    """weighted=True with k_candidates=0 must be an EXACT weighted search."""
    from posendf_tpu.ops import geodesic_topk
    from posendf_tpu.quat import SMPL_JOINT_RANK
    import jax.numpy as jnp

    q = rng.normal(size=(5, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c = rng.normal(size=(120, 21, 4)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    w = np.asarray(SMPL_JOINT_RANK)
    w = (w / np.linalg.norm(w)).astype(np.float32)
    d, i = geodesic_topk(jnp.asarray(q), jnp.asarray(c), k=4,
                         corpus_tile=128, weights=jnp.asarray(w))
    dots = (q[:, None] * c[None]).sum(-1)
    geo = (w * (1 - np.abs(dots))).sum(-1)
    ref = np.sort(geo, axis=1)[:, :4]
    np.testing.assert_allclose(np.asarray(d), ref, atol=1e-5)


def test_reference_config_data_flip_honored(tmp_path):
    """Reference schema puts the flip switch under data: — it must reach
    train.flip (the pretrained flip_* experiments depend on it)."""
    import yaml

    from posendf_tpu.config import load_config

    raw = {"data": {"flip": True}, "train": {"batch_size": 2}}
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(raw))
    cfg = load_config(str(p))
    assert cfg.train.flip is True
    assert cfg.exp_name().startswith("flip_")


def test_prefetch_propagates_worker_errors():
    from posendf_tpu.data.pipeline import prefetch_to_device

    def bad_iterator():
        yield {"x": np.zeros(3, np.float32)}
        raise RuntimeError("corrupt file mid-epoch")

    stream = prefetch_to_device(bad_iterator())
    next(stream)
    with pytest.raises(RuntimeError, match="corrupt file"):
        list(stream)


def test_checkpoint_restore_rejects_changed_model_shapes(tmp_path):
    """flax.from_bytes silently returns the STORED shapes whatever the
    template says — restore() must catch the mismatch (model config changed
    under continue_train) and raise instead of handing back a wrong-shaped
    pytree or silently restarting from epoch 0."""
    import numpy as np
    import pytest

    from posendf_tpu.training.checkpoints import CheckpointStore

    store = CheckpointStore(str(tmp_path))
    store.save({"params": {"w": np.zeros((4, 4), np.float32)}}, epoch=3)
    # same shapes: restores fine
    out = store.restore({"params": {"w": np.ones((4, 4), np.float32)}})
    assert out is not None and out[1] == 3
    # changed shapes: hard error naming the offending leaf
    with pytest.raises(ValueError, match="shape"):
        store.restore({"params": {"w": np.ones((8, 8), np.float32)}})


def test_load_field_entry_point(tmp_path, rng):
    """posendf_tpu.load_field: the one-line switching path — fresh init,
    the reference's torch .tar, and this framework's .msgpack all produce a
    working Field with matching distances."""
    import os

    import jax
    import jax.numpy as jnp

    import posendf_tpu
    from posendf_tpu.training.torch_import import save_torch_checkpoint

    q = rng.normal(size=(6, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q)

    # fresh init, default config-of-record
    field = posendf_tpu.load_field()
    d0 = field.distance(q)
    assert d0.shape == (6, 1) and bool(jnp.all(d0 >= 0))

    # torch .tar round trip through load_field
    tar = str(tmp_path / "ref.tar")
    save_torch_checkpoint(tar, field.params, epoch=3)
    field_tar = posendf_tpu.load_field(tar)
    np.testing.assert_allclose(np.asarray(field_tar.distance(q)),
                               np.asarray(d0), atol=1e-6)

    # msgpack (the Trainer's checkpoint payload format)
    import flax.serialization as fser

    msg = str(tmp_path / "ckpt.msgpack")
    with open(msg, "wb") as f:
        f.write(fser.to_bytes({"epoch": 0, "state": {"params": field.params}}))
    field_msg = posendf_tpu.load_field(msg)
    np.testing.assert_allclose(np.asarray(field_msg.distance(q)),
                               np.asarray(d0), atol=1e-6)

    # config as a YAML path
    cfg_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "amass.yaml")
    field_cfg = posendf_tpu.load_field(tar, config=cfg_path)
    np.testing.assert_allclose(np.asarray(field_cfg.distance(q)),
                               np.asarray(d0), atol=1e-6)


def test_load_field_from_checkpoint_directory(tmp_path, rng):
    """load_field accepts a CheckpointStore DIRECTORY (the Trainer's rolling
    pair), auto-detecting msgpack vs orbax — the framework's own checkpoints
    must load through the advertised one-line entry point."""
    import jax
    import jax.numpy as jnp

    import posendf_tpu
    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.training.checkpoints import CheckpointStore
    from posendf_tpu.training.trainer import make_optimizer

    cfg = PoseNDFConfig()
    cfg.dfnet.dims = [24, 24]
    cfg.dfnet.act = "softplus"
    cfg.strenc.act = "softplus"
    module = cfg.make_model()
    params = module.init(jax.random.key(3), jnp.zeros((1, 21, 4)))["params"]
    # make the stored params distinguishable from a fresh init
    params = jax.tree.map(lambda l: l + 0.25, params)
    opt_state = make_optimizer(cfg.train.optimizer_param,
                               cfg.train.weight_decay).init(params)

    q = rng.normal(size=(5, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q)
    ref = np.asarray(module.apply({"params": params}, q))

    for backend in ("msgpack", "orbax"):
        d = str(tmp_path / backend)
        CheckpointStore(d, backend=backend).save(
            {"params": params, "opt_state": opt_state}, epoch=2)
        field = posendf_tpu.load_field(d, config=cfg)
        np.testing.assert_allclose(np.asarray(field.distance(q)), ref,
                                   atol=1e-6, err_msg=backend)

    # an empty directory is a clear error, not IsADirectoryError
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        posendf_tpu.load_field(empty, config=cfg)


def test_packaging_entry_point():
    """pyproject.toml ships a console script that resolves to the real CLI
    (the framework is pip-installable; reference surface: clone-only,
    INSTALL.md:14-31)."""
    tomllib = pytest.importorskip("tomllib")  # stdlib only on >= 3.11

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    target = meta["project"]["scripts"]["posendf"]
    mod_name, func_name = target.split(":")
    import importlib

    mod = importlib.import_module(mod_name)
    assert callable(getattr(mod, func_name))
    assert meta["project"]["name"] == "posendf-tpu"
