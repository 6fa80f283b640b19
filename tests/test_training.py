"""End-to-end training tests on a synthetic manifold, sharded over the
virtual 8-device CPU mesh: loss decreases, checkpoints roll and resume,
projection onto the trained field reduces distances (the property the
reference prints at experiments/sample_poses.py:72)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posendf_tpu.config import PoseNDFConfig
from posendf_tpu.data.pipeline import TrainingBatcher
from posendf_tpu.data.synthetic import write_synthetic_dataset
from posendf_tpu.parallel import make_mesh
from posendf_tpu.training.trainer import Trainer


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    labeled, amass = write_synthetic_dataset(str(root))
    return labeled, amass


def _small_cfg(tmp_path, labeled, amass):
    cfg = PoseNDFConfig()
    cfg.data.data_dir = labeled
    cfg.data.amass_dir = amass
    cfg.experiment.root_dir = str(tmp_path)
    cfg.dfnet.dims = [64, 64]
    cfg.train.optimizer_param = 1e-3
    cfg.train.batch_size = 2
    cfg.train.num_pts = 128
    cfg.dfnet.act = "softplus"
    cfg.strenc.act = "softplus"
    return cfg


def test_training_loss_decreases_sharded(dataset, tmp_path):
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    mesh = make_mesh(("data",))
    assert mesh.devices.size == 8  # the virtual CPU mesh from conftest

    batcher = TrainingBatcher(
        labeled, amass, batch_size=cfg.train.batch_size, num_pts=cfg.train.num_pts, seed=0
    )
    trainer = Trainer(cfg, mesh=mesh)

    first = trainer.train_epoch(iter([batcher.sample_batch() for _ in range(4)]))
    for _ in range(8):
        trainer.epoch += 1
        last = trainer.train_epoch(iter([batcher.sample_batch() for _ in range(4)]))
    assert np.isfinite(last["total"])
    # total objective must improve; individual terms trade off (eikonal vs
    # dist), so only sanity-bound them
    assert last["total"] < first["total"]
    assert last["dist"] < 0.2 and last["man_loss"] < 0.2


def test_checkpoint_roll_and_resume(dataset, tmp_path):
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=64, seed=1)

    t1 = Trainer(cfg)
    t1.train_epoch(iter([batcher.sample_batch()]))
    t1.save()
    t1.epoch += 1
    t1.train_epoch(iter([batcher.sample_batch()]))
    t1.save()

    ckpt_dir = os.path.join(t1.exp_dir, "checkpoints")
    names = sorted(os.listdir(ckpt_dir))
    assert "checkpoint_latest.msgpack" in names
    assert "checkpoint_previous.msgpack" in names

    t2 = Trainer(cfg)  # continue_train=True by default -> resumes
    assert t2.epoch == t1.epoch + 1
    ref_leaf = jax.tree_util.tree_leaves(t1.params)[0]
    new_leaf = jax.tree_util.tree_leaves(t2.params)[0]
    np.testing.assert_array_equal(np.asarray(ref_leaf), np.asarray(new_leaf))


def test_projection_on_trained_field_reduces_distance(dataset, tmp_path):
    from posendf_tpu.projection import project

    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=256, seed=2)
    trainer = Trainer(cfg)
    for _ in range(20):
        trainer.train_epoch(iter([batcher.sample_batch() for _ in range(2)]))
        trainer.epoch += 1

    key = jax.random.key(0)
    noisy = jax.random.uniform(key, (32, 21, 4))
    noisy = noisy / jnp.linalg.norm(noisy, axis=-1, keepdims=True)
    out, hist = project(trainer.module, trainer.params, noisy, steps=20)
    assert float(hist[-1].mean()) < float(hist[0].mean())
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_batcher_shapes_and_label_semantics(dataset):
    labeled, amass = dataset
    b = TrainingBatcher(labeled, amass, batch_size=3, num_pts=50, seed=0)
    batch = b.sample_batch()
    assert batch["pose"].shape == (150, 21, 4)
    assert batch["dist"].shape == (150,)
    assert batch["man_poses"].shape == (150, 21, 4)
    # labels are means of k distances -> strictly positive for noisy poses
    assert (batch["dist"] > 0).all()
    assert batch["pose"].dtype == np.float32


def test_batcher_flip_reference_quirk_and_corrected(dataset):
    """flip=True default reproduces the reference bug (load_data.py:63):
    man_poses are the SAME flipped noisy rows, the AMASS file is never
    touched; flip_mode='corrected' flips the real manifold draws."""
    labeled, amass = dataset
    b = TrainingBatcher(labeled, amass, batch_size=2, num_pts=64, flip=True, seed=0)
    batch = b.sample_batch()
    assert (batch["pose"][..., 0] >= 0).all()
    assert (batch["man_poses"][..., 0] >= 0).all()
    np.testing.assert_array_equal(batch["man_poses"], batch["pose"])

    bc = TrainingBatcher(labeled, amass, batch_size=2, num_pts=64, flip=True,
                         flip_mode="corrected", seed=0)
    bc2 = bc.sample_batch()
    assert (bc2["man_poses"][..., 0] >= 0).all()
    assert not np.array_equal(bc2["man_poses"], bc2["pose"])


def test_epoch_visits_every_labeled_file_once(dataset):
    """epoch() is a seeded permutation over labeled files (the reference's
    DataLoader shuffle + drop_last coverage guarantee), reproducible from
    (seed, epoch), different across epochs."""
    labeled, amass = dataset
    b = TrainingBatcher(labeled, amass, batch_size=2, num_pts=8, seed=3)
    n_files = len(b.files.labeled)

    seen = []
    orig = b.sample_batch

    def spy(rng=None, lab_idx=None):
        seen.append(np.array(lab_idx))
        return orig(rng, lab_idx=lab_idx)

    b.sample_batch = spy
    list(b.epoch(0))
    visited = np.concatenate(seen)
    used = (n_files // b.batch_size) * b.batch_size  # drop_last
    assert len(visited) == used
    assert len(np.unique(visited)) == used  # each file at most once

    seen2 = []
    def spy2(rng=None, lab_idx=None):
        seen2.append(np.array(lab_idx))
        return orig(rng, lab_idx=lab_idx)
    b.sample_batch = spy2
    list(b.epoch(0))
    np.testing.assert_array_equal(np.concatenate(seen2), visited)  # keyed on (seed, epoch)


def test_orbax_checkpoint_backend(dataset, tmp_path):
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    cfg.train.ckpt_backend = "orbax"
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=32, seed=4)
    t1 = Trainer(cfg)
    t1.train_epoch(iter([batcher.sample_batch()]))
    t1.save()
    t1.epoch += 1
    t1.train_epoch(iter([batcher.sample_batch()]))
    t1.save()
    assert os.path.isdir(os.path.join(t1.exp_dir, "checkpoints", "latest"))
    assert os.path.isdir(os.path.join(t1.exp_dir, "checkpoints", "previous"))
    t2 = Trainer(cfg)
    assert t2.epoch == t1.epoch + 1
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t1.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(t2.params)[0]))


def test_remat_identical_values_and_grads(rng):
    """training_loss(remat=True) must produce the same total and parameter
    gradients as the default path up to recompute reassociation noise —
    jax.checkpoint only changes what the backward recomputes, never the math
    (the big-batch memory lever, docs/ARCHITECTURE.md section 5)."""
    import jax
    import jax.numpy as jnp

    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.losses import training_loss

    cfg = PoseNDFConfig()
    cfg.dfnet.act = "softplus"
    cfg.strenc.act = "softplus"
    module = cfg.make_model()
    params = module.init(jax.random.key(5), jnp.zeros((1, 21, 4)))["params"]
    B = 16
    pose = rng.normal(size=(B, 21, 4)).astype(np.float32)
    pose /= np.linalg.norm(pose, axis=-1, keepdims=True)
    man = rng.normal(size=(B, 21, 4)).astype(np.float32)
    man /= np.linalg.norm(man, axis=-1, keepdims=True)
    dist_gt = np.abs(rng.normal(size=B)).astype(np.float32)

    def loss(p, remat):
        return training_loss(module, p, jnp.asarray(pose), jnp.asarray(dist_gt),
                             jnp.asarray(man), remat=remat)[0]

    t0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    t1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(t1), float(t0), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-7),
        g0, g1)


def test_live_head_init_always_alive():
    """The reference's torch-default init leaves the lrelu/relu ReLU head
    DEAD (d == 0 everywhere, all gradients exactly zero) for ~1/3 of seeds
    — z_last is near-constant across poses and its sign is a coin flip.
    ``live_head=True`` replaces the final bias draw with +0.1 so training
    can always start. Checked across seeds where the default init is
    empirically dead."""
    from posendf_tpu.models import PoseNDF

    q = jax.random.normal(jax.random.key(99), (512, 21, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    dead_seeds = []
    for seed in range(4):
        m = PoseNDF(dfnet_dims=(32, 48, 16))
        p = m.init(jax.random.key(seed), jnp.zeros((1, 21, 4)))["params"]
        if float(jnp.max(m.apply({"params": p}, q))) == 0.0:
            dead_seeds.append(seed)
        m_live = PoseNDF(dfnet_dims=(32, 48, 16), live_head=True)
        p_live = m_live.init(jax.random.key(seed), jnp.zeros((1, 21, 4)))["params"]
        assert float(jnp.max(m_live.apply({"params": p_live}, q))) > 0.0
        # only the final bias differs from the default init
        np.testing.assert_array_equal(
            np.asarray(p_live["dfnet"]["b3"]), np.full((1,), 0.1, np.float32))
        np.testing.assert_array_equal(
            np.asarray(p_live["dfnet"]["w3"]), np.asarray(p["dfnet"]["w3"]))
    assert dead_seeds, "expected at least one dead default-init seed"


def test_dead_head_warning_fires_once(dataset, tmp_path):
    """A dead-at-init lrelu head (man_loss == 0, eikonal ~ 1 over a full
    epoch) must produce the RuntimeWarning pointing at dfnet.live_head —
    and only once per Trainer."""
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    cfg.dfnet.act = "lrelu"
    cfg.strenc.act = "lrelu"
    cfg.train.continue_train = False
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=64, seed=0)

    # find a dead init seed by probing the module directly
    module = cfg.make_model()
    q = jnp.asarray(batcher.sample_batch()["pose"])
    trainer = None
    for seed in range(8):
        p = module.init(jax.random.key(seed), jnp.zeros((1, 21, 4)))["params"]
        if float(jnp.max(module.apply({"params": p}, q))) == 0.0:
            trainer = Trainer(cfg)
            trainer.params = p
            trainer.opt_state = trainer.optimizer.init(p)
            break
    assert trainer is not None, "no dead seed found to exercise the warning"

    with pytest.warns(RuntimeWarning, match="live_head"):
        trainer.train_epoch(iter([batcher.sample_batch()]))
    # second epoch: no repeat warning
    import warnings as _warnings
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", RuntimeWarning)
        trainer.epoch += 1
        trainer.train_epoch(iter([batcher.sample_batch()]))


def test_live_head_trains_where_default_stalls(dataset, tmp_path):
    """End-to-end: with a dead default init the loss is frozen; flipping
    dfnet.live_head=true makes the same lrelu config train."""
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    cfg.dfnet.act = "lrelu"
    cfg.strenc.act = "lrelu"
    cfg.train.continue_train = False
    cfg.dfnet.live_head = True
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=128, seed=0)
    trainer = Trainer(cfg)
    batches = [batcher.sample_batch() for _ in range(3)]
    first = trainer.train_epoch(iter(batches))
    for _ in range(6):
        trainer.epoch += 1
        last = trainer.train_epoch(iter(batches))
    assert np.isfinite(last["total"])
    assert last["total"] < first["total"]


def test_default_file_glob_matches_reference_filter(tmp_path):
    """Default labeled-file filter is the reference's `*/*000.npz`
    (model/load_data.py:28): in a mixed directory only 000-suffixed shards
    train; an explicit `*/*.npz` sees everything; and when NO 000 shard
    exists the default falls back (with a warning) instead of erroring."""
    rng = np.random.default_rng(0)
    amass = tmp_path / "amass" / "ACCAD"
    amass.mkdir(parents=True)
    np.savez(amass / "clean.npz",
             pose=rng.normal(size=(16, 21, 4)).astype(np.float32))
    labeled = tmp_path / "labeled" / "ACCAD"
    labeled.mkdir(parents=True)
    for name in ("seqA_000.npz", "seqA_001.npz", "seqB_000.npz"):
        np.savez(labeled / name,
                 pose=rng.normal(size=(8, 21, 4)).astype(np.float32),
                 dist=rng.random(size=(8, 5)).astype(np.float32))

    b = TrainingBatcher(str(tmp_path / "labeled"), str(tmp_path / "amass"),
                        batch_size=1, num_pts=4)
    assert sorted(os.path.basename(f) for f in b.files.labeled) == [
        "seqA_000.npz", "seqB_000.npz"]

    b_all = TrainingBatcher(str(tmp_path / "labeled"), str(tmp_path / "amass"),
                            batch_size=1, num_pts=4, file_glob="*/*.npz")
    assert len(b_all.files.labeled) == 3

    os.remove(labeled / "seqA_000.npz")
    os.remove(labeled / "seqB_000.npz")
    with pytest.warns(UserWarning, match="000.npz"):
        b_fb = TrainingBatcher(str(tmp_path / "labeled"),
                               str(tmp_path / "amass"), batch_size=1, num_pts=4)
    assert [os.path.basename(f) for f in b_fb.files.labeled] == ["seqA_001.npz"]


def test_best_checkpoint_store_semantics(tmp_path):
    """save_best keeps the best-metric checkpoint only; best_info records
    epoch/metric; restore_best returns the retained state (the reference's
    'checkpoint_epoch_best.tar' is actually latest, train_posendf.py:147-156
    — here best is real)."""
    from posendf_tpu.training.checkpoints import CheckpointStore

    store = CheckpointStore(str(tmp_path / "ck"))
    s1 = {"params": {"w": np.ones((2, 2), np.float32)}}
    s2 = {"params": {"w": np.full((2, 2), 2.0, np.float32)}}
    s3 = {"params": {"w": np.full((2, 2), 3.0, np.float32)}}

    assert store.best_info() is None
    assert store.save_best(s1, epoch=0, metric=1.0) is not None
    assert store.save_best(s2, epoch=1, metric=1.5) is None  # worse (min)
    info = store.best_info()
    assert info["epoch"] == 0 and info["metric"] == 1.0
    assert store.save_best(s3, epoch=2, metric=0.5) is not None  # better
    info = store.best_info()
    assert info["epoch"] == 2 and info["metric"] == 0.5

    template = {"params": {"w": np.zeros((2, 2), np.float32)}}
    state, epoch = store.restore_best(template)
    assert epoch == 2
    np.testing.assert_array_equal(state["params"]["w"], s3["params"]["w"])

    # max mode (e.g. held-out correlation)
    store2 = CheckpointStore(str(tmp_path / "ck2"))
    assert store2.save_best(s1, epoch=0, metric=0.3, mode="max") is not None
    assert store2.save_best(s2, epoch=1, metric=0.2, mode="max") is None
    assert store2.save_best(s3, epoch=2, metric=0.9, mode="max") is not None
    assert store2.best_info()["metric"] == 0.9

    with pytest.raises(ValueError, match="mode"):
        store2.save_best(s1, epoch=3, metric=0.0, mode="bogus")


def test_fit_retains_best_and_early_stops(dataset, tmp_path, monkeypatch, capsys):
    """fit(val_batcher=...) retains the checkpoint at the best validation
    metric and stops after `early_stop_patience` consecutive non-improving
    validations — the guardrail for the measured training-length erosion
    (corr 0.961 @ 4k steps -> 0.359 @ 12k, docs/quality/)."""
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=32, seed=3)
    trainer = Trainer(cfg)

    # scripted validation losses: best at epoch 1, then strictly worse
    script = iter([1.0, 0.5, 0.7, 0.8, 0.9, 0.95])
    best_params_snapshot = {}

    def fake_validate(batches):
        list(batches)  # drain like the real one
        m = next(script)
        if m == 0.5:
            best_params_snapshot["params"] = jax.device_get(trainer.params)
        return {"total": m, "dist": m, "man_loss": m, "eikonal": m}

    monkeypatch.setattr(trainer, "validate", fake_validate)
    trainer.fit(batcher, epochs=6, val_batcher=batcher, val_every=1,
                val_batches=1, early_stop_patience=2)

    # early stop: epochs 0..4 ran (best @1, stale @2, stale @3 -> stop)
    assert trainer.epoch == 4
    info = trainer.store.best_info()
    assert info["metric"] == 0.5 and info["epoch"] == 1
    out = capsys.readouterr().out
    assert "early stop" in out

    # the retained best equals the params as they were at that validation
    epoch = trainer.restore_best()
    assert epoch == 1
    ref = jax.tree_util.tree_leaves(best_params_snapshot["params"])[0]
    got = jax.tree_util.tree_leaves(jax.device_get(trainer.params))[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fit_rejects_nonpositive_val_every(dataset, tmp_path):
    """--val-every 0 must fail loudly up front, not ZeroDivisionError after
    paying for a full training epoch."""
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=32, seed=3)
    trainer = Trainer(cfg)
    with pytest.raises(ValueError, match="val_every"):
        trainer.fit(batcher, epochs=1, val_batcher=batcher, val_every=0)


def test_best_info_invalidates_on_meta_weights_desync(tmp_path):
    """A meta JSON whose stamp doesn't match the weights on disk (crash
    between the two os.replace calls in save_best) reads as absent, so the
    next save_best rewrites both instead of mis-attributing a metric."""
    from posendf_tpu.training.checkpoints import BEST, CheckpointStore

    store = CheckpointStore(str(tmp_path), backend="msgpack")
    s = {"params": {"w": np.ones((2,), np.float32)}}
    assert store.save_best(s, epoch=0, metric=1.0) is not None
    assert store.best_info()["metric"] == 1.0
    # simulate the desync: weights replaced, meta not yet
    with open(os.path.join(str(tmp_path), BEST), "ab") as f:
        f.write(b"x")
    assert store.best_info() is None
    # and a worse-than-recorded candidate now saves (meta was untrusted)
    assert store.save_best(s, epoch=1, metric=2.0) is not None
    assert store.best_info()["metric"] == 2.0


def test_best_info_stamp_covers_orbax_backend(tmp_path):
    """The desync stamp must work when 'best' is an orbax DIRECTORY, not a
    file: a replaced weights dir (fresh mtime) invalidates the stale meta,
    and the full save_best -> best_info -> restore_best cycle round-trips."""
    pytest.importorskip("orbax.checkpoint")
    from posendf_tpu.training.checkpoints import CheckpointStore

    store = CheckpointStore(str(tmp_path), backend="orbax")
    s = {"params": {"w": np.full((3,), 2.0, np.float32)}}
    assert store.save_best(s, epoch=5, metric=0.5) is not None
    info = store.best_info()
    assert info["metric"] == 0.5 and info["epoch"] == 5
    restored, epoch = store.restore_best({"params": {"w": np.zeros((3,), np.float32)}})
    assert epoch == 5
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.full((3,), 2.0, np.float32))
    # crash-between-replaces simulation: the weights dir was re-created
    # (new mtime) but the meta JSON still describes the old one
    os.utime(os.path.join(str(tmp_path), "best"))
    assert store.best_info() is None
    # self-heal: an otherwise-worse candidate saves because meta is untrusted
    assert store.save_best(s, epoch=6, metric=0.9) is not None
    assert store.best_info()["metric"] == 0.9


def test_save_best_nan_metric_never_retained(tmp_path):
    """A NaN metric must never become the stored best: every later finite
    metric would compare False against NaN and never be saved, permanently
    freezing a diverged checkpoint as 'best'. And a NaN already on disk
    (e.g. written by an older build) reads as absent so the first finite
    validation replaces it."""
    import json

    from posendf_tpu.training.checkpoints import BEST_META, CheckpointStore

    store = CheckpointStore(str(tmp_path), backend="msgpack")
    s = {"params": {"w": np.ones((2,), np.float32)}}

    # NaN candidate: refused, best_info stays empty
    assert store.save_best(s, epoch=0, metric=float("nan")) is None
    assert store.best_info() is None

    # finite then NaN: NaN still refused, finite best survives
    assert store.save_best(s, epoch=1, metric=1.0) is not None
    assert store.save_best(s, epoch=2, metric=float("nan")) is None
    assert store.best_info()["metric"] == 1.0

    # NaN on disk (legacy artifact): treated as absent, finite overwrites
    meta_path = os.path.join(str(tmp_path), BEST_META)
    with open(meta_path) as f:
        meta = json.load(f)
    meta["metric"] = float("nan")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    assert store.save_best(s, epoch=3, metric=5.0) is not None
    assert store.best_info()["metric"] == 5.0


def test_fit_nan_validation_counts_stale_not_best(dataset, tmp_path, monkeypatch):
    """A transiently-NaN validation mid-run must not be retained as best nor
    reset the early-stop counter; the later finite improvement is retained."""
    labeled, amass = dataset
    cfg = _small_cfg(tmp_path, labeled, amass)
    batcher = TrainingBatcher(labeled, amass, batch_size=2, num_pts=32, seed=3)
    trainer = Trainer(cfg)

    script = iter([float("nan"), 0.8, 0.4])

    def fake_validate(batches):
        list(batches)
        m = next(script)
        return {"total": m, "dist": m, "man_loss": m, "eikonal": m}

    monkeypatch.setattr(trainer, "validate", fake_validate)
    trainer.fit(batcher, epochs=3, val_batcher=batcher, val_every=1,
                val_batches=1, early_stop_patience=5)
    info = trainer.store.best_info()
    assert info is not None
    assert info["metric"] == 0.4 and info["epoch"] == 2
