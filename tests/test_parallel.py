"""Multi-device sharding tests on the virtual 8-device CPU mesh: halo
exchange equivalence, data-sharded forward/kNN consistency, and the
dryrun_multichip driver contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posendf_tpu.parallel import data_sharding, make_mesh
from posendf_tpu.parallel.halo import adjacent_difference_sharded, temporal_loss_sharded


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("seq",))


def test_halo_adjacent_difference_matches_unsharded(mesh, rng):
    x = jnp.asarray(rng.normal(size=(32, 12, 3)).astype(np.float32))
    xs = jax.device_put(x, data_sharding(mesh, "seq"))
    ref = np.asarray(x[:-1] - x[1:])
    out = np.asarray(adjacent_difference_sharded(xs, mesh, "seq"))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_halo_temporal_loss_matches_unsharded(mesh, rng):
    v = jnp.asarray(rng.normal(size=(16, 40, 3)).astype(np.float32))
    vs = jax.device_put(v, data_sharding(mesh, "seq"))
    ref = float(jnp.mean(jnp.sqrt(jnp.sum((v[:-1] - v[1:]) ** 2, -1) + 1e-12)))
    out = float(temporal_loss_sharded(vs, mesh, "seq"))
    assert abs(out - ref) < 1e-6


def test_sharded_forward_matches_single_device(rng):
    from posendf_tpu.models import PoseNDF

    mesh = make_mesh(("data",))
    module = PoseNDF(dfnet_dims=(32, 32), activation="softplus")
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    pose = rng.normal(size=(64, 21, 4)).astype(np.float32)
    pose /= np.linalg.norm(pose, axis=-1, keepdims=True)
    ref = np.asarray(module.apply({"params": params}, jnp.asarray(pose)))
    sharded = jax.device_put(jnp.asarray(pose), data_sharding(mesh))
    out = np.asarray(jax.jit(lambda p: module.apply({"params": params}, p))(sharded))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_knn_matches_single_device(rng):
    from posendf_tpu.ops import geodesic_topk

    mesh = make_mesh(("data",))
    q = rng.normal(size=(40, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c = rng.normal(size=(300, 21, 4)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    d_ref, _ = geodesic_topk(jnp.asarray(q), jnp.asarray(c), k=5, corpus_tile=128)
    qs = jax.device_put(jnp.asarray(q), data_sharding(mesh))
    d, _ = geodesic_topk(qs, jnp.asarray(c), k=5, corpus_tile=128)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


def test_dryrun_multichip_contract():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_child_env_strips_axon_plugin():
    """The CPU-pinned dryrun child must not be able to load the remote-TPU
    plugin: round-3's driver artifact went red on an axon libtpu
    client/terminal skew that a CPU-only check must never see."""
    import __graft_entry__ as g

    base = {"PYTHONPATH": "/root/.axon_site:/some/other/dir",
            "XLA_FLAGS": "", "HOME": "/root"}
    env = g._dryrun_child_env(base, 8)
    assert ".axon_site" not in env.get("PYTHONPATH", "")
    assert "/some/other/dir" in env["PYTHONPATH"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert env["_POSENDF_DRYRUN_CHILD"] == "1"
    # PYTHONPATH that is ONLY the axon site is dropped entirely
    env2 = g._dryrun_child_env({"PYTHONPATH": "/root/.axon_site"}, 4)
    assert "PYTHONPATH" not in env2


def test_dryrun_child_jax_backends_exclude_axon():
    """A real child process under the dryrun env must see ONLY the cpu
    backend — the axon PJRT plugin (registered by the .axon_site
    sitecustomize) must be unloadable there."""
    import os
    import subprocess
    import sys

    import __graft_entry__ as g

    env = g._dryrun_child_env(os.environ, 2)
    code = ("import jax; import jax._src.xla_bridge as xb; "
            "names = sorted(xb.backends()); print('BACKENDS', names)")
    proc = subprocess.run([sys.executable, "-c", code],
                          env=env, capture_output=True, text=True,
                          timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BACKENDS" in proc.stdout
    assert "axon" not in proc.stdout, proc.stdout
    assert "cpu" in proc.stdout


def test_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0], 1)
    assert np.isfinite(np.asarray(out)).all()


def test_frame_sharded_denoise_matches_unsharded(rng):
    """Motion denoising with frames sharded over the mesh must match the
    single-device solve (the temporal halo is handled by the partitioner)."""
    from posendf_tpu.experiments import MotionDenoiser
    from posendf_tpu.models import PoseNDF
    from posendf_tpu.smpl import BodyModel, synthetic_model

    module = PoseNDF(dfnet_dims=(32,), activation="softplus")
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    body = BodyModel(model=synthetic_model(num_vertices=64, seed=2))
    noisy = jnp.asarray(rng.normal(scale=0.2, size=(16, 69)).astype(np.float32))

    den = MotionDenoiser(module, params, body)
    pose_ref, m_ref = den.optimize(noisy, iterations=1, steps_per_iter=4)
    mesh = make_mesh(("data",))
    pose_sh, m_sh = den.optimize(noisy, iterations=1, steps_per_iter=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(pose_sh), np.asarray(pose_ref),
                               atol=1e-4, rtol=1e-4)
    assert abs(m_sh["final_pose_pr"] - m_ref["final_pose_pr"]) < 1e-5


def test_mesh_sharded_labeling_matches_single_device(rng):
    from posendf_tpu.data.prepare import label_sequence
    from posendf_tpu.data.synthetic import synthetic_manifold_poses

    clean = synthetic_manifold_poses(rng, 32)
    corpus = synthetic_manifold_poses(rng, 128)
    ref = label_sequence(clean, corpus, num_queries=40, k=3,
                         rng=np.random.default_rng(1))
    mesh = make_mesh(("data",))
    out = label_sequence(clean, corpus, num_queries=40, k=3,
                         rng=np.random.default_rng(1), mesh=mesh)
    np.testing.assert_allclose(out["dist"], ref["dist"], atol=1e-6)
    np.testing.assert_array_equal(out["pose"], ref["pose"])


def test_sharded_projection_matches_single_device(rng):
    from posendf_tpu.models import PoseNDF
    from posendf_tpu.projection import project

    mesh = make_mesh(("data",))
    module = PoseNDF(dfnet_dims=(32,), activation="softplus")
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    poses = rng.normal(size=(64, 21, 4)).astype(np.float32)
    poses /= np.linalg.norm(poses, axis=-1, keepdims=True)
    ref, ref_hist = project(module, params, jnp.asarray(poses), steps=5)
    sharded = jax.device_put(jnp.asarray(poses), data_sharding(mesh))
    out, hist = project(module, params, sharded, steps=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ref_hist), atol=1e-6)


def test_init_distributed_single_host():
    """init_distributed is safe and idempotent on a single host: returns
    process index 0 (whether the coordination service starts or local-only
    mode falls back) and leaves the device mesh usable."""
    from posendf_tpu.parallel import init_distributed, make_mesh

    assert init_distributed() == 0
    assert init_distributed() == 0  # second call: no-op
    mesh = make_mesh(("data",))
    assert mesh.devices.size >= 1
