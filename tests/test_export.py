"""Serving export (posendf_tpu/export.py + `cli export`): artifact
round-trips through disk and reproduces the live model exactly.

The reference has no serving/export story (deployment = clone the repo and
torch.load the .tar); this is a beyond-parity capability, so the oracle is
our own live module, not upstream.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posendf_tpu.cli import main
from posendf_tpu.export import (export_forward, export_project,
                                load_artifact, save_artifact)
from posendf_tpu.models import PoseNDF
from posendf_tpu.projection import project

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "amass.yaml")


def _model(rng):
    module = PoseNDF(activation="softplus", dfnet_dims=(32, 48))
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    q = rng.normal(size=(12, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return module, params, jnp.asarray(q)


def test_forward_artifact_roundtrip_symbolic_batch(rng, tmp_path):
    module, params, q = _model(rng)
    exp = export_forward(module, params)  # symbolic batch
    path = str(tmp_path / "fwd.jaxexport")
    save_artifact(exp, path)
    loaded = load_artifact(path)
    ref = np.asarray(module.apply({"params": params}, q))
    np.testing.assert_allclose(np.asarray(loaded.call(q)), ref, atol=1e-6)
    # symbolic batch: the SAME artifact serves a different batch size
    q2 = q[:5]
    ref2 = np.asarray(module.apply({"params": params}, q2))
    np.testing.assert_allclose(np.asarray(loaded.call(q2)), ref2, atol=1e-6)


def test_forward_artifact_static_batch(rng, tmp_path):
    module, params, q = _model(rng)
    exp = export_forward(module, params, batch=12)
    path = str(tmp_path / "fwd12.jaxexport")
    save_artifact(exp, path)
    loaded = load_artifact(path)
    ref = np.asarray(module.apply({"params": params}, q))
    np.testing.assert_allclose(np.asarray(loaded.call(q)), ref, atol=1e-6)


def test_project_artifact_matches_live_solver(rng, tmp_path):
    module, params, q = _model(rng)
    exp = export_project(module, params, steps=5)
    path = str(tmp_path / "proj.jaxexport")
    save_artifact(exp, path)
    loaded = load_artifact(path)
    out, hist = loaded.call(q)
    ref_out, ref_hist = project(module, params, q, steps=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ref_hist),
                               atol=1e-6)


def test_load_rejects_foreign_files(tmp_path):
    path = str(tmp_path / "junk.bin")
    with open(path, "wb") as f:
        f.write(b"not an artifact")
    with pytest.raises(ValueError, match="artifact"):
        load_artifact(path)


def test_cli_export_and_serve(tmp_path, capsys):
    out = str(tmp_path / "model.jaxexport")
    main(["export", "-c", CFG, "--out", out, "--what", "forward"])
    assert "exported forward" in capsys.readouterr().out
    loaded = load_artifact(out)
    q = jnp.ones((3, 21, 4)) / 2.0
    d = loaded.call(q)
    assert d.shape == (3, 1)
    assert bool(jnp.all(d >= 0))


def test_export_fused_config_is_portable(rng, tmp_path):
    """A strenc.fused=true config (the flagship TPU serving setup) must
    still export: the artifact is staged through the portable XLA path
    (a Mosaic custom call cannot even trace on CPU and jax.export refuses
    it on TPU), with identical math."""
    from posendf_tpu.config import PoseNDFConfig

    cfg = PoseNDFConfig()
    cfg.dfnet.dims = [32, 48]
    cfg.dfnet.act = "softplus"
    cfg.strenc.act = "softplus"
    cfg.strenc.fused = True
    module = cfg.make_model()
    assert module.use_fused
    ref_module = module.clone(use_fused=False)
    params = ref_module.init(jax.random.key(0),
                             jnp.zeros((1, 21, 4)))["params"]
    q = rng.normal(size=(8, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q = jnp.asarray(q)

    exp = export_forward(module, params)
    path = str(tmp_path / "fused_cfg.jaxexport")
    save_artifact(exp, path)
    loaded = load_artifact(path)
    ref = np.asarray(ref_module.apply({"params": params}, q))
    np.testing.assert_allclose(np.asarray(loaded.call(q)), ref, atol=1e-6)


def test_load_field_fused_config_inits_on_cpu():
    """load_field must build params for a strenc.fused config without
    running the Pallas kernel (init through a non-fused clone)."""
    import posendf_tpu
    from posendf_tpu.config import PoseNDFConfig

    cfg = PoseNDFConfig()
    cfg.dfnet.dims = [16, 16]
    cfg.strenc.fused = True
    field = posendf_tpu.load_field(config=cfg)
    assert field.module.use_fused  # serving path keeps the fused module
    assert "enc" in field.params and "dfnet" in field.params
