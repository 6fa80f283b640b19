"""Fused value-and-grad Pallas kernel vs the XLA vjp path.

The kernel (``ops/fused_grad.py``) computes d(q) AND grad_q d(q) in one
program — the solver fast path for projection (reference loop
``experiments/sample_poses.py:70-74``) and the experiment optimizers. These
tests run it in Pallas interpret mode on the CPU backend and require exact
agreement (same math graph, fp32) with ``field.distance_and_grad``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from posendf_tpu.config import PoseNDFConfig
from posendf_tpu.field import Field, distance_and_grad
from posendf_tpu.ops.fused_grad import fused_distance_and_grad
from posendf_tpu.projection import project


@pytest.fixture(scope="module")
def model():
    cfg = PoseNDFConfig()
    module = cfg.make_model()
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    return module, params


def _poses(rng, n):
    q = rng.normal(size=(n, 21, 4)).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_fused_grad_matches_vjp(model, rng):
    module, params = model
    q = _poses(rng, 300)  # non-multiple of tile exercises the padding path
    d_ref, g_ref = distance_and_grad(module, params, q)
    with pltpu.force_tpu_interpret_mode():
        d, g = fused_distance_and_grad(
            q, params["enc"], params["dfnet"], parents=module.parents,
            tile_b=128)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


@pytest.mark.parametrize("act", ["relu", "softplus"])
def test_fused_grad_activations(rng, act):
    cfg = PoseNDFConfig()
    cfg.dfnet.act = act
    cfg.strenc.act = act
    module = cfg.make_model()
    params = module.init(jax.random.key(1), jnp.zeros((1, 21, 4)))["params"]
    q = _poses(rng, 128)
    d_ref, g_ref = distance_and_grad(module, params, q)
    with pltpu.force_tpu_interpret_mode():
        d, g = fused_distance_and_grad(
            q, params["enc"], params["dfnet"], parents=module.parents,
            activation=act, beta=module.beta, tile_b=128)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_field_fused_api(model, rng):
    module, params = model
    q = _poses(rng, 128)
    field = Field(module, params)
    d_ref, g_ref = field.distance_and_grad(q)
    with pltpu.force_tpu_interpret_mode():
        d, g = field.distance_and_grad_fused(q)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_fused_projection_matches_xla(model, rng):
    module, params = model
    q = _poses(rng, 128)
    out_ref, hist_ref = project(module, params, q, steps=5)
    with pltpu.force_tpu_interpret_mode():
        out, hist = project(module, params, q, steps=5, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(hist_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["no-renorm", "tangent", "scaled"])
def test_fused_projection_modes(model, rng, mode):
    """Every project() mode goes through the same in-kernel step math."""
    module, params = model
    q = _poses(rng, 150)  # non-multiple of tile exercises padding
    kw = {"no-renorm": dict(renormalize=False),
          "tangent": dict(tangent=True),
          "scaled": dict(step_scale=0.5)}[mode]
    out_ref, hist_ref = project(module, params, q, steps=3, **kw)
    with pltpu.force_tpu_interpret_mode():
        out, hist = project(module, params, q, steps=3, fused=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(hist_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_projection_softplus(rng):
    """Non-trivial field values + fp32 pre-activation storage path."""
    cfg = PoseNDFConfig()
    cfg.dfnet.act = "softplus"
    cfg.strenc.act = "softplus"
    module = cfg.make_model()
    params = module.init(jax.random.key(2), jnp.zeros((1, 21, 4)))["params"]
    q = _poses(rng, 128)
    out_ref, hist_ref = project(module, params, q, steps=3)
    with pltpu.force_tpu_interpret_mode():
        out, hist = project(module, params, q, steps=3, fused=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(hist_ref),
                               rtol=1e-4, atol=1e-7)
