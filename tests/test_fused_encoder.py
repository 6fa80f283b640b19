"""Fused Pallas structure-encoder vs the XLA level-scheduled path.

Runs in Pallas interpret mode so it executes on the CPU test backend; the
same kernel is exercised compiled on real TPU by bench.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from posendf_tpu import kinematics
from posendf_tpu.models import PoseNDF, StructureEncoder
from posendf_tpu.models.encoder import structure_encoder_apply
from posendf_tpu.ops.fused_encoder import fused_structure_encoder


@pytest.fixture(scope="module")
def enc_params():
    enc = StructureEncoder()
    return enc.init(jax.random.key(0), jnp.zeros((2, 21, 4)))["params"]


def _poses(rng, n):
    q = rng.normal(size=(n, 21, 4)).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_fused_matches_xla_forward(enc_params, rng):
    q = _poses(rng, 300)  # non-multiple of tile to exercise padding
    args = (enc_params["w1"], enc_params["b1"], enc_params["w2"], enc_params["b2"])
    ref = structure_encoder_apply(q, *args, parents=kinematics.REFERENCE_PARENTS)
    with pltpu.force_tpu_interpret_mode():
        out = fused_structure_encoder(q, *args, parents=kinematics.REFERENCE_PARENTS,
                                      tile_b=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("act", ["relu", "softplus"])
def test_fused_activations(enc_params, rng, act):
    q = _poses(rng, 128)
    args = (enc_params["w1"], enc_params["b1"], enc_params["w2"], enc_params["b2"])
    ref = structure_encoder_apply(q, *args, parents=kinematics.REFERENCE_PARENTS,
                                  activation=act)
    with pltpu.force_tpu_interpret_mode():
        out = fused_structure_encoder(q, *args, parents=kinematics.REFERENCE_PARENTS,
                                      activation=act, tile_b=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_custom_vjp_matches_xla(enc_params, rng):
    q = _poses(rng, 64)
    args = (enc_params["w1"], enc_params["b1"], enc_params["w2"], enc_params["b2"])

    g_ref = jax.grad(lambda x: jnp.sum(
        structure_encoder_apply(x, *args, parents=kinematics.REFERENCE_PARENTS) ** 2
    ))(q)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda x: jnp.sum(
            fused_structure_encoder(x, *args, parents=kinematics.REFERENCE_PARENTS,
                                    tile_b=128) ** 2
        ))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_model_flag_routes_through_fused(rng):
    """PoseNDF(use_fused=True) must produce the same distances as the XLA
    model with identical params."""
    m_x = PoseNDF(dfnet_dims=(32,), activation="softplus")
    m_f = PoseNDF(dfnet_dims=(32,), activation="softplus", use_fused=True)
    params = m_x.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    q = _poses(rng, 96)
    ref = m_x.apply({"params": params}, q)
    with pltpu.force_tpu_interpret_mode():
        out = m_f.apply({"params": params}, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestFusedModel:
    """Whole-model fused kernel (encoder + DFNet in one Pallas program)."""

    def _setup(self, act="softplus", beta=1.0):
        from posendf_tpu.config import PoseNDFConfig

        cfg = PoseNDFConfig()
        cfg.dfnet.act = cfg.strenc.act = act
        cfg.dfnet.beta = cfg.strenc.beta = beta
        cfg.dfnet.dims = [64, 128, 32]
        m = cfg.make_model()
        params = m.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
        return m, params

    def test_matches_xla_model(self, rng):
        from posendf_tpu.ops.fused_model import fused_posendf_forward

        m, params = self._setup()
        q = _poses(rng, 300)
        ref = m.apply({"params": params}, q)
        with pltpu.force_tpu_interpret_mode():
            out = fused_posendf_forward(
                q, params["enc"], params["dfnet"],
                parents=kinematics.REFERENCE_PARENTS,
                activation="softplus", beta=1.0, tile_b=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_custom_vjp_matches_xla(self, rng):
        from posendf_tpu.ops.fused_model import fused_posendf_forward

        m, params = self._setup()
        q = _poses(rng, 64)

        g_ref = jax.grad(lambda x: jnp.sum(m.apply({"params": params}, x)))(q)
        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(lambda x: jnp.sum(fused_posendf_forward(
                x, params["enc"], params["dfnet"],
                parents=kinematics.REFERENCE_PARENTS,
                activation="softplus", beta=1.0, tile_b=128)))(q)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-4, rtol=1e-3)


def test_field_distance_fused_api(rng):
    """Field.distance_fused must route through the whole-model kernel and
    agree with Field.distance."""
    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.field import make_field

    cfg = PoseNDFConfig()
    cfg.dfnet.act = cfg.strenc.act = "softplus"
    cfg.dfnet.dims = [32]
    m = cfg.make_model()
    params = m.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    field = make_field(m, params)
    q = _poses(rng, 100)
    ref = field.distance(q)
    with pltpu.force_tpu_interpret_mode():
        out = field.distance_fused(q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    cfg.dfnet.ff_enc = True
    m2 = cfg.make_model()
    field2 = make_field(m2, params)
    with pytest.raises(ValueError):
        field2.distance_fused(q)
