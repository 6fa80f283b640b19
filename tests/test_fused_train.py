"""Fused train-gradient Pallas kernel (ops/fused_train.py) vs the oracles.

Chain of custody for the double backprop: jax.value_and_grad(training_loss)
== manual_train_grads (tests/test_train_grad.py) == this kernel (here, in
interpret mode). Every parameter gradient and every loss term is pinned.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from posendf_tpu.kinematics import REFERENCE_PARENTS
from posendf_tpu.losses import training_loss
from posendf_tpu.models import PoseNDF
from posendf_tpu.ops.fused_train import fused_train_grads
from posendf_tpu.ops.train_grad import manual_train_grads
from tests.test_train_grad import _assert_grads_close, _setup


@pytest.mark.parametrize("activation", ["lrelu", "relu"])
@pytest.mark.parametrize("loss_type", ["l1", "l2"])
def test_kernel_matches_manual(rng, activation, loss_type):
    module, params, pose, gt, man = _setup(rng, activation)
    w = dict(weight_dist=1.0, weight_man=1.0, weight_eikonal=1.0)
    ref_total, ref_terms, ref_grads = manual_train_grads(
        params, pose, gt, man, parents=REFERENCE_PARENTS,
        activation=activation, loss_type=loss_type, **w)
    with pltpu.force_tpu_interpret_mode():
        total, terms, grads = fused_train_grads(
            params, pose, gt, man, parents=REFERENCE_PARENTS,
            activation=activation, loss_type=loss_type, **w)
    # guard against the dead-head degeneracy: the comparison is only
    # meaningful if the reference gradients are non-trivial
    assert any(bool(jnp.any(l != 0)) for l in jax.tree.leaves(ref_grads))
    np.testing.assert_allclose(total, ref_total, rtol=1e-5, atol=1e-8)
    for k in ref_terms:
        np.testing.assert_allclose(terms[k], ref_terms[k], rtol=1e-5, atol=1e-8,
                                   err_msg=k)
    _assert_grads_close(grads, ref_grads)


def test_kernel_matches_autodiff_multitile(rng):
    """grid > 1 + padded tail: B=300 at tile 128 is 3 tiles with a masked
    tail; weight-gradient accumulators must survive tile revisiting and the
    padding must contribute exactly zero."""
    module, params, pose, gt, man = _setup(rng, "lrelu", B=300, M=200)
    w = dict(weight_dist=1.0, weight_man=1.0, weight_eikonal=1.0)

    def ref_loss(p):
        return training_loss(module, p, pose, gt, man, loss_type="l1", **w)

    (ref_total, ref_terms), ref_grads = \
        jax.value_and_grad(ref_loss, has_aux=True)(params)
    with pltpu.force_tpu_interpret_mode():
        total, terms, grads = fused_train_grads(
            params, pose, gt, man, parents=REFERENCE_PARENTS,
            activation="lrelu", loss_type="l1", tile_b=128, **w)
    np.testing.assert_allclose(total, ref_total, rtol=1e-5, atol=1e-8)
    for k in ref_terms:
        np.testing.assert_allclose(terms[k], ref_terms[k], rtol=1e-5, atol=1e-8,
                                   err_msg=k)
    _assert_grads_close(grads, ref_grads)


def test_kernel_weights_and_asymmetric_batches(rng):
    """Non-unit term weights land on the right gradients; B != M."""
    module, params, pose, gt, man = _setup(rng, "lrelu", B=40, M=24)
    w = dict(weight_dist=0.7, weight_man=2.5, weight_eikonal=0.3)
    ref_total, ref_terms, ref_grads = manual_train_grads(
        params, pose, gt, man, parents=REFERENCE_PARENTS,
        activation="lrelu", loss_type="l1", **w)
    with pltpu.force_tpu_interpret_mode():
        total, terms, grads = fused_train_grads(
            params, pose, gt, man, parents=REFERENCE_PARENTS,
            activation="lrelu", loss_type="l1", **w)
    np.testing.assert_allclose(total, ref_total, rtol=1e-5, atol=1e-8)
    _assert_grads_close(grads, ref_grads)


def test_softplus_rejected():
    module = PoseNDF(activation="softplus", dfnet_dims=(16, 8))
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    q = jnp.ones((4, 21, 4)) / 2.0
    with pytest.raises(ValueError, match="softplus"):
        fused_train_grads(params, q, jnp.zeros(4), q,
                          parents=REFERENCE_PARENTS, activation="softplus")


def test_fused_step_sharded_matches_autodiff_step():
    """make_train_step(fused=True, mesh=...) wraps the kernel in shard_map
    with pmean'd losses/gradients over the 'data' axis. On a 2-device CPU
    mesh (kernel in interpret mode; 8 shards of interpreted Pallas are too
    slow for CI) one step must produce the same new params and metrics as
    the replicated autodiff step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from posendf_tpu.training.trainer import make_optimizer, make_train_step

    rng = np.random.default_rng(3)
    module, params, pose, gt, man = _setup(rng, "lrelu", B=32, M=16,
                                           dims=(24, 32))
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)
    w = {"dist": 1.0, "man_loss": 1.0, "eikonal": 1.0}
    batch = {"pose": pose, "dist": gt, "man_poses": man}

    ref_step = make_train_step(module, opt, loss_type="l1", weights=w)
    ref_p, _, ref_m = jax.jit(ref_step)(params, opt_state, batch)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    assert mesh.size == 2
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    fused_step = make_train_step(module, opt, loss_type="l1", weights=w,
                                 fused=True, mesh=mesh)
    params_r = jax.device_put(params, repl)
    opt_r = jax.device_put(opt_state, repl)
    batch_s = {k: jax.device_put(v, data) for k, v in batch.items()}
    with pltpu.force_tpu_interpret_mode():
        new_p, _, m = jax.jit(
            fused_step,
            in_shardings=(repl, repl, {k: data for k in batch}),
            out_shardings=(repl, repl, repl),
        )(params_r, opt_r, batch_s)

    for k in ("total", "dist", "man_loss", "eikonal"):
        np.testing.assert_allclose(np.asarray(m[k]), np.asarray(ref_m[k]),
                                   rtol=1e-5, atol=1e-8, err_msg=k)
    flat_ref = dict(jax.tree.leaves_with_path(ref_p))
    for path, leaf in jax.tree.leaves_with_path(new_p):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[path]),
            atol=2e-5 * max(1e-6, float(jnp.max(jnp.abs(flat_ref[path])))),
            err_msg=str(path))


def test_kernel_bf16_refused(rng):
    """Parameter gradients are fp32-only: bf16 compute measured WITHIN NOISE
    of fp32 on v5e (the MXU already runs fp32 operands at bf16 rate) while
    taking ~14% relative-L2 direction error on encoder bias leaves (batch
    sums of near-cancelling e-chain terms). Same policy as fused_model's
    bf16-gradient refusal."""
    module, params, pose, gt, man = _setup(rng, "lrelu")
    with pytest.raises(ValueError, match="fp32 only"):
        fused_train_grads(params, pose, gt, man, parents=REFERENCE_PARENTS,
                          activation="lrelu", compute_dtype="bfloat16")
