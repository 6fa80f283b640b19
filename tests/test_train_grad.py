"""Hand-derived train-step gradients (ops/train_grad.py) vs jax.grad.

The manual implementation writes the full double backprop (dist + manifold
+ eikonal grad-of-grad) as explicit matmul chains; these tests pin every
term and every parameter gradient against jax.value_and_grad of
losses.training_loss. This is the oracle chain for the fused train-step
kernel: kernel == manual (interpret mode) == autodiff (here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posendf_tpu.kinematics import REFERENCE_PARENTS
from posendf_tpu.losses import training_loss
from posendf_tpu.models import PoseNDF
from posendf_tpu.ops.train_grad import manual_train_grads


def _assert_grads_close(grads, ref_grads, atol_scale=2e-5):
    """Per-leaf scaled-atol comparison of two gradient pytrees (the grads
    tree uses the flax {"enc": ..., "dfnet": ...} layout)."""
    flat = dict(jax.tree.leaves_with_path(grads))
    for path, leaf in jax.tree.leaves_with_path(ref_grads):
        got = flat[path]
        scale = max(1e-6, float(jnp.max(jnp.abs(leaf))))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), atol=atol_scale * scale,
            err_msg=str(path))


def _liven_head(module, params, q, man):
    """lrelu/relu heads end in ReLU; even a perturbed random point can leave
    z_last < 0 on EVERY row, making d == 0 and the gradient of every loss
    term exactly zero (the eps-guarded eikonal norm at g == 0 also has a
    zero derivative) — a vacuous oracle comparison. Raise the output bias
    until both branches produce some d > 0 (softplus is always live)."""
    n_layers = 1 + max(
        int(k[1:]) for k in params["dfnet"] if k.startswith("w"))
    key = f"b{n_layers - 1}"
    for _ in range(16):
        if (float(jnp.max(module.apply({"params": params}, q))) > 0
                and float(jnp.max(module.apply({"params": params}, man))) > 0):
            return params
        dfn = dict(params["dfnet"])
        dfn[key] = dfn[key] + 0.5
        params = dict(params, dfnet=dfn)
    raise AssertionError("could not liven the DFNet output head")


def _setup(rng, activation, B=24, M=16, dims=(32, 48, 16)):
    module = PoseNDF(activation=activation, dfnet_dims=dims)
    q = rng.normal(size=(B, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    man = rng.normal(size=(M, 21, 4)).astype(np.float32)
    man /= np.linalg.norm(man, axis=-1, keepdims=True)
    gt = np.abs(rng.normal(size=(B,))).astype(np.float32)
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    # flax's zero-bias init is a degenerate comparison point (dead ReLU
    # head). Perturb to a generic point, then force the head live.
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    params = jax.tree.unflatten(treedef, [
        l + 0.3 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])
    q, gt, man = jnp.asarray(q), jnp.asarray(gt), jnp.asarray(man)
    params = _liven_head(module, params, q, man)
    return module, params, q, gt, man


@pytest.mark.parametrize("activation", ["lrelu", "relu", "softplus"])
@pytest.mark.parametrize("loss_type", ["l1", "l2"])
def test_manual_matches_autodiff(rng, activation, loss_type):
    module, params, pose, gt, man = _setup(rng, activation)
    w = dict(weight_dist=1.0, weight_man=1.0, weight_eikonal=1.0)

    def ref_loss(p):
        return training_loss(module, p, pose, gt, man,
                             loss_type=loss_type, **w)

    (ref_total, ref_terms), ref_grads = \
        jax.value_and_grad(ref_loss, has_aux=True)(params)
    total, terms, grads = manual_train_grads(
        params, pose, gt, man, parents=REFERENCE_PARENTS,
        activation=activation, loss_type=loss_type, **w)

    np.testing.assert_allclose(total, ref_total, rtol=1e-5, atol=1e-8)
    for k in ref_terms:
        np.testing.assert_allclose(terms[k], ref_terms[k], rtol=1e-5, atol=1e-8,
                                   err_msg=k)
    # softplus(beta=100)'s double backprop amplifies fp32 op-order noise
    # ~beta-fold; its tolerance is wider than the piecewise-linear acts'.
    _assert_grads_close(
        grads, ref_grads,
        atol_scale=2e-4 if activation == "softplus" else 2e-5)


def test_manual_weighted_terms(rng):
    """Loss weights scale each path independently (incl. the eikonal
    double-backprop path)."""
    module, params, pose, gt, man = _setup(rng, "lrelu")
    w = dict(weight_dist=0.25, weight_man=2.0, weight_eikonal=3.5)

    def ref_loss(p):
        return training_loss(module, p, pose, gt, man, loss_type="l1", **w)

    (_, _), ref_grads = jax.value_and_grad(ref_loss, has_aux=True)(params)
    _, _, grads = manual_train_grads(
        params, pose, gt, man, parents=REFERENCE_PARENTS,
        activation="lrelu", loss_type="l1", **w)
    _assert_grads_close(grads, ref_grads)


def test_manual_unequal_branch_sizes(rng):
    """Noisy and manifold batches of different sizes (the batcher's
    num_pts draws vs manifold rows differ in general)."""
    module, params, pose, gt, man = _setup(rng, "lrelu", B=40, M=12)

    def ref_loss(p):
        return training_loss(module, p, pose, gt, man, loss_type="l1")

    (ref_total, _), ref_grads = \
        jax.value_and_grad(ref_loss, has_aux=True)(params)
    total, _, grads = manual_train_grads(
        params, pose, gt, man, parents=REFERENCE_PARENTS, activation="lrelu")
    np.testing.assert_allclose(total, ref_total, rtol=1e-5, atol=1e-8)
    _assert_grads_close(grads, ref_grads)
