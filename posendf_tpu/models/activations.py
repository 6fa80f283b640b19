"""Activation registry matching the reference's torch semantics.

Reference choices (``model/network/net_modules.py:30-41,86-107``):
  * ``lrelu`` — LeakyReLU with torch's default negative slope 0.01; the DFNet
    head then applies a final ReLU so distances are >= 0.
  * ``relu``  — ReLU everywhere.
  * ``softplus`` — Softplus(beta) everywhere including the output.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["make_activation", "make_output_activation", "resolve"]


def _leaky_relu(x: jax.Array) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def _softplus(beta: float) -> Callable[[jax.Array], jax.Array]:
    def fn(x: jax.Array) -> jax.Array:
        # torch.nn.Softplus switches to identity for beta*x > threshold(=20);
        # jax.nn.softplus is overflow-safe, so the formulations agree to fp32.
        return jax.nn.softplus(beta * x) / beta

    return fn


def make_activation(name: str, beta: float = 100.0) -> Callable[[jax.Array], jax.Array]:
    if name == "lrelu":
        return _leaky_relu
    if name == "relu":
        return jax.nn.relu
    if name == "softplus":
        return _softplus(beta)
    raise ValueError(f"unknown activation {name!r}; expected lrelu|relu|softplus")


def make_output_activation(name: str, beta: float = 100.0) -> Callable[[jax.Array], jax.Array]:
    """The DFNet output nonlinearity forcing dist >= 0
    (reference ``net_modules.py:31-41,69``)."""
    if name in ("lrelu", "relu"):
        return jax.nn.relu
    if name == "softplus":
        return _softplus(beta)
    raise ValueError(f"unknown activation {name!r}; expected lrelu|relu|softplus")


def resolve(name: str, beta: float = 100.0) -> Tuple[Callable, Callable]:
    return make_activation(name, beta), make_output_activation(name, beta)


# Activation-DERIVATIVE semantics used by the fused backward kernels live in
# ops/fused_grad.py (_act_store/_act_grad/_out_act_grad_from_value): the
# kernels store compact per-unit state in the forward pass and reconstruct
# the derivative from it, which doesn't decompose into a plain z -> act'(z)
# helper. Subgradient choices at z == 0 there match what JAX's autodiff
# produces for the forward functions above (``jax.nn.relu`` defines
# relu'(0) = 0 via its custom JVP; ``jax.nn.leaky_relu`` is
# ``where(z >= 0, ...)`` so its derivative at 0 takes the positive branch).
