"""Shared on-device optimization engine for the experiments.

The reference experiments all share one pattern (``motion_denoise.py:58-121``,
``partial_observation.py``, ``image_fitting.py:183-213``): Adam(0.02) over
SMPL pose parameters, ``iterations`` outer x ``steps_per_iter`` inner Python
loops, with *annealed self-weighted* losses — each term enters the total as
``f_k(loss_k, it)`` where f multiplies the loss value by schedule factors and
sometimes by itself (e.g. pose prior ``1e7 * loss^2 / (1 + it)``,
``motion_denoise.py:31-34``).

TPU-native design: the WHOLE optimization (all iterations x steps) is one
jitted ``lax.scan``; the annealing index ``it = step // steps_per_iter`` is
computed in-graph, term gating (``data`` active only for it > 0) is a
``jnp.where`` — zero per-step Python, one dispatch per solve.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["AnnealSpec", "make_annealed_solver", "run_annealed_adam"]


class AnnealSpec(NamedTuple):
    """Annealed weighting f(loss, it) = scale * loss^power * (1+it)^anneal,
    gated off before ``active_after`` iterations."""

    scale: float
    power: int = 1          # 1: linear in the loss; 2: squared (self-weighted)
    anneal: float = 0.0     # exponent on (1 + it): +1 grows, -1 decays
    active_after: int = -1  # term active when it > active_after


def _weighted(loss: jax.Array, it: jax.Array, spec: AnnealSpec,
              override: Optional[dict] = None) -> jax.Array:
    """Apply the spec; ``override`` (per-term entry of aux['anneal_runtime'])
    replaces scale/anneal/active_after with RUNTIME values — traced scalars
    flowing through the solver's aux pytree, so one compiled solve serves
    every per-clip schedule (the field-adaptive denoise path)."""
    override = override or {}
    scale = override.get("scale", spec.scale)
    anneal = override.get("anneal", spec.anneal)
    active_after = override.get("active_after", spec.active_after)
    w = scale * (loss ** spec.power) * (1.0 + it) ** anneal
    return jnp.where(it > active_after, w, 0.0)


def make_annealed_solver(
    loss_terms_fn: Callable,
    specs: Dict[str, AnnealSpec],
    *,
    iterations: int = 10,
    steps_per_iter: int = 50,
    lr: float = 0.02,
):
    """Build a reusable jitted solver ``solve(params, aux) -> (params,
    history)``.

    ``loss_terms_fn(params, aux)`` must be pure: everything array-valued it
    reads (anchors, body-model tensors, field weights) goes through ``aux``
    so the solver's jit cache is reused across calls with new data — a
    benchmark sweep over N sequences compiles once, not N times.

    Runtime schedules: when ``aux`` is a dict carrying ``"anneal_runtime"``
    (``{term: {"scale"|"anneal"|"active_after": scalar}}``), those values
    override the static spec fields per solve WITHOUT recompiling — they
    are ordinary traced leaves of the aux pytree. ``power`` stays static
    (it changes the jaxpr).
    """
    optimizer = optax.adam(lr, b1=0.9, b2=0.999)
    total_steps = iterations * steps_per_iter

    def total_loss(params, aux, it):
        terms = loss_terms_fn(params, aux)
        runtime = aux.get("anneal_runtime", {}) if isinstance(aux, dict) else {}
        tot = sum(_weighted(terms[k], it, specs[k], runtime.get(k))
                  for k in specs)
        return tot, terms

    @jax.jit
    def solve(params, aux):
        opt_state = optimizer.init(params)

        def step(carry, step_idx):
            params, opt_state = carry
            it = (step_idx // steps_per_iter).astype(jnp.float32)
            (tot, terms), grads = jax.value_and_grad(total_loss, has_aux=True)(
                params, aux, it)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            # runtime step-size scale (aux["lr_runtime"], traced scalar):
            # Adam is invariant to global LOSS scaling, so a schedule that
            # only shrinks term weights cannot shrink the solver's late-step
            # oscillation floor (~lr per step); near-clean clips need the
            # UPDATES scaled down (the adaptive denoise path sets this)
            if isinstance(aux, dict) and "lr_runtime" in aux:
                lr_mult = aux["lr_runtime"]
                updates = jax.tree_util.tree_map(lambda u: u * lr_mult,
                                                 updates)
            # dof freezing (aux["param_mask"], broadcastable to params):
            # zeroed entries never move — the partial-observation INPAINT
            # mode optimizes only the unobserved joints' dofs. Masking
            # UPDATES (not grads) keeps frozen dofs bit-exact: Adam's
            # moments may accumulate for them but their params never change
            if isinstance(aux, dict) and "param_mask" in aux:
                pm = aux["param_mask"]
                updates = jax.tree_util.tree_map(lambda u: u * pm, updates)
            params = optax.apply_updates(params, updates)
            history = dict(terms, total=tot)
            return (params, opt_state), history

        (params, _), history = jax.lax.scan(
            step, (params, opt_state), jnp.arange(total_steps))
        return params, history

    return solve


def run_annealed_adam(
    loss_terms_fn: Callable[[jax.Array], Dict[str, jax.Array]],
    init_params: jax.Array,
    specs: Dict[str, AnnealSpec],
    *,
    iterations: int = 10,
    steps_per_iter: int = 50,
    lr: float = 0.02,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One-shot convenience wrapper around ``make_annealed_solver`` for
    closures that capture their data directly (single-solve uses).

    Args:
      loss_terms_fn: params -> {term_name: scalar loss} (pure, jittable).
      init_params: the optimized pytree (e.g. (B, 69) pose).
      specs: per-term annealing spec; keys must match loss_terms_fn output.

    Returns:
      (final params, history dict of (total_steps,) arrays per term + total).
    """
    solve = make_annealed_solver(
        lambda p, _aux: loss_terms_fn(p), specs,
        iterations=iterations, steps_per_iter=steps_per_iter, lr=lr)
    return solve(init_params, None)
