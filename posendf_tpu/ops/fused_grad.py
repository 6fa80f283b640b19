"""Pallas TPU kernel: distance AND input-gradient in ONE fused program.

The projection solver (``projection.py``, reference loop
``experiments/sample_poses.py:70-74``) and every experiment optimizer
(denoise / partial / image fitting) evaluate both d(q) and grad_q d(q) at
every step. The XLA path does forward + full reverse-mode backward — each
layer's activations round-trip through HBM between the two passes, and the
backward also computes parameter cotangents that the solvers immediately
throw away.

This kernel runs the whole model (21-joint encoder chain + 7-layer DFNet)
forward AND its input-only backward in a single Pallas program per batch
tile: all weights (~5.5 MB fp32) and every intermediate pre-activation stay
resident in VMEM; no parameter gradients are formed at all. HBM traffic per
pose is 84 floats in, 85 floats out (1 distance + 84 gradient components).

Backward math (input cotangent only, unit output cotangent):
  DFNet:    z_l = x_l @ W_l + b_l,  x_{l+1} = act(z_l),  d = out_act(z_{L-1})
            g_{L-1} = out_act'(z_{L-1});  g_l = (g_{l+1} @ W_{l+1}^T) * act'(z_l)
            gcode   = g_0 @ W_0^T
  Encoder (reverse joint walk, j = J-1 .. 0):
            gf   = gfeat[j] * act'(f_pre[j])
            gh   = (W2[j]^T gf) * act'(h_pre[j])
            gq[j]       = W1a[j]^T gh
            gfeat[p(j)] += mask[j] * (W1b[j]^T gh)
  (children contribute to their parent's feature gradient; every parent index
  is < child index — ``net_utils.py:44-50`` — so the reverse index walk sees
  all children before their parent.)

The joint-axis input normalization (``model/posendf.py:71``) and its VJP are
chained OUTSIDE the kernel in XLA (elementwise + a 21-way reduction; cheap).

Activation-derivative subgradients at z == 0 are chosen to match JAX's
autodiff of the forward functions exactly (see ``models/activations.py``),
so this kernel is bit-comparable to ``jax.vjp`` of the XLA model.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posendf_tpu.models.activations import (
    make_activation,
    make_activation_grad,
    make_output_activation,
    make_output_activation_grad,
)

__all__ = ["fused_distance_and_grad"]


def _vag_kernel(parents_ref, pmask_ref, q_ref,
                w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref,
                *refs,
                num_joints, num_layers, activation, beta):
    layer_refs = refs[: 2 * num_layers]
    d_ref = refs[2 * num_layers]            # out (tile, 1)
    gq_ref = refs[2 * num_layers + 1]       # out (J, 4, tile)
    feats = refs[2 * num_layers + 2]        # scratch (J, F, tile)
    hpre = refs[2 * num_layers + 3]         # scratch (J, H, tile)
    fpre = refs[2 * num_layers + 4]         # scratch (J, F, tile)
    gfeat = refs[2 * num_layers + 5]        # scratch (J, F, tile)
    zrefs = refs[2 * num_layers + 6:]       # per-layer (tile, d_l) pre-acts

    act = make_activation(activation, beta)
    actg = make_activation_grad(activation, beta)
    out_act = make_output_activation(activation, beta)
    out_actg = make_output_activation_grad(activation, beta)

    # ---- encoder forward, (feature, batch) orientation ----
    feats[0] = jnp.zeros(feats.shape[1:], feats.dtype)

    def fwd_body(j, _):
        q = q_ref[j]
        p = jnp.maximum(parents_ref[j], 0)
        zh = (
            jnp.dot(w1a_ref[j], q, preferred_element_type=jnp.float32)
            + pmask_ref[j] * jnp.dot(w1b_ref[j], feats[p],
                                     preferred_element_type=jnp.float32)
            + b1_ref[j][:, None]
        )
        hpre[j] = zh
        h = act(zh)
        zf = jnp.dot(w2_ref[j], h, preferred_element_type=jnp.float32) \
            + b2_ref[j][:, None]
        fpre[j] = zf
        feats[j] = act(zf)
        return 0

    jax.lax.fori_loop(0, num_joints, fwd_body, 0)

    # ---- DFNet forward, (batch, feature) orientation; stash pre-acts ----
    J, F, T = feats.shape
    x = feats[...].reshape(J * F, T).T                   # (tile, J*F)
    for l in range(num_layers):
        w = layer_refs[2 * l][...]                        # (in, out)
        b = layer_refs[2 * l + 1][...]                    # (out,)
        z = jnp.dot(x, w, preferred_element_type=jnp.float32) + b[None, :]
        zrefs[l][...] = z
        x = act(z) if l < num_layers - 1 else out_act(z)
    d_ref[...] = x                                        # (tile, 1)

    # ---- DFNet backward (unit cotangent; input grads only) ----
    g = out_actg(zrefs[num_layers - 1][...])              # (tile, 1)
    for l in range(num_layers - 1, -1, -1):
        if l < num_layers - 1:
            g = g * actg(zrefs[l][...])
        w = layer_refs[2 * l][...]                        # (in, out)
        # g @ w^T without materializing the transpose: contract 'out' axes
        g = jax.lax.dot_general(
            g, w, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (tile, in)

    # ---- encoder backward, reverse joint walk ----
    gfeat[...] = g.T.reshape(J, F, T)

    def bwd_body(i, _):
        j = num_joints - 1 - i
        gf = gfeat[j] * actg(fpre[j])                     # (F, tile)
        gh = jax.lax.dot_general(
            w2_ref[j], gf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (H, tile)
        gh = gh * actg(hpre[j])
        gq_ref[j] = jax.lax.dot_general(
            w1a_ref[j], gh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (4, tile)
        p = jnp.maximum(parents_ref[j], 0)
        contrib = pmask_ref[j] * jax.lax.dot_general(
            w1b_ref[j], gh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (F, tile)
        gfeat[p] = gfeat[p] + contrib
        return 0

    jax.lax.fori_loop(0, num_joints, bwd_body, 0)


def _vag_core(quat, enc_params, dfnet_params, parents, activation, beta,
              num_layers, tile_b):
    """(Bp, J, 4) pre-normalized quats -> ((Bp, 1) dist, (J, 4, Bp) grad)."""
    B = quat.shape[0]
    J = len(parents)
    q_t = jnp.transpose(quat, (1, 2, 0))                  # (J, 4, B)
    w1 = enc_params["w1"]                                  # (J, 10, H)
    w1a = jnp.transpose(w1[:, :4, :], (0, 2, 1))           # (J, H, 4)
    w1b = jnp.transpose(w1[:, 4:, :], (0, 2, 1))           # (J, H, F)
    w2t = jnp.transpose(enc_params["w2"], (0, 2, 1))       # (J, F, H)
    H = w1.shape[-1]
    F = enc_params["w2"].shape[-1]
    parents_arr = jnp.asarray(parents, jnp.int32)
    pmask = jnp.asarray([0.0 if p == -1 else 1.0 for p in parents], quat.dtype)

    layer_args, layer_specs, dims = [], [], []
    for l in range(num_layers):
        w = dfnet_params[f"w{l}"]
        b = dfnet_params[f"b{l}"]
        dims.append(w.shape[1])
        layer_args += [w, b]
        layer_specs += [
            pl.BlockSpec(w.shape, lambda i, *_, n=w.ndim: (0,) * n,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i, *_, n=b.ndim: (0,) * n,
                         memory_space=pltpu.VMEM),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // tile_b,),
        in_specs=[
            pl.BlockSpec((J, 4, tile_b), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, H, 4), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, H, F), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, H), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, F, H), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((J, F), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ] + layer_specs,
        out_specs=(
            pl.BlockSpec((tile_b, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((J, 4, tile_b), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((J, F, tile_b), jnp.float32),   # feats
            pltpu.VMEM((J, H, tile_b), jnp.float32),   # h pre-acts
            pltpu.VMEM((J, F, tile_b), jnp.float32),   # f pre-acts
            pltpu.VMEM((J, F, tile_b), jnp.float32),   # feature grads
        ] + [pltpu.VMEM((tile_b, d), jnp.float32) for d in dims],
    )
    kernel = functools.partial(
        _vag_kernel, num_joints=J, num_layers=num_layers,
        activation=activation, beta=beta)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1), quat.dtype),
            jax.ShapeDtypeStruct((J, 4, B), quat.dtype),
        ),
    )(parents_arr, pmask, q_t, w1a, w1b, enc_params["b1"], w2t,
      enc_params["b2"], *layer_args)


def fused_distance_and_grad(
    quat: jax.Array,           # (B, 21, 4)
    enc_params,                # {'w1','b1','w2','b2'} stacked encoder weights
    dfnet_params,              # {'w0','b0',...} DFNet weights
    *,
    parents: Tuple[int, ...],
    activation: str = "lrelu",
    beta: float = 100.0,
    tile_b: int = 512,
    normalize_input: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Fused (d, dd/dquat): (B, 21, 4) -> ((B, 1), (B, 21, 4)).

    Matches ``field.distance_and_grad`` of the standard encoder+DFNet model:
    the gradient is w.r.t. the RAW input pose, through the joint-axis
    normalization (``model/posendf.py:64-71``), whose VJP is chained outside
    the kernel. Forward-only — do not differentiate through the outputs; the
    solvers that use it (projection, experiment optimizers) treat the
    gradient as a descent direction, not part of a larger autodiff graph.

    tile_b = 512 (the validated VMEM maximum: weights 5.5 MB + stored DFNet
    pre-activations tile x 2625 floats = 5.4 MB + encoder scratch ~= 12 MB)
    measures 18.9M value-and-grads/s on a v5e chip at 65k batch vs 9.6M for
    XLA forward + vjp — 2x. Below ~16k poses the XLA path's lower fixed cost
    wins; prefer ``fused=False`` there (see ``projection.project``).
    """
    from posendf_tpu.quat import joint_axis_normalize

    B = quat.shape[0]
    num_layers = 0
    while f"w{num_layers}" in dfnet_params:
        num_layers += 1
    tile_b = min(tile_b, max(128, 1 << (B - 1).bit_length()))
    pad = (-B) % tile_b
    if pad:
        quat = jnp.concatenate(
            [quat, jnp.zeros((pad,) + quat.shape[1:], quat.dtype)], axis=0)

    if normalize_input:
        x, norm_vjp = jax.vjp(joint_axis_normalize, quat)
    else:
        x = quat
    d, gq_t = _vag_core(x, enc_params, dfnet_params, tuple(parents),
                        activation, beta, num_layers, tile_b)
    g = jnp.transpose(gq_t, (2, 0, 1))                    # (Bp, J, 4)
    if normalize_input:
        (g,) = norm_vjp(g)
    return d[:B], g[:B]
