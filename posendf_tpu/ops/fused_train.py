"""Pallas TPU kernels: the FULL training gradient in one fused program.

The training objective (``losses.training_loss``; reference
``model/posendf.py:62-99``) needs dL/dparams of

    w_dist * L(d(q_noisy), d_gt) + w_man * mean|d(q_man)|
    + w_eik * mean((||grad_q d||_2 - 1)^2)

whose eikonal term makes the parameter gradient a DOUBLE backprop: XLA's
``jax.value_and_grad`` runs ~6 network traversals with every intermediate
activation round-tripping through HBM between passes. This module fuses an
entire traversal set into ONE Pallas program per branch: all weights, all
per-tile activations, and the parameter-gradient ACCUMULATORS stay
VMEM-resident across batch tiles (outputs with constant index maps ride the
grid; only the final dW/db and loss sums ever reach HBM).

The op list is exactly ``ops/train_grad.manual_train_grads`` (phases A-D
documented there), specialized to lrelu/relu where the activation second
derivative vanishes and the e-chain is purely linear:

  A. primal forward (joint-axis normalize + encoder + DFNet) and the inner
     input-gradient pullback the eikonal term inspects;
  B. loss cotangents (distance residual; eikonal through the
     normalization-VJP's symmetric adjoint);
  C. e-chain: reverse-mode through the pullback, walked in the primal
     direction — emits the second-order weight-gradient terms
     (dW_l += ecx_l^T @ c_l and the encoder analogues);
  D. combined downward backward — the standard parameter backprop
     (dW_l += x_l^T @ cot_l, db_l += sum cot_l).

The same kernel body specialized with ``eikonal=False, normalize_input=False``
is the manifold branch (plain first-order fwd+bwd, ``model/posendf.py:80-86``):
phases A(fwd)+D only. ``softplus`` heads need act''-cotangent feedback (phase
C -> D coupling) and fall back to the XLA oracle — use
``ops.train_grad.manual_train_grads`` or plain autodiff there.

Batch padding is masked: every loss contribution and every loss cotangent is
multiplied by a tile-local validity mask, so padded rows contribute exactly
zero to the loss sums and to every parameter gradient.

Validated in interpret mode against ``manual_train_grads`` (itself pinned to
``jax.value_and_grad``): ``tests/test_fused_train.py``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posendf_tpu.models.activations import make_activation, make_output_activation
from posendf_tpu.ops.fused_grad import (
    _COMPILER_PARAMS,
    _act_grad,
    _act_store,
    _common_specs,
    _out_act_grad_from_value,
    _weight_operands,
)

__all__ = ["fused_train_grads"]

_EPS2 = 1e-24     # joint_axis_normalize guard (eps=1e-12 squared)
_EIK_EPS = 1e-12  # gradient-safe eikonal norm epsilon (losses.py:95)


def _sublane_total(y):
    """Sum over the 4 quaternion-component rows via a roll tree (native
    sublane shuffles; result replicated across rows)."""
    y = y + pltpu.roll(y, 1, 0)
    return y + pltpu.roll(y, 2, 0)


def _train_kernel(parents_ref, pmask_ref, q_ref,
                  w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref, gt_ref,
                  *refs, num_joints, num_layers, activation, beta, loss_type,
                  batch, weight_loss, weight_eikonal, normalize_input,
                  eikonal, compute_dtype):
    """One batch tile of the training gradient.

    ``eikonal=True, normalize_input=True``  -> noisy branch (dist + eikonal).
    ``eikonal=False, normalize_input=False`` -> manifold branch (gt_ref is
    zeros, so the l1 distance term IS mean|d|).
    """
    J, L = num_joints, num_layers
    cd = jnp.dtype(compute_dtype)
    cast = (lambda a: a.astype(cd)) if cd != jnp.float32 else (lambda a: a)
    act = make_activation(activation, beta)
    out_act = make_output_activation(activation, beta)
    inv_b = 1.0 / batch

    # ---- ref bookkeeping -------------------------------------------------
    layer_refs = refs[:2 * L]
    k = 2 * L
    gw1a_ref, gw1b_ref, gb1_ref, gw2_ref, gb2_ref = refs[k:k + 5]
    k += 5
    gl_refs = refs[k:k + 2 * L]
    k += 2 * L
    if eikonal:
        ldist_ref, leik_ref = refs[k:k + 2]
        k += 2
    else:
        ldist_ref = refs[k]
        k += 1
    scr = refs[k:]
    feats, hbuf, hsel, fsel, gwork = scr[:5]
    s = 5
    if normalize_input:
        xnorm = scr[s]
        s += 1
    if eikonal:
        ghst, gfst, gx_s, ggx_s = scr[s:s + 4]
        s += 4
    xs = scr[s:s + L]
    s += L
    ssel = scr[s:s + L - 1]
    s += L - 1
    cst = scr[s:s + L] if eikonal else None

    i = pl.program_id(0)
    tile_b = q_ref.shape[2]

    @pl.when(i == 0)
    def _zero_accumulators():
        for ref in (gw1a_ref, gw1b_ref, gb1_ref, gw2_ref, gb2_ref, *gl_refs):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)
        ldist_ref[0, 0] = 0.0
        if eikonal:
            leik_ref[0, 0] = 0.0

    # validity masks for the padded tail tile
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 1), 0) + i * tile_b
    mask_col = (col < batch).astype(jnp.float32)               # (T, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, tile_b), 1) + i * tile_b
    mrow = (row < batch).astype(jnp.float32)                   # (1, T)
    mask4 = jnp.concatenate([mrow, mrow, mrow, mrow], axis=0)  # (4, T)

    # ---- A. joint-axis input normalization (model/posendf.py:71) ---------
    if normalize_input:
        ssum = None
        for j in range(J):                                     # static walk
            q = q_ref[j]
            ssum = q * q if ssum is None else ssum + q * q
        n = jnp.sqrt(jnp.maximum(ssum, _EPS2))
        inv_n = 1.0 / n                                        # (4, T)
        guard = (ssum >= _EPS2).astype(jnp.float32)
        for j in range(J):
            xnorm[j] = q_ref[j] * inv_n
        read_x = lambda j: xnorm[j]                            # noqa: E731
    else:
        read_x = lambda j: q_ref[j]                            # noqa: E731

    # ---- A. encoder forward (feature, batch) orientation -----------------
    # the root iteration reads feats[parent->0] (pmask-zeroed) BEFORE any
    # write; scratch is uninitialized, and NaN * 0 = NaN
    feats[0] = jnp.zeros(feats.shape[1:], feats.dtype)

    def fwd_body(j, _):
        p = jnp.maximum(parents_ref[j], 0)
        zh = (
            jnp.dot(w1a_ref[j], cast(read_x(j)),
                    preferred_element_type=jnp.float32)
            + pmask_ref[j] * jnp.dot(w1b_ref[j], cast(feats[p]),
                                     preferred_element_type=jnp.float32)
            + b1_ref[j][:, None]
        )
        hsel[j] = _act_store(activation, zh)
        h = act(zh)
        hbuf[j] = h
        zf = jnp.dot(w2_ref[j], cast(h), preferred_element_type=jnp.float32) \
            + b2_ref[j][:, None]
        fsel[j] = _act_store(activation, zf)
        feats[j] = act(zf)
        return 0

    jax.lax.fori_loop(0, J, fwd_body, 0)

    # ---- A. DFNet forward, (batch, feature) orientation ------------------
    F = feats.shape[1]
    x = feats[...].reshape(J * F, tile_b).T                    # (T, J*F)
    xs[0][...] = x
    d = None
    for l in range(L):
        w = layer_refs[2 * l][...]
        b = layer_refs[2 * l + 1][...]
        z = jnp.dot(cast(x), w, preferred_element_type=jnp.float32) + b[None, :]
        if l < L - 1:
            ssel[l][...] = _act_store(activation, z)
            x = act(z)
            xs[l + 1][...] = x
        else:
            d = out_act(z)                                     # (T, 1)

    # ---- A. inner pullback (unit cotangent) — eikonal branch only --------
    if eikonal:
        c = _out_act_grad_from_value(activation, beta, d)      # (T, 1)
        cst[L - 1][...] = c
        for l in range(L - 1, 0, -1):
            g = jax.lax.dot_general(
                cast(c), layer_refs[2 * l][...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (T, in)
            c = g * _act_grad(activation, beta, ssel[l - 1][...])
            cst[l - 1][...] = c
        gcode = jax.lax.dot_general(
            cast(c), layer_refs[0][...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (T, J*F)
        gwork[...] = gcode.T.reshape(J, F, tile_b)

        def pull_body(kk, _):
            j = J - 1 - kk
            gf = gwork[j] * _act_grad(activation, beta, fsel[j])
            gfst[j] = gf
            gh = jax.lax.dot_general(
                w2_ref[j], cast(gf), dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            gh = gh * _act_grad(activation, beta, hsel[j])
            ghst[j] = gh
            gx_s[j] = jax.lax.dot_general(
                w1a_ref[j], cast(gh),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (4, T)
            p = jnp.maximum(parents_ref[j], 0)
            gwork[p] = gwork[p] + pmask_ref[j] * jax.lax.dot_general(
                w1b_ref[j], cast(gh),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, J, pull_body, 0)

    # ---- B. distance-loss term + cotangent -------------------------------
    r = d - gt_ref[...]                                        # (T, 1)
    if loss_type == "l1":
        ldist_ref[0, 0] += jnp.sum(jnp.abs(r) * mask_col) * inv_b
        dd = weight_loss * jnp.sign(r) * mask_col * inv_b
    elif loss_type == "l2":
        ldist_ref[0, 0] += jnp.sum(r * r * mask_col) * inv_b
        dd = weight_loss * 2.0 * r * mask_col * inv_b
    else:
        raise ValueError(f"unknown loss_type {loss_type!r}")

    # ---- B. eikonal term + its pose-gradient cotangent -------------------
    if eikonal:
        # normalization VJP: gq_j = gx_j/n - q_j * (<gx, q>_J * guard / n^3)
        dot = None
        for j in range(J):
            p_ = gx_s[j] * q_ref[j]
            dot = p_ if dot is None else dot + p_
        coef = guard * inv_n * inv_n * inv_n                   # (4, T)
        eik_scale = weight_eikonal * 2.0 * inv_b / J
        dotg = None
        eik_acc = None
        for j in range(J):
            gq = gx_s[j] * inv_n - q_ref[j] * (dot * coef)
            sq = _sublane_total(gq * gq)                       # replicated
            gn = jnp.sqrt(sq + _EIK_EPS)
            dif = gn - 1.0
            e = dif * dif * mask4
            eik_acc = e if eik_acc is None else eik_acc + e
            ggq = (eik_scale * (dif / gn)) * gq * mask4
            ggx_s[j] = ggq                                     # pre-adjoint
            p_ = ggq * q_ref[j]
            dotg = p_ if dotg is None else dotg + p_
        # each joint's (gn-1)^2 was summed over 4 replicated rows
        leik_ref[0, 0] += jnp.sum(eik_acc) * (0.25 * inv_b / J)
        # adjoint of the (symmetric) normalization-VJP operator
        for j in range(J):
            ggx_s[j] = ggx_s[j] * inv_n - q_ref[j] * (dotg * coef)

        # ---- C. e-chain, encoder half (parents before children) ----------
        def echain_body(j, _):
            p = jnp.maximum(parents_ref[j], 0)
            ea_in = ggx_s[j]                                   # (4, T)
            eb_in = gwork[p]                                   # (F, T)
            gw1a_ref[j] = gw1a_ref[j] + jax.lax.dot_general(
                cast(ea_in), cast(ghst[j]),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (4, H)
            gw1b_ref[j] = gw1b_ref[j] + pmask_ref[j] * jax.lax.dot_general(
                cast(eb_in), cast(ghst[j]),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (F, H)
            egh = (
                jnp.dot(w1a_ref[j], cast(ea_in),
                        preferred_element_type=jnp.float32)
                + pmask_ref[j] * jnp.dot(w1b_ref[j], cast(eb_in),
                                         preferred_element_type=jnp.float32)
            )                                                  # (H, T)
            ea = egh * _act_grad(activation, beta, hsel[j])
            gw2_ref[j] = gw2_ref[j] + jax.lax.dot_general(
                cast(ea), cast(gfst[j]),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (H, F)
            egf = jnp.dot(w2_ref[j], cast(ea),
                          preferred_element_type=jnp.float32)  # (F, T)
            gwork[j] = egf * _act_grad(activation, beta, fsel[j])
            return 0

        # gwork transitions gfeat -> efeat: the forward walk overwrites
        # gwork[j] AFTER reading gwork[p] (p < j, already efeat); the root
        # read (p == j == 0) is stale but pmask-zeroed.
        jax.lax.fori_loop(0, J, echain_body, 0)

        # ---- C. e-chain, DFNet half (upward) -----------------------------
        ecx = gwork[...].reshape(J * F, tile_b).T              # (T, J*F)
        for l in range(L):
            gl_refs[2 * l][...] += jax.lax.dot_general(
                cast(ecx), cast(cst[l][...]),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (in, out)
            if l < L - 1:
                ec = jnp.dot(cast(ecx), layer_refs[2 * l][...],
                             preferred_element_type=jnp.float32)
                ecx = ec * _act_grad(activation, beta, ssel[l][...])

    # ---- D. combined downward backward, DFNet ----------------------------
    if eikonal:
        cot = dd * cst[L - 1][...]
    else:
        cot = dd * _out_act_grad_from_value(activation, beta, d)
    for l in range(L - 1, -1, -1):
        gl_refs[2 * l][...] += jax.lax.dot_general(
            cast(xs[l][...]), cast(cot),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (in, out)
        gl_refs[2 * l + 1][...] += jnp.sum(cot, axis=0, keepdims=True)
        if l > 0:
            cot = jax.lax.dot_general(
                cast(cot), layer_refs[2 * l][...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            cot = cot * _act_grad(activation, beta, ssel[l - 1][...])
    cot_code = jax.lax.dot_general(
        cast(cot), layer_refs[0][...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (T, J*F)
    gwork[...] = cot_code.T.reshape(J, F, tile_b)

    # ---- D. combined downward backward, encoder (reverse walk) -----------
    def down_body(kk, _):
        j = J - 1 - kk
        czf = gwork[j] * _act_grad(activation, beta, fsel[j])  # (F, T)
        gw2_ref[j] = gw2_ref[j] + jax.lax.dot_general(
            cast(hbuf[j]), cast(czf),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (H, F)
        gb2_ref[j] = gb2_ref[j] + jnp.sum(czf, axis=1, keepdims=True)
        czh = jax.lax.dot_general(
            w2_ref[j], cast(czf), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        czh = czh * _act_grad(activation, beta, hsel[j])       # (H, T)
        p = jnp.maximum(parents_ref[j], 0)
        gw1a_ref[j] = gw1a_ref[j] + jax.lax.dot_general(
            cast(read_x(j)), cast(czh),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (4, H)
        gw1b_ref[j] = gw1b_ref[j] + pmask_ref[j] * jax.lax.dot_general(
            cast(feats[p]), cast(czh),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (F, H)
        gb1_ref[j] = gb1_ref[j] + jnp.sum(czh, axis=1, keepdims=True)
        gwork[p] = gwork[p] + pmask_ref[j] * jax.lax.dot_general(
            w1b_ref[j], cast(czh),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (F, T)
        return 0

    jax.lax.fori_loop(0, J, down_body, 0)


def _branch_core(q, gt, enc_params, dfnet_params, parents, *, activation,
                 beta, loss_type, batch, weight_loss, weight_eikonal,
                 normalize_input, eikonal, tile_b, compute_dtype):
    """One branch (noisy or manifold) over padded (Bp, J, 4) poses.

    Returns kernel-layout gradients + loss sums (already mean-scaled)."""
    Bp = q.shape[0]
    J = len(parents)
    q_t = jnp.transpose(q, (1, 2, 0))                          # (J, 4, Bp)
    (parents_arr, pmask, w1a, w1b, b1, w2t, b2,
     layer_args, layer_specs, dims) = _weight_operands(
        enc_params, dfnet_params, parents, _num_layers(dfnet_params),
        q.dtype, compute_dtype)
    L = len(dims)
    H = w1a.shape[1]
    F = w1b.shape[2]
    ins = [J * F] + dims[:-1]                                  # layer inputs
    store_dt = jnp.bfloat16 if activation in ("lrelu", "relu") else jnp.float32

    # ---- outputs: kernel-layout grads + loss sums ------------------------
    const3 = lambda i, *_: (0, 0, 0)                           # noqa: E731
    const2 = lambda i, *_: (0, 0)                              # noqa: E731
    out_shapes = [
        jax.ShapeDtypeStruct((J, 4, H), jnp.float32),          # gw1a
        jax.ShapeDtypeStruct((J, F, H), jnp.float32),          # gw1b
        jax.ShapeDtypeStruct((J, H, 1), jnp.float32),          # gb1
        jax.ShapeDtypeStruct((J, H, F), jnp.float32),          # gw2
        jax.ShapeDtypeStruct((J, F, 1), jnp.float32),          # gb2
    ]
    out_specs = [
        pl.BlockSpec((J, 4, H), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((J, F, H), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((J, H, 1), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((J, H, F), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((J, F, 1), const3, memory_space=pltpu.VMEM),
    ]
    for l in range(L):
        out_shapes += [jax.ShapeDtypeStruct((ins[l], dims[l]), jnp.float32),
                       jax.ShapeDtypeStruct((1, dims[l]), jnp.float32)]
        out_specs += [pl.BlockSpec((ins[l], dims[l]), const2,
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, dims[l]), const2,
                                   memory_space=pltpu.VMEM)]
    n_loss = 2 if eikonal else 1
    out_shapes += [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * n_loss
    out_specs += [pl.BlockSpec((1, 1), const2,
                               memory_space=pltpu.SMEM)] * n_loss

    # ---- scratches -------------------------------------------------------
    scratch = [
        pltpu.VMEM((J, F, tile_b), jnp.float32),               # feats
        pltpu.VMEM((J, H, tile_b), jnp.float32),               # hbuf
        pltpu.VMEM((J, H, tile_b), store_dt),                  # hsel
        pltpu.VMEM((J, F, tile_b), store_dt),                  # fsel
        pltpu.VMEM((J, F, tile_b), jnp.float32),               # gwork
    ]
    if normalize_input:
        scratch += [pltpu.VMEM((J, 4, tile_b), jnp.float32)]   # xnorm
    if eikonal:
        scratch += [
            pltpu.VMEM((J, H, tile_b), jnp.float32),           # ghst
            pltpu.VMEM((J, F, tile_b), jnp.float32),           # gfst
            pltpu.VMEM((J, 4, tile_b), jnp.float32),           # gx
            pltpu.VMEM((J, 4, tile_b), jnp.float32),           # Ggx
        ]
    scratch += [pltpu.VMEM((tile_b, n), jnp.float32) for n in ins]     # xs
    scratch += [pltpu.VMEM((tile_b, n), store_dt) for n in dims[:-1]]  # ssel
    if eikonal:
        scratch += [pltpu.VMEM((tile_b, n), jnp.float32) for n in dims]  # c

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Bp // tile_b,),
        in_specs=_common_specs(J, H, F, tile_b) + [
            pl.BlockSpec((tile_b, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),             # gt
        ] + layer_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _train_kernel, num_joints=J, num_layers=L, activation=activation,
        beta=beta, loss_type=loss_type, batch=batch,
        weight_loss=weight_loss, weight_eikonal=weight_eikonal,
        normalize_input=normalize_input, eikonal=eikonal,
        compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=_COMPILER_PARAMS,
        out_shape=tuple(out_shapes),
    )(parents_arr, pmask, q_t, w1a, w1b, b1, w2t, b2, gt, *layer_args)


def _num_layers(dfnet_params) -> int:
    n = 0
    while f"w{n}" in dfnet_params:
        n += 1
    return n


def _pad_rows(a, tile):
    pad = (-a.shape[0]) % tile
    if pad:
        a = jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
    return a


def _assemble(outs, L):
    """Kernel-layout grad outputs -> the flax param-tree layout."""
    gw1a, gw1b, gb1, gw2, gb2 = outs[:5]
    g_enc = {
        "w1": jnp.concatenate([gw1a, gw1b], axis=1),           # (J, 10, H)
        "b1": gb1[..., 0],
        "w2": gw2,
        "b2": gb2[..., 0],
    }
    g_dfn = {}
    for l in range(L):
        g_dfn[f"w{l}"] = outs[5 + 2 * l]
        g_dfn[f"b{l}"] = outs[5 + 2 * l + 1][0]
    return {"enc": g_enc, "dfnet": g_dfn}, outs[5 + 2 * L:]


def fused_train_grads(
    params: Dict,
    pose: jax.Array,        # (B, 21, 4) noisy queries
    dist_gt: jax.Array,     # (B,)
    man_poses: jax.Array,   # (M, 21, 4) clean manifold poses
    *,
    parents: Tuple[int, ...],
    activation: str = "lrelu",
    beta: float = 100.0,
    loss_type: str = "l1",
    weight_dist: float = 1.0,
    weight_man: float = 1.0,
    weight_eikonal: float = 1.0,
    tile_b: int = 2048,  # swept on v5e at the 20k train batch with 50-step
                         # loops: 1024 = 4.10 ms/step, 2048 = 3.58 ms (1.75x
                         # autodiff's 6.28 ms); short-loop 2048 samples are
                         # noisy (2.9-6.5 ms) — trust the long-loop numbers
    compute_dtype: str = "float32",
) -> Tuple[jax.Array, Dict[str, jax.Array], Dict]:
    """Fused-kernel equivalent of
    ``jax.value_and_grad(losses.training_loss)``: returns
    ``(total, terms, grads)`` with ``grads`` shaped like ``params``.

    Two kernel launches per step: the noisy branch (distance + eikonal,
    double backprop) and the manifold branch (first-order). Parameter
    gradients accumulate in VMEM across batch tiles; the trees are summed
    by XLA afterwards. lrelu/relu only (softplus act'' feedback is not
    worth a third kernel specialization — use the XLA path).

    Forward-only: do not differentiate through the outputs. Weights are
    applied to the GRADIENT; ``terms`` are unweighted like
    ``losses.training_loss``.
    """
    if activation not in ("lrelu", "relu"):
        raise ValueError(
            f"fused_train_grads supports lrelu/relu (got {activation!r}); "
            "use ops.train_grad.manual_train_grads or autodiff for softplus")
    if jnp.dtype(compute_dtype) != jnp.float32:
        # Measured on v5e at the 20k train batch: bf16 compute times WITHIN
        # NOISE of fp32 (the MXU already eats fp32 operands at bf16 rate by
        # default) while the e-chain's near-cancelling batch sums take up to
        # ~14% direction error on encoder bias leaves. No win, real risk —
        # same policy as ops/fused_model.py's bf16-gradient refusal.
        raise ValueError(
            "fused_train_grads computes parameter gradients in fp32 only "
            f"(got compute_dtype={compute_dtype!r}); bf16 buys no speed "
            "here and corrupts near-cancelling gradient sums")
    J = len(parents)
    L = _num_layers(params["dfnet"])
    pose = pose.reshape(-1, J, 4)
    man_poses = man_poses.reshape(-1, J, 4)
    dist_gt = dist_gt.reshape(-1, 1).astype(pose.dtype)
    B = pose.shape[0]
    M = man_poses.shape[0]

    tile_n = min(tile_b, max(128, 1 << (B - 1).bit_length()))
    tile_m = min(tile_b, max(128, 1 << (M - 1).bit_length()))

    outs_n = _branch_core(
        _pad_rows(pose, tile_n), _pad_rows(dist_gt, tile_n),
        params["enc"], params["dfnet"], tuple(parents),
        activation=activation, beta=beta, loss_type=loss_type, batch=B,
        weight_loss=weight_dist, weight_eikonal=weight_eikonal,
        normalize_input=True, eikonal=True, tile_b=tile_n,
        compute_dtype=compute_dtype)
    grads_n, (ldist, leik) = _assemble(outs_n, L)

    outs_m = _branch_core(
        _pad_rows(man_poses, tile_m),
        jnp.zeros((M + (-M) % tile_m, 1), pose.dtype),
        params["enc"], params["dfnet"], tuple(parents),
        activation=activation, beta=beta, loss_type="l1", batch=M,
        weight_loss=weight_man, weight_eikonal=0.0,
        normalize_input=False, eikonal=False, tile_b=tile_m,
        compute_dtype=compute_dtype)
    grads_m, (lman,) = _assemble(outs_m, L)

    grads = jax.tree.map(jnp.add, grads_n, grads_m)
    loss_dist = ldist[0, 0]
    loss_eik = leik[0, 0]
    loss_man = lman[0, 0]
    total = (weight_dist * loss_dist + weight_man * loss_man
             + weight_eikonal * loss_eik)
    terms = {"dist": loss_dist, "man_loss": loss_man, "eikonal": loss_eik}
    return total, terms, grads
