"""Hand-derived parameter gradients for the FULL training objective.

This module computes ``(total_loss, terms, dL/dparams)`` for the reference
training loss (distance + manifold + eikonal, ``model/posendf.py:62-99``)
with every derivative written out as explicit matmul chains — no
``jax.grad``. It exists for one reason: the fused Pallas train-step kernel
(``ops/fused_train.py``) needs the exact op list of the double backprop,
and that op list must be testable against autodiff *outside* the kernel.
This XLA formulation is that oracle: ``tests/test_train_grad.py`` pins it
bit-close to ``jax.value_and_grad(losses.training_loss)``, and the kernel
is then pinned against *this* in interpret mode.

Structure of the computation (four traversals of the network):

  A. primal: forward on the noisy branch (through the joint-axis input
     normalization, ``model/posendf.py:71``) + the inner input-gradient
     pullback that the eikonal term inspects — identical math to
     ``ops/fused_grad.py``'s forward+backward;
  B. loss cotangents: d-cotangents of the L1/L2 distance term, the
     input-gradient cotangent of the eikonal term (through the
     normalization's VJP, whose operator is symmetric and linear in the
     gradient, so NO second-order normalization terms arise for parameter
     gradients);
  C. the "e-chain": reverse-mode through the *pullback* computation,
     traversed in the primal direction (DFNet input -> output; encoder
     parents -> children). For ``lrelu``/``relu`` the activation second
     derivative is zero, so this chain is purely linear and only emits
     weight-gradient terms; for ``softplus`` it additionally feeds
     ``act''``-weighted cotangents back into phase D;
  D. combined downward backward: the standard parameter backprop of the
     primal forward, with phase C's second-order z-cotangents added in,
     plus the (independent, first-order-only) manifold branch.

Weight-gradient bookkeeping per DFNet layer l (z_l = x_l @ W_l + b_l,
c_l = inner cotangent of z_l, ecx_l = dL/d(c_l @ W_l^T)):

  dW_l = ecx_l^T @ c_l          (phase C: the pullback's use of W_l)
       + x_l^T @ cot_z_l        (phase D: the forward's use of W_l)
  db_l = sum_b cot_z_l          (biases appear only in the forward)

and the same two-sided pattern for the encoder's stacked per-joint weights.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["manual_train_grads"]

_EPS2 = 1e-24   # joint_axis_normalize guard (eps=1e-12 squared)
_EIK_EPS = 1e-12


def _act_fns(activation: str, beta: float):
    """(act, act', act'', out_act', out_act'') — derivative forms matching
    JAX's autodiff of models/activations.py (lrelu'(0)=1, relu'(0)=0)."""
    if activation == "lrelu":
        act = lambda z: jnp.where(z >= 0, z, 0.01 * z)            # noqa: E731
        d1 = lambda z: jnp.where(z >= 0, 1.0, 0.01)               # noqa: E731
        d2 = None
        od1 = lambda z: jnp.where(z > 0, 1.0, 0.0)                # noqa: E731
        od2 = None
        out = lambda z: jnp.maximum(z, 0.0)                       # noqa: E731
    elif activation == "relu":
        act = lambda z: jnp.where(z > 0, z, 0.0)                  # noqa: E731
        d1 = lambda z: jnp.where(z > 0, 1.0, 0.0)                 # noqa: E731
        d2 = None
        od1, od2, out = d1, None, act
    elif activation == "softplus":
        act = lambda z: jax.nn.softplus(beta * z) / beta          # noqa: E731
        d1 = lambda z: jax.nn.sigmoid(beta * z)                   # noqa: E731

        def d2(z):
            s = jax.nn.sigmoid(beta * z)
            return beta * s * (1.0 - s)

        od1, od2, out = d1, d2, act
    else:
        raise ValueError(f"unknown activation {activation!r}")
    return act, d1, d2, od1, od2, out


def _num_layers(dfnet_params) -> int:
    n = 0
    while f"w{n}" in dfnet_params:
        n += 1
    return n


def _enc_fwd_pullback(enc, x, parents, act, d1, gcode):
    """Encoder forward + inner pullback, keeping per-joint state.

    x: (B, J, 4) normalized pose. gcode: (B, J, F) cotangent arriving from
    the DFNet pullback. Returns per-joint state dict + (gx, gfeat, gh, gf)
    needed by phases C/D.
    """
    J = len(parents)
    w1, b1, w2, b2 = enc["w1"], enc["b1"], enc["w2"], enc["b2"]
    B = x.shape[0]
    F = w2.shape[-1]

    feat = [None] * J
    inp = [None] * J
    sh = [None] * J      # act'(zh_j)
    sf = [None] * J      # act'(zf_j)
    h = [None] * J
    zh = [None] * J
    zf = [None] * J
    for j in range(J):
        p = parents[j]
        pf = jnp.zeros((B, F), x.dtype) if p < 0 else feat[p]
        inp[j] = jnp.concatenate([x[:, j, :], pf], axis=-1)       # (B, 10)
        zh[j] = inp[j] @ w1[j] + b1[j]
        sh[j] = d1(zh[j])
        h[j] = act(zh[j])
        zf[j] = h[j] @ w2[j] + b2[j]
        sf[j] = d1(zf[j])
        feat[j] = act(zf[j])

    # inner pullback (reverse walk: every child index > its parent's)
    gfeat = [gcode[:, j, :] for j in range(J)]
    gx = [None] * J
    gh_s = [None] * J
    gf_s = [None] * J
    for j in range(J - 1, -1, -1):
        gf = gfeat[j] * sf[j]
        gh = (gf @ w2[j].T) * sh[j]
        gin = gh @ w1[j].T                                        # (B, 10)
        gx[j] = gin[:, :4]
        p = parents[j]
        if p >= 0:
            gfeat[p] = gfeat[p] + gin[:, 4:]
        gf_s[j], gh_s[j] = gf, gh
    return {
        "feat": feat, "inp": inp, "h": h, "zh": zh, "zf": zf,
        "sh": sh, "sf": sf, "gfeat": gfeat, "gx": gx,
        "gh": gh_s, "gf": gf_s,
    }


def manual_train_grads(
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
) -> Tuple[jax.Array, Dict[str, jax.Array], Dict]:
    """Explicit-chain equivalent of
    ``jax.value_and_grad(losses.training_loss)``: returns
    ``(total, terms, grads)`` with ``grads`` shaped like ``params``
    (``{"enc": {...}, "dfnet": {...}}``). fp32 only."""
    act, d1, d2, od1, od2, out_act = _act_fns(activation, beta)
    enc, dfn = params["enc"], params["dfnet"]
    L = _num_layers(dfn)
    J = len(parents)
    pose = pose.reshape(-1, J, 4)
    man_poses = man_poses.reshape(-1, J, 4)
    dist_gt = dist_gt.reshape(-1)
    B = pose.shape[0]
    M = man_poses.shape[0]
    F = enc["w2"].shape[-1]

    # ---------------- A. primal: normalize + forward + inner pullback -----
    s_n = jnp.sum(pose * pose, axis=1, keepdims=True)             # (B, 1, 4)
    n = jnp.sqrt(jnp.maximum(s_n, _EPS2))
    x_in = pose / n                                               # (B, J, 4)

    # DFNet needs the encoder's code first; run encoder forward inline in
    # _enc_fwd_pullback but its pullback needs gcode — so do DFNet forward
    # and backward between the encoder's two halves. Implemented by calling
    # the encoder helper lazily: first a forward-only pass result via the
    # same helper (gcode computed after DFNet).
    # -- encoder forward (duplicated loop kept tiny: J=21 joints of 10x10) --
    w1, b1, w2, b2 = enc["w1"], enc["b1"], enc["w2"], enc["b2"]
    featf = [None] * J
    for j in range(J):
        p = parents[j]
        pf = jnp.zeros((B, F), x_in.dtype) if p < 0 else featf[p]
        i_j = jnp.concatenate([x_in[:, j, :], pf], axis=-1)
        h_j = act(i_j @ w1[j] + b1[j])
        featf[j] = act(h_j @ w2[j] + b2[j])
    code = jnp.concatenate(featf, axis=-1)                        # (B, J*F)

    xs = [code]          # x_l, DFNet layer inputs
    ss = []              # act'(z_l) for hidden layers
    zs = []              # z_l (kept for softplus act''; cheap to keep)
    xcur = code
    for l in range(L):
        z = xcur @ dfn[f"w{l}"] + dfn[f"b{l}"]
        zs.append(z)
        if l < L - 1:
            ss.append(d1(z))
            xcur = act(z)
            xs.append(xcur)
    d = out_act(zs[-1])                                           # (B, 1)

    # inner pullback (unit cotangent on d): c_l = cot z_l, cx_l = c_l @ W^T
    c = [None] * L
    cx = [None] * L
    c[L - 1] = od1(zs[-1])
    for l in range(L - 1, 0, -1):
        cx[l] = c[l] @ dfn[f"w{l}"].T
        c[l - 1] = cx[l] * ss[l - 1]
    cx[0] = c[0] @ dfn["w0"].T
    gcode = cx[0].reshape(B, J, F)

    est = _enc_fwd_pullback(enc, x_in, parents, act, d1, gcode)
    gx = jnp.stack(est["gx"], axis=1)                             # (B, J, 4)

    # normalization VJP: gq = gx/n - x_in * (<gx, pose>_J * guard / n^2)
    guard = (s_n >= _EPS2).astype(pose.dtype)
    dot = jnp.sum(gx * pose, axis=1, keepdims=True)
    gq = gx / n - pose * (dot * guard / (n * n * n))              # (B, J, 4)

    # ---------------- losses ----------------------------------------------
    r = d[:, 0] - dist_gt
    if loss_type == "l1":
        loss_dist = jnp.mean(jnp.abs(r))
        dd = jnp.sign(r)[:, None] / B                             # cot on d
    elif loss_type == "l2":
        loss_dist = jnp.mean(r * r)
        dd = (2.0 * r)[:, None] / B
    else:
        raise ValueError(f"unknown loss_type {loss_type!r}")
    gn = jnp.sqrt(jnp.sum(gq * gq, axis=-1) + _EIK_EPS)           # (B, J)
    loss_eik = jnp.mean((gn - 1.0) ** 2)

    # ---------------- B. loss cotangents ----------------------------------
    dd = weight_dist * dd
    Ggq = weight_eikonal * (2.0 / (B * J)) * ((gn - 1.0) / gn)[..., None] * gq
    # adjoint of the (symmetric) normalization VJP operator
    dotG = jnp.sum(Ggq * pose, axis=1, keepdims=True)
    Ggx = Ggq / n - pose * (dotG * guard / (n * n * n))           # (B, J, 4)

    g_enc = {k: jnp.zeros_like(v) for k, v in enc.items()}
    g_dfn = {k: jnp.zeros_like(v) for k, v in dfn.items()}

    # ---------------- C. e-chain (reverse-mode through the pullback) ------
    # encoder half: parents before children so efeat[p] is final when used
    efeat = [None] * J
    for j in range(J):
        p = parents[j]
        egin = jnp.concatenate(
            [Ggx[:, j, :],
             efeat[p] if p >= 0 else jnp.zeros((B, F), pose.dtype)],
            axis=-1)                                              # (B, 10)
        # gin_j = gh_j @ w1_j^T
        g_enc["w1"] = g_enc["w1"].at[j].add(egin.T @ est["gh"][j])
        egh = egin @ w1[j]                                        # dL/dgh_j
        # gh_j = (gf_j @ w2_j^T) * sh_j
        ea = egh * est["sh"][j]                                   # dL/da_j
        g_enc["w2"] = g_enc["w2"].at[j].add(ea.T @ est["gf"][j])
        egf = ea @ w2[j]                                          # dL/dgf_j
        # gf_j = gfeat_j * sf_j
        efeat[j] = egf * est["sf"][j]
        if d2 is not None:
            # softplus: s depends on z — feed act'' terms into phase D
            aj = est["gf"][j] @ w2[j].T                           # recompute
            est.setdefault("zcot2_h", [None] * J)[j] = \
                egh * aj * d2(est["zh"][j])
            est.setdefault("zcot2_f", [None] * J)[j] = \
                egf * est["gfeat"][j] * d2(est["zf"][j])

    ecode = jnp.concatenate(efeat, axis=-1)                       # (B, J*F)

    # DFNet half: ecx_l = dL/d(cx_l), upward l = 0..L-1
    zcot2 = [None] * L
    ecx = ecode
    for l in range(L):
        g_dfn[f"w{l}"] = g_dfn[f"w{l}"] + ecx.T @ c[l]
        ec = ecx @ dfn[f"w{l}"]                                   # dL/dc_l
        if l < L - 1:
            if d2 is not None:
                zcot2[l] = ec * cx[l + 1] * d2(zs[l])
            ecx = ec * ss[l]
        else:
            if od2 is not None:
                zcot2[l] = ec * od2(zs[l])

    # ---------------- D. combined downward backward ------------------------
    cot = dd * c[L - 1]                                           # dd*outact'
    if zcot2[L - 1] is not None:
        cot = cot + zcot2[L - 1]
    for l in range(L - 1, -1, -1):
        g_dfn[f"w{l}"] = g_dfn[f"w{l}"] + xs[l].T @ cot
        g_dfn[f"b{l}"] = g_dfn[f"b{l}"] + jnp.sum(cot, axis=0)
        if l > 0:
            cot = (cot @ dfn[f"w{l}"].T) * ss[l - 1]
            if zcot2[l - 1] is not None:
                cot = cot + zcot2[l - 1]
    cot_code = (cot @ dfn["w0"].T).reshape(B, J, F)

    gfeat2 = [cot_code[:, j, :] for j in range(J)]
    for j in range(J - 1, -1, -1):
        czf = gfeat2[j] * est["sf"][j]
        if d2 is not None and est.get("zcot2_f"):
            czf = czf + est["zcot2_f"][j]
        g_enc["w2"] = g_enc["w2"].at[j].add(est["h"][j].T @ czf)
        g_enc["b2"] = g_enc["b2"].at[j].add(jnp.sum(czf, axis=0))
        czh = (czf @ w2[j].T) * est["sh"][j]
        if d2 is not None and est.get("zcot2_h"):
            czh = czh + est["zcot2_h"][j]
        g_enc["w1"] = g_enc["w1"].at[j].add(est["inp"][j].T @ czh)
        g_enc["b1"] = g_enc["b1"].at[j].add(jnp.sum(czh, axis=0))
        p = parents[j]
        if p >= 0:
            gfeat2[p] = gfeat2[p] + (czh @ w1[j].T)[:, 4:]

    # ---------------- manifold branch (plain fwd + backward, NO normalize) -
    featm = [None] * J
    inpm = [None] * J
    hm = [None] * J
    shm = [None] * J
    sfm = [None] * J
    for j in range(J):
        p = parents[j]
        pf = jnp.zeros((M, F), pose.dtype) if p < 0 else featm[p]
        inpm[j] = jnp.concatenate([man_poses[:, j, :], pf], axis=-1)
        zhj = inpm[j] @ w1[j] + b1[j]
        shm[j] = d1(zhj)
        hm[j] = act(zhj)
        zfj = hm[j] @ w2[j] + b2[j]
        sfm[j] = d1(zfj)
        featm[j] = act(zfj)
    xm = jnp.concatenate(featm, axis=-1)
    xsm = [xm]
    ssm = []
    for l in range(L):
        z = xm @ dfn[f"w{l}"] + dfn[f"b{l}"]
        if l < L - 1:
            ssm.append(d1(z))
            xm = act(z)
            xsm.append(xm)
        else:
            zlast = z
    d_man = out_act(zlast)
    loss_man = jnp.mean(jnp.abs(d_man))

    cotm = weight_man * jnp.sign(d_man) / M * od1(zlast)
    for l in range(L - 1, -1, -1):
        g_dfn[f"w{l}"] = g_dfn[f"w{l}"] + xsm[l].T @ cotm
        g_dfn[f"b{l}"] = g_dfn[f"b{l}"] + jnp.sum(cotm, axis=0)
        if l > 0:
            cotm = (cotm @ dfn[f"w{l}"].T) * ssm[l - 1]
    cotm_code = (cotm @ dfn["w0"].T).reshape(M, J, F)
    gfeatm = [cotm_code[:, j, :] for j in range(J)]
    for j in range(J - 1, -1, -1):
        czf = gfeatm[j] * sfm[j]
        g_enc["w2"] = g_enc["w2"].at[j].add(hm[j].T @ czf)
        g_enc["b2"] = g_enc["b2"].at[j].add(jnp.sum(czf, axis=0))
        czh = (czf @ w2[j].T) * shm[j]
        g_enc["w1"] = g_enc["w1"].at[j].add(inpm[j].T @ czh)
        g_enc["b1"] = g_enc["b1"].at[j].add(jnp.sum(czh, axis=0))
        p = parents[j]
        if p >= 0:
            gfeatm[p] = gfeatm[p] + (czh @ w1[j].T)[:, 4:]

    total = (weight_dist * loss_dist + weight_man * loss_man
             + weight_eikonal * loss_eik)
    terms = {"dist": loss_dist, "man_loss": loss_man, "eikonal": loss_eik}
    return total, terms, {"enc": g_enc, "dfnet": g_dfn}
