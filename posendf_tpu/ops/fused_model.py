"""Pallas TPU kernel: the ENTIRE distance field fused into one kernel.

Goes beyond ``fused_encoder.py``: encoder chain + all 7 DFNet layers in a
single Pallas program. The whole parameter set (~1.37M floats, ~5.5 MB fp32)
fits in VMEM, so per batch tile the only HBM traffic is the input quats
(84 floats/pose) and the output distance (1 float/pose) — every inter-layer
activation lives and dies in VMEM. The plain-XLA path pays HBM for each
matmul boundary (~2.9 GB per 131k-pose forward vs ~45 MB here), so the fused
kernel turns a bandwidth-bound MLP into a compute-bound one.

Layout: the encoder runs in (feature, batch) orientation (batch in lanes,
leading-dim joint indexing — see fused_encoder.py); its (J*F, tile) output is
transposed once in VMEM and the DFNet layers run in the MXU's natural
(batch, feature) orientation.

Forward-only + ``custom_vjp`` falling back to the XLA model for gradients
(training is dominated by the backward anyway; this kernel is the serving /
projection fast path). Inputs are pre-normalized by the caller (the model's
joint-axis normalization happens outside, matching ``PoseNDF.__call__``).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posendf_tpu.models.activations import make_activation, make_output_activation

__all__ = ["fused_posendf_forward"]


def _model_kernel(parents_ref, pmask_ref, q_ref,
                  w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref,
                  *refs,
                  num_joints, num_layers, activation, beta,
                  compute_dtype="float32"):
    layer_refs = refs[: 2 * num_layers]
    out_ref = refs[2 * num_layers]
    feats = refs[2 * num_layers + 1]
    cd = jnp.dtype(compute_dtype)
    cast = (lambda a: a.astype(cd)) if cd != jnp.float32 else (lambda a: a)
    act = make_activation(activation, beta)
    out_act = make_output_activation(activation, beta)

    # ---- encoder chain (feature, batch) — see fused_encoder.py ----
    feats[0] = jnp.zeros(feats.shape[1:], feats.dtype)

    def body(j, _):
        q = q_ref[j]
        p = jnp.maximum(parents_ref[j], 0)
        h = (
            jnp.dot(w1a_ref[j], cast(q), preferred_element_type=jnp.float32)
            + pmask_ref[j] * jnp.dot(w1b_ref[j], cast(feats[p]),
                                     preferred_element_type=jnp.float32)
        )
        h = act(h + b1_ref[j][:, None])
        f = jnp.dot(w2_ref[j], cast(h), preferred_element_type=jnp.float32)
        feats[j] = act(f + b2_ref[j][:, None])
        return 0

    jax.lax.fori_loop(0, num_joints, body, 0)

    # ---- one transpose to (batch, code), then the DFNet stack ----
    J, F, T = feats.shape
    x = feats[...].reshape(J * F, T).T            # (tile, 126)
    for l in range(num_layers):
        w = layer_refs[2 * l][...]                # (in, out)
        b = layer_refs[2 * l + 1][...]            # (out,)
        x = jnp.dot(cast(x), w, preferred_element_type=jnp.float32) + b[None, :]
        x = act(x) if l < num_layers - 1 else out_act(x)
    out_ref[...] = x                              # (tile, 1)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _fused_model_core(quat, enc_params, dfnet_params, parents, activation,
                      beta, num_layers, tile_b, normalize_input,
                      compute_dtype="float32"):
    from posendf_tpu.quat import joint_axis_normalize

    B = quat.shape[0]
    J = len(parents)
    x = joint_axis_normalize(quat) if normalize_input else quat

    # weight-operand prep and block specs are shared with the value-and-grad
    # kernels — one source of truth for the parity-critical layouts
    from posendf_tpu.ops.fused_grad import _common_specs, _weight_operands

    q_t = jnp.transpose(x, (1, 2, 0))                  # (J, 4, B)
    (parents_arr, pmask, w1a, w1b, b1, w2t, b2,
     layer_args, layer_specs, _dims) = _weight_operands(
        enc_params, dfnet_params, parents, num_layers, quat.dtype,
        compute_dtype)
    H = w1a.shape[1]
    F = w1b.shape[2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // tile_b,),
        in_specs=_common_specs(J, H, F, tile_b) + layer_specs,
        out_specs=pl.BlockSpec((tile_b, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((J, F, tile_b), jnp.float32)],
    )
    kernel = functools.partial(
        _model_kernel, num_joints=J, num_layers=num_layers,
        activation=activation, beta=beta, compute_dtype=compute_dtype)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # raise Mosaic's 16 MB default scoped-VMEM cap (v5e physical VMEM is
        # larger) so tiles past 1024 compile (see ops/fused_grad.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((B, 1), quat.dtype),
    )(parents_arr, pmask, q_t, w1a, w1b, b1, w2t, b2, *layer_args)


def _fused_fwd(quat, enc_params, dfnet_params, parents, activation, beta,
               num_layers, tile_b, normalize_input, compute_dtype="float32"):
    out = _fused_model_core(quat, enc_params, dfnet_params, parents,
                            activation, beta, num_layers, tile_b,
                            normalize_input, compute_dtype)
    return out, (quat, enc_params, dfnet_params)


def _fused_bwd(parents, activation, beta, num_layers, tile_b,
               normalize_input, compute_dtype, residuals, g):
    from posendf_tpu.models.dfnet import DFNet  # noqa: F401 (docs)
    from posendf_tpu.models.encoder import structure_encoder_apply
    from posendf_tpu.models.activations import resolve
    from posendf_tpu.quat import joint_axis_normalize

    if jnp.dtype(compute_dtype) != jnp.float32:
        # The XLA fallback below differentiates the fp32 idealization of the
        # forward, but the bf16 kernel's values sit on (potentially) the
        # other side of lrelu/relu kinks — the "gradient" would not belong
        # to the function whose value was returned. The solver fast paths
        # never differentiate through this kernel; anyone who does under
        # bf16 should use the XLA model, whose autodiff differentiates the
        # real bf16 computation.
        raise NotImplementedError(
            "differentiating through the fused whole-model forward with "
            f"compute_dtype={compute_dtype!r} is unsupported (the fallback "
            "backward would be the gradient of the fp32 function, not the "
            "bf16 one) — use the XLA model (PoseNDF.apply) for gradients")

    quat, enc_params, dfnet_params = residuals

    def ref_forward(q, ep, dp):
        x = joint_axis_normalize(q) if normalize_input else q
        code = structure_encoder_apply(
            x, ep["w1"], ep["b1"], ep["w2"], ep["b2"],
            parents=parents, activation=activation, beta=beta)
        act, out_act = resolve(activation, beta)
        h = code
        for l in range(num_layers):
            h = h @ dp[f"w{l}"] + dp[f"b{l}"]
            h = act(h) if l < num_layers - 1 else out_act(h)
        return h

    _, pullback = jax.vjp(ref_forward, quat, enc_params, dfnet_params)
    return pullback(g)


_fused_model_core.defvjp(_fused_fwd, _fused_bwd)


def fused_posendf_forward(
    quat: jax.Array,           # (B, 21, 4)
    enc_params,                # {'w1','b1','w2','b2'} stacked encoder weights
    dfnet_params,              # {'w0','b0',...} DFNet weights
    *,
    parents: Tuple[int, ...],
    activation: str = "lrelu",
    beta: float = 100.0,
    tile_b: int = 2048,
    normalize_input: bool = True,
    compute_dtype: str = "float32",
) -> jax.Array:
    """Whole-model fused forward: (B, 21, 4) -> (B, 1) distances.

    tile_b = 2048 (needs the raised scoped-VMEM cap; ~22 MB peak) measures
    fastest on v5e — 50.5M evals/s at 131k batch vs 47.8M at tile 1024 and
    47.3M at 4096; this is the fastest forward path in the framework,
    beating the fused-encoder + XLA-DFNet pipeline (47.6M). tile 512 is the
    16 MB-compatible fallback.
    """
    B = quat.shape[0]
    num_layers = 0
    while f"w{num_layers}" in dfnet_params:
        num_layers += 1
    tile_b = min(tile_b, max(128, 1 << (B - 1).bit_length()))
    pad = (-B) % tile_b
    if pad:
        quat = jnp.concatenate(
            [quat, jnp.zeros((pad,) + quat.shape[1:], quat.dtype)], axis=0)
    out = _fused_model_core(quat, enc_params, dfnet_params, tuple(parents),
                            activation, beta, num_layers, tile_b,
                            bool(normalize_input), compute_dtype)
    return out[:B]
