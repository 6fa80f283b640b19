"""Int8-MXU serving path: the whole-model fused forward with the DFNet's
wide layers quantized to int8.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS peak), and the
fused whole-model forward (``ops/fused_model.py``) is compute-bound at
~69% of bf16 peak — so post-training int8 quantization is the one
remaining large single-chip lever for the serving / projection fast path.
The reference has no analog (its serving story is fp32 torch eval,
``model/posendf.py:35-45``); this is a beyond-parity TPU capability.

Scheme (static post-training quantization, symmetric):
  - **Which layers**: the maximal contiguous window of DFNet layers whose
    in/out dims are multiples of 128 and that are not the output layer —
    for the architecture of record (126-256-512-1024-512-256-64-1) that is
    layers 1..4 = 96.4% of the model's MACs. Layer 0 stays f32 (126-dim
    input would need lane padding) and the 64-wide tail stays f32
    (sub-128 lanes; 1.2% of MACs) — zero relayout-hazard padding anywhere.
  - **Activations**: per-INPUT-CHANNEL static symmetric scales from a
    calibration batch, ``sa[i] = max|x[:, i]| / 127``, folded into the
    weights before weight quantization: ``x @ w == (x / sa) @ (sa * w)``
    exactly, so the per-channel input scaling costs one static row
    rescale at quantize time plus one lane-broadcast multiply in-kernel.
    ReLU-family nets have strongly channel-heterogeneous activation
    ranges — per-tensor scales measured 7.2% MAE/std on the trained L=8
    checkpoint vs ~1% for per-channel (tests/test_fused_int8.py pins it).
  - **Weights**: per-output-channel symmetric int8 on the row-rescaled
    matrix, ``sw[j] = max_i |sa[i] * w[i, j]| / 127``.
  - **Kernel dataflow**: requantize x with the (1, in) inverse-scale row
    (multiply + round + clip + cast, VPU), x_q int8 @ w_q int8 -> int32
    accumulators (MXU), dequantize with the per-output-channel ``sw``
    (one lane-broadcast multiply), add bias, activation in f32.

Quantization error is measured, not assumed: :func:`quantize_posendf`
returns the calibration report (max |activation| per layer), and
``tests/test_fused_int8.py`` pins the int8-vs-f32 distance agreement on
both random and golden-checkpoint weights.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posendf_tpu.models.activations import make_activation, make_output_activation

__all__ = ["quantize_posendf", "fused_posendf_forward_int8", "int8_window"]


def int8_window(dims_in: Sequence[int], dims_out: Sequence[int]) -> Tuple[int, int]:
    """[start, stop) of the maximal contiguous run of quantizable layers.

    A layer qualifies if both its in and out dims are multiples of 128 (no
    lane padding, int8's (32, 128) minimum tile packs exactly) and it is not
    the final output layer (kept f32: its 1-wide output joins the output
    activation). Returns (0, 0) when nothing qualifies.
    """
    n = len(dims_in)
    ok = [dims_in[l] % 128 == 0 and dims_out[l] % 128 == 0 and l < n - 1
          for l in range(n)]
    best = (0, 0)
    start = None
    for l in range(n + 1):
        if l < n and ok[l]:
            if start is None:
                start = l
        else:
            if start is not None and (l - start) > (best[1] - best[0]):
                best = (start, l)
            start = None
    return best


def _quant_sym(x: jax.Array, inv_scale) -> jax.Array:
    """Symmetric int8 quantization: round-half-even, clip to [-127, 127]."""
    return jnp.clip(jnp.round(x * inv_scale), -127.0, 127.0).astype(jnp.int8)


def quantize_posendf(
    enc_params,
    dfnet_params,
    calib_poses: jax.Array,     # (N, 21, 4) unit quats, pre-normalization
    *,
    parents: Tuple[int, ...],
    activation: str = "lrelu",
    beta: float = 100.0,
    normalize_input: bool = True,
) -> Dict:
    """Post-training quantization of the DFNet stack.

    Runs the f32 XLA model over ``calib_poses`` to record per-input-channel
    activation ranges, folds them into the weights, then quantizes per
    output channel. Returns a params dict for
    :func:`fused_posendf_forward_int8`::

        {"enc": enc_params (f32, unchanged),
         "layers": [per-layer dict: {"w","b"} f32 or
                    {"wq","dq","b","inv_sa"} int8],
         "window": (start, stop),
         "report": {"sa_max": [...], "w_absmax": [...],
                    "floored_channels": [...]}}

    ``report['floored_channels']`` counts, per quantized layer, input
    channels whose calibration absmax sat below the numeric floor (dead or
    uncovered during calibration) — nonzero counts on a layer with live
    serving traffic mean the calibration set under-covers it.
    """
    from posendf_tpu.models.encoder import structure_encoder_apply
    from posendf_tpu.quat import joint_axis_normalize

    num_layers = 0
    while f"w{num_layers}" in dfnet_params:
        num_layers += 1
    dims_in = [dfnet_params[f"w{l}"].shape[0] for l in range(num_layers)]
    dims_out = [dfnet_params[f"w{l}"].shape[1] for l in range(num_layers)]
    start, stop = int8_window(dims_in, dims_out)

    act = make_activation(activation, beta)

    # f32 reference forward, capturing the input of every layer
    x = joint_axis_normalize(calib_poses) if normalize_input else calib_poses
    code = structure_encoder_apply(
        x, enc_params["w1"], enc_params["b1"], enc_params["w2"],
        enc_params["b2"], parents=parents, activation=activation, beta=beta)
    inputs: List[jax.Array] = []
    h = code
    for l in range(num_layers - 1):  # output layer's input never quantized
        inputs.append(h)
        h = act(h @ dfnet_params[f"w{l}"] + dfnet_params[f"b{l}"])

    layers: List[Dict] = []
    report = {"sa_max": [], "w_absmax": [], "floored_channels": [],
              "window": (start, stop)}
    for l in range(num_layers):
        w = dfnet_params[f"w{l}"]
        b = dfnet_params[f"b{l}"]
        if start <= l < stop:
            # per-input-channel activation scale, floored so a channel that
            # is ~0 over the CALIBRATION set can't blow up 1/sa — its weight
            # row then quantizes to ~0, which matches its contribution as
            # long as the channel stays ~0 at serving time too. Standard
            # static-PTQ caveat: a channel the calibration set under-covers
            # saturates at +-127 when it activates later; the per-layer
            # under-covered-channel counts are surfaced in
            # report['floored_channels'] so callers can detect a
            # non-representative calibration set.
            raw_absmax = jnp.max(jnp.abs(inputs[l]), axis=0)     # (in,)
            floor = jnp.maximum(1e-6 * jnp.max(raw_absmax), 1e-12)
            absmax = jnp.maximum(raw_absmax, floor)
            sa = absmax / 127.0                                  # (in,)
            w_folded = sa[:, None] * w                           # (in, out)
            sw = jnp.maximum(jnp.max(jnp.abs(w_folded), axis=0),
                             1e-12) / 127.0                      # (out,)
            wq = _quant_sym(w_folded, 1.0 / sw[None, :])
            layers.append({
                "wq": wq,                                    # (in, out) int8
                "dq": sw[None, :].astype(jnp.float32),       # (1, out)
                "b": jnp.asarray(b, jnp.float32),
                "inv_sa": (1.0 / sa)[None, :].astype(jnp.float32),  # (1, in)
            })
            report["sa_max"].append(float(jnp.max(sa) * 127.0))
            report["w_absmax"].append(float(jnp.max(jnp.abs(w))))
            report["floored_channels"].append(
                int(jnp.sum(raw_absmax < floor)))
        else:
            layers.append({"w": jnp.asarray(w, jnp.float32),
                           "b": jnp.asarray(b, jnp.float32)})
    return {
        "enc": enc_params,
        "layers": layers,
        "window": (start, stop),
        "report": report,
    }


def _int8_kernel(parents_ref, pmask_ref, q_ref,
                 w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref,
                 *refs,
                 num_joints, kinds, activation, beta):
    """Encoder chain (f32, as ops/fused_model.py) + mixed f32/int8 DFNet.

    ``kinds``: per-layer static tag, 'f32' (refs: w, b) or 'i8'
    (refs: wq, dq, b, inv_sa — per-input-channel requant scale row).
    """
    n_ref = sum(2 if k == "f32" else 4 for k in kinds)
    layer_refs = refs[:n_ref]
    out_ref = refs[n_ref]
    feats = refs[n_ref + 1]
    act = make_activation(activation, beta)
    out_act = make_output_activation(activation, beta)

    # ---- encoder chain (feature, batch) — see fused_encoder.py ----
    feats[0] = jnp.zeros(feats.shape[1:], feats.dtype)

    def body(j, _):
        q = q_ref[j]
        p = jnp.maximum(parents_ref[j], 0)
        h = (
            jnp.dot(w1a_ref[j], q, preferred_element_type=jnp.float32)
            + pmask_ref[j] * jnp.dot(w1b_ref[j], feats[p],
                                     preferred_element_type=jnp.float32)
        )
        h = act(h + b1_ref[j][:, None])
        f = jnp.dot(w2_ref[j], h, preferred_element_type=jnp.float32)
        feats[j] = act(f + b2_ref[j][:, None])
        return 0

    jax.lax.fori_loop(0, num_joints, body, 0)

    # ---- one transpose to (batch, code), then the mixed DFNet stack ----
    J, F, T = feats.shape
    x = feats[...].reshape(J * F, T).T            # (tile, 126) f32
    r = 0                                          # ref cursor
    n_layers = len(kinds)
    for l, kind in enumerate(kinds):
        last = l == n_layers - 1
        if kind == "f32":
            w, b = layer_refs[r], layer_refs[r + 1]
            r += 2
            y = jnp.dot(x, w[...], preferred_element_type=jnp.float32)
            y = y + b[...][None, :]
            x = out_act(y) if last else act(y)
        else:
            wq, dq, b, inv_sa = layer_refs[r:r + 4]
            r += 4
            xq = _quant_sym(x, inv_sa[...])
            y = jax.lax.dot_general(
                xq, wq[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * dq[...] + b[...][None, :]
            x = out_act(y) if last else act(y)
    out_ref[...] = x                              # (tile, 1)


def _layer_operands(layers):
    """(args, specs, kinds) for the mixed f32/int8 layer stack."""
    args, specs, kinds = [], [], []
    for lyr in layers:
        if "wq" in lyr:
            kinds.append("i8")
            group = (lyr["wq"], lyr["dq"], lyr["b"], lyr["inv_sa"])
        else:
            kinds.append("f32")
            group = (lyr["w"], lyr["b"])
        for a in group:
            args.append(a)
            specs.append(pl.BlockSpec(a.shape,
                                      lambda i, *_, n=a.ndim: (0,) * n,
                                      memory_space=pltpu.VMEM))
    return args, specs, tuple(kinds)


def _f32(b):
    return jnp.asarray(b, jnp.float32)


def fused_posendf_forward_int8(
    quat: jax.Array,            # (B, 21, 4)
    qparams: Dict,              # from quantize_posendf
    *,
    parents: Tuple[int, ...],
    activation: str = "lrelu",
    beta: float = 100.0,
    tile_b: int = 4096,
    normalize_input: bool = True,
) -> jax.Array:
    """Int8-MXU whole-model forward: (B, 21, 4) -> (B, 1) distances.

    Forward-only (serving / projection value path). Gradient consumers use
    the f32 paths — quantization error would make d(int8)/dq a gradient of
    a staircase.

    Measured on v5e at 131k batch (scripts/int8_bench.py, f32 fused kernel
    51.5-52.4M evals/s in the same sessions): tile 1024 64.7M, 2048 75.3M,
    **4096 82.1M (1.59x f32)**, 8192 74.5M, 16384 79.9M — tile 4096 is the
    sweet spot (the larger tiles trade double-buffer headroom for no MXU
    gain).
    """
    from posendf_tpu.ops.fused_grad import _common_specs
    from posendf_tpu.quat import joint_axis_normalize

    B = quat.shape[0]
    J = len(parents)
    tile_b = min(tile_b, max(128, 1 << (B - 1).bit_length()))
    pad = (-B) % tile_b
    x = joint_axis_normalize(quat) if normalize_input else quat
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    Bp = x.shape[0]

    enc = qparams["enc"]
    q_t = jnp.transpose(x, (1, 2, 0))                      # (J, 4, Bp)
    w1 = enc["w1"]
    w1a = jnp.transpose(w1[:, :4, :], (0, 2, 1))           # (J, H, 4)
    w1b = jnp.transpose(w1[:, 4:, :], (0, 2, 1))           # (J, H, F)
    w2t = jnp.transpose(enc["w2"], (0, 2, 1))              # (J, F, H)
    parents_arr = jnp.asarray(parents, jnp.int32)
    pmask = jnp.asarray([0.0 if p == -1 else 1.0 for p in parents],
                        jnp.float32)
    H = w1a.shape[1]
    F = w1b.shape[2]

    layer_args, layer_specs, kinds = _layer_operands(qparams["layers"])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # parents, pmask
        grid=(Bp // tile_b,),
        in_specs=_common_specs(J, H, F, tile_b) + layer_specs,
        out_specs=pl.BlockSpec((tile_b, 1), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((J, F, tile_b), jnp.float32)],
    )
    kernel = functools.partial(
        _int8_kernel, num_joints=J, kinds=kinds,
        activation=activation, beta=beta)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), quat.dtype),
    )(parents_arr, pmask, q_t, w1a, w1b, _f32(enc["b1"]),
      w2t, _f32(enc["b2"]), *layer_args)
    return out[:B]


def reference_int8_forward(quat, qparams, *, parents, activation="lrelu",
                           beta=100.0, normalize_input=True):
    """Pure-XLA emulation of the int8 kernel's arithmetic (same quantize /
    dequantize ops, same layer kinds) — the oracle the kernel is tested
    against, and a CPU-runnable int8 path for environments without Mosaic."""
    from posendf_tpu.models.encoder import structure_encoder_apply
    from posendf_tpu.quat import joint_axis_normalize

    act = make_activation(activation, beta)
    out_act = make_output_activation(activation, beta)
    x = joint_axis_normalize(quat) if normalize_input else quat
    enc = qparams["enc"]
    h = structure_encoder_apply(
        x, enc["w1"], enc["b1"], enc["w2"], enc["b2"],
        parents=parents, activation=activation, beta=beta)
    n = len(qparams["layers"])
    for l, lyr in enumerate(qparams["layers"]):
        last = l == n - 1
        if "wq" in lyr:
            xq = _quant_sym(h, lyr["inv_sa"])
            y = jax.lax.dot_general(
                xq, lyr["wq"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * lyr["dq"] + lyr["b"][None, :]
        else:
            y = h @ lyr["w"] + lyr["b"][None, :]
        h = out_act(y) if last else act(y)
    return h
