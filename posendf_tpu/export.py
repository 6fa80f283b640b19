"""Serving export: serialize the compiled model with ``jax.export``.

A deployment capability the reference has no analog for (its serving story
is "clone the repo and load the .tar in torch"): the field forward — or a
whole N-step manifold-projection program — is staged to StableHLO with the
trained parameters baked in, serialized to one self-contained artifact
file, and reloaded anywhere a jax runtime exists with no posendf_tpu (or
flax) dependency. The batch dimension is symbolic by default, so one
artifact serves any batch size; lowering for multiple platforms (e.g.
``("tpu", "cpu")``) produces a single artifact that runs on either.

The exported programs use the portable XLA paths (``module.apply``, the
``lax.scan`` projector) rather than the Pallas kernels: Mosaic custom
calls would pin the artifact to the exact TPU generation they were
lowered for, while the XLA paths are retuned by the loading runtime.

CLI: ``python -m posendf_tpu.cli export --ckpt ... --out model.jaxexport``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

__all__ = ["export_forward", "export_forward_int8", "export_project",
           "save_artifact", "load_artifact"]

_VERSION_KEY = b"POSENDF_TPU_EXPORT_V1\n"


def _batch_spec(batch: Optional[int]) -> jax.ShapeDtypeStruct:
    """(b, 21, 4) pose spec; symbolic b when batch is None."""
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch
    return jax.ShapeDtypeStruct((b, 21, 4), jnp.float32)


def _portable(module):
    """The module with Pallas paths disabled: a ``strenc.fused: true``
    config would otherwise bake a Mosaic custom call into the artifact —
    jax.export refuses it on TPU (no compatibility guarantee) and it cannot
    even trace on CPU. Params are identical either way."""
    if getattr(module, "use_fused", False):
        return module.clone(use_fused=False)
    return module


def export_forward(module, params, *, batch: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None):
    """Stage ``pose (b, 21, 4) -> distance (b, 1)`` with params baked in.

    ``batch=None`` exports a symbolic batch dimension (one artifact, any
    batch size). ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` for a multi-platform artifact.
    """
    module = _portable(module)
    fn = jax.jit(lambda pose: module.apply({"params": params}, pose))
    return jexport.export(fn, platforms=platforms)(_batch_spec(batch))


def export_forward_int8(quantized_field, *, batch: Optional[int] = None,
                        platforms: Optional[Sequence[str]] = None):
    """Stage the INT8 forward ``pose (b, 21, 4) -> distance (b, 1)`` with
    the quantized params baked in.

    Lowers :func:`posendf_tpu.ops.fused_int8.reference_int8_forward` — the
    pure-XLA int8 arithmetic (same quantize/int8-dot/dequantize ops as the
    Pallas serving kernel, no Mosaic custom calls) — so the artifact keeps
    the same portability story as the f32 exports: symbolic batch by
    default, multi-platform lowering, retuned by the loading runtime. On
    TPU backends XLA maps the int8 ``dot_general`` onto the MXU's double-
    rate int8 path. ``quantized_field``: a :class:`posendf_tpu.field.
    QuantizedField` (from ``Field.quantize_int8`` or ``QuantizedField.
    load``).
    """
    from posendf_tpu.ops.fused_int8 import reference_int8_forward

    m = quantized_field.module
    qparams = quantized_field.qparams

    def fn(pose):
        return reference_int8_forward(
            pose, qparams, parents=m.parents, activation=m.activation,
            beta=m.beta)

    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch
    spec = jax.ShapeDtypeStruct((b, m.num_joints, 4), jnp.float32)
    return jexport.export(jax.jit(fn), platforms=platforms)(spec)


def export_project(module, params, *, steps: int = 10,
                   batch: Optional[int] = None,
                   platforms: Optional[Sequence[str]] = None,
                   renormalize: bool = True, tangent: bool = False):
    """Stage the whole ``steps``-step projection solve as one program:
    ``pose (b, 21, 4) -> (projected (b, 21, 4), dist_history (steps, b))``.

    The scan length is static (baked into the artifact); the batch is
    symbolic by default like :func:`export_forward`.
    """
    from posendf_tpu.projection import project

    module = _portable(module)

    def fn(pose):
        out, hist = project(module, params, pose, steps=steps,
                            renormalize=renormalize, tangent=tangent)
        return out, hist

    return jexport.export(jax.jit(fn), platforms=platforms)(
        _batch_spec(batch))


def save_artifact(exported, path: str) -> None:
    """Serialize an ``Exported`` to one self-contained file."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(_VERSION_KEY)
        f.write(blob)


def load_artifact(path: str):
    """Load a saved artifact; returns the ``Exported`` (invoke via
    ``.call(pose)``). Needs only jax at load time — no posendf_tpu."""
    with open(path, "rb") as f:
        payload = f.read()
    if not payload.startswith(_VERSION_KEY):
        raise ValueError(
            f"{path!r} is not a posendf_tpu export artifact "
            "(missing version header)")
    return jexport.deserialize(payload[len(_VERSION_KEY):])
