"""Distance-field evaluation APIs: value, gradient, value-and-gradient.

The reference obtains pose gradients with ``torch.autograd.grad(outputs,
inputs, grad_outputs=ones, create_graph=True)``
(``model/posendf.py:18-27``, ``experiments/sample_poses.py:25-34``). Because
each output distance depends only on its own input pose, that is exactly one
VJP with a ones cotangent — so here it is a single ``jax.vjp`` pullback for
the whole batch (one forward + one backward, no per-sample loop), fully
jittable and differentiable again for the eikonal term.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_field", "Field", "QuantizedField"]


class Field:
    """Thin functional wrapper around a PoseNDF module + params."""

    def __init__(self, module, params):
        self.module = module
        self.params = params

    def distance(self, pose: jax.Array) -> jax.Array:
        """(B, 21, 4) -> (B, 1)."""
        return self.module.apply({"params": self.params}, pose)

    def distance_fused(self, pose: jax.Array) -> jax.Array:
        """Whole-model fused Pallas forward (TPU serving fast path; see
        ``ops/fused_model.py``). Same semantics as ``distance`` for the
        standard encoder+DFNet architecture."""
        from posendf_tpu.ops.fused_model import fused_posendf_forward

        m = self.module
        if not m.use_encoder or m.ff_enc:
            raise ValueError(
                "distance_fused supports the standard encoder+DFNet "
                "architecture (use_encoder=True, ff_enc=False)")
        pose = pose.reshape(-1, m.num_joints, 4)
        return fused_posendf_forward(
            pose, self.params["enc"], self.params["dfnet"],
            parents=m.parents, activation=m.activation, beta=m.beta,
            compute_dtype=m.compute_dtype)

    def quantize_int8(self, calib_poses: jax.Array) -> "QuantizedField":
        """Post-training int8 quantization of the DFNet stack for the
        serving fast path (``ops/fused_int8.py``): the wide layers run on
        the MXU at 2x the bf16 rate. ``calib_poses`` (N, 21, 4) sets the
        static activation scales; a few thousand representative poses
        suffice. Value-only — gradient consumers stay on the f32 paths."""
        from posendf_tpu.ops.fused_int8 import quantize_posendf

        m = self.module
        if not m.use_encoder or m.ff_enc:
            raise ValueError(
                "quantize_int8 supports the standard encoder+DFNet "
                "architecture (use_encoder=True, ff_enc=False)")
        qparams = quantize_posendf(
            self.params["enc"], self.params["dfnet"],
            calib_poses.reshape(-1, m.num_joints, 4),
            parents=m.parents, activation=m.activation, beta=m.beta)
        return QuantizedField(m, qparams)

    def distance_and_grad(self, pose: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return distance_and_grad(self.module, self.params, pose)

    def distance_and_grad_fused(self, pose: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Fused single-kernel (d, dd/dpose) — the TPU solver fast path
        (``ops/fused_grad.py``). Same semantics as ``distance_and_grad`` for
        the standard encoder+DFNet architecture; forward-only (the outputs
        must not be differentiated further)."""
        from posendf_tpu.ops.fused_grad import fused_distance_and_grad

        m = self.module
        if not m.use_encoder or m.ff_enc:
            raise ValueError(
                "distance_and_grad_fused supports the standard encoder+DFNet "
                "architecture (use_encoder=True, ff_enc=False)")
        orig_shape = pose.shape
        pose = pose.reshape(-1, m.num_joints, 4)
        d, g = fused_distance_and_grad(
            pose, self.params["enc"], self.params["dfnet"],
            parents=m.parents, activation=m.activation, beta=m.beta,
            compute_dtype=m.compute_dtype)
        # same contract as distance_and_grad: the gradient comes back in the
        # CALLER's pose shape (e.g. (B, 84) for flat input)
        return d, g.reshape(orig_shape)


class QuantizedField:
    """Int8 serving view of a :class:`Field` (see ``ops/fused_int8.py``).

    ``distance`` runs the int8-MXU Pallas kernel (TPU); ``distance_xla``
    runs the arithmetic-identical pure-XLA emulation (any backend). The
    calibration report (per-layer activation scales) is at
    ``qparams['report']``.

    Persistence: ``save(path)`` writes one self-contained msgpack file
    (quantized layers + encoder + window/report + the module attributes the
    forward needs), ``QuantizedField.load(path)`` restores it with no
    config — the serving counterpart of the f32 checkpoint formats
    (``training/checkpoints.py``). The reference's serving persistence is
    ``torch.load`` of fp32 weights (``model/posendf.py:100-101``); a saved
    int8 field has no analog there.
    """

    _MAGIC = "posendf-int8-v1"

    def __init__(self, module, qparams):
        self.module = module
        self.qparams = qparams

    def save(self, path: str) -> None:
        """Serialize to one msgpack file (atomic tmp-rename write)."""
        import os

        from flax.serialization import msgpack_serialize

        m = self.module
        report = dict(self.qparams["report"])
        report["window"] = list(report.get("window", self.qparams["window"]))
        payload = {
            "magic": self._MAGIC,
            "meta": {
                "num_joints": int(m.num_joints),
                "parents": [int(p) for p in m.parents],
                "activation": str(m.activation),
                "beta": float(m.beta),
                "window": list(self.qparams["window"]),
                "report": report,
            },
            "enc": jax.tree_util.tree_map(np.asarray, self.qparams["enc"]),
            "layers": {
                str(i): jax.tree_util.tree_map(np.asarray, lyr)
                for i, lyr in enumerate(self.qparams["layers"])
            },
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(msgpack_serialize(payload))
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "QuantizedField":
        """Restore a :meth:`save` file. Needs no config: the module
        attributes the int8 forward reads (parents/activation/beta) are in
        the payload, exposed through a lightweight module view."""
        from types import SimpleNamespace

        from flax.serialization import msgpack_restore

        with open(path, "rb") as f:
            payload = msgpack_restore(f.read())
        if payload.get("magic") != cls._MAGIC:
            raise ValueError(
                f"{path!r} is not a posendf_tpu int8 field file")
        meta = payload["meta"]
        report = dict(meta["report"])
        report["window"] = tuple(report["window"])
        layers = [jax.tree_util.tree_map(jnp.asarray, payload["layers"][str(i)])
                  for i in range(len(payload["layers"]))]
        qparams = {
            "enc": jax.tree_util.tree_map(jnp.asarray, payload["enc"]),
            "layers": layers,
            "window": tuple(meta["window"]),
            "report": report,
        }
        module = SimpleNamespace(
            num_joints=int(meta["num_joints"]),
            parents=tuple(int(p) for p in meta["parents"]),
            activation=str(meta["activation"]),
            beta=float(meta["beta"]),
        )
        return cls(module, qparams)

    def distance(self, pose: jax.Array) -> jax.Array:
        from posendf_tpu.ops.fused_int8 import fused_posendf_forward_int8

        m = self.module
        pose = pose.reshape(-1, m.num_joints, 4)
        return fused_posendf_forward_int8(
            pose, self.qparams, parents=m.parents,
            activation=m.activation, beta=m.beta)

    def distance_xla(self, pose: jax.Array) -> jax.Array:
        from posendf_tpu.ops.fused_int8 import reference_int8_forward

        m = self.module
        pose = pose.reshape(-1, m.num_joints, 4)
        return reference_int8_forward(
            pose, self.qparams, parents=m.parents,
            activation=m.activation, beta=m.beta)


def distance_fn(module, params) -> Callable[[jax.Array], jax.Array]:
    def f(pose: jax.Array) -> jax.Array:
        return module.apply({"params": params}, pose)

    return f


def distance_and_grad(module, params, pose: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched (d, dd/dpose): (B, 21, 4) -> ((B, 1), (B, 21, 4)).

    The gradient is taken w.r.t. the *raw* input pose, through the joint-axis
    normalization inside the model — matching the reference, which sets
    ``requires_grad`` on the pre-normalization pose (``model/posendf.py:64-71``).
    """
    f = distance_fn(module, params)
    d, pullback = jax.vjp(f, pose)
    (g,) = pullback(jnp.ones_like(d))
    return d, g


def make_field(module, params) -> Field:
    return Field(module, params)


def load_field(ckpt_path=None, config=None) -> Field:
    """One-line entry point: checkpoint file -> ready :class:`Field`.

    The switching path for a reference user (their flow:
    ``torch.load('checkpoint_epoch_best.tar')`` into ``PoseNDF`` by hand,
    ``model/train_posendf.py:47-56``):

        field = posendf_tpu.load_field("checkpoint_epoch_best.tar")
        d = field.distance(poses)            # or distance_and_grad, ...

    ``ckpt_path``: the reference's torch ``.tar`` (loaded via the importer,
    <=1e-8 parity) or this framework's ``.msgpack``; None gives a
    fresh-initialized field. ``config``: a :class:`PoseNDFConfig`, a YAML
    path, or None for the hyperparameters of record (``configs/amass.yaml``
    == the reference defaults).
    """
    import os

    from posendf_tpu.config import PoseNDFConfig, load_config

    if config is None:
        cfg = PoseNDFConfig()
    elif isinstance(config, (str, os.PathLike)):
        cfg = load_config(os.fspath(config))
    else:
        cfg = config
    module = cfg.make_model()
    # init through a non-Pallas clone: strenc.fused configs would run a
    # Mosaic kernel inside init (crashes on CPU); the param tree is
    # identical, and the returned Field keeps the requested fused module
    init_mod = (module.clone(use_fused=False)
                if getattr(module, "use_fused", False) else module)
    params = init_mod.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    if ckpt_path:
        path = os.fspath(ckpt_path)
        if path.endswith(".tar"):
            from posendf_tpu.training.torch_import import load_torch_checkpoint

            params, _ = load_torch_checkpoint(path)
        elif os.path.isdir(path):
            # a CheckpointStore directory (the Trainer's rolling pair):
            # msgpack files or an orbax store, auto-detected
            from posendf_tpu.training.checkpoints import LATEST, CheckpointStore
            from posendf_tpu.training.trainer import make_optimizer

            backend = ("msgpack"
                       if os.path.exists(os.path.join(path, LATEST))
                       else "orbax")
            opt_state = make_optimizer(
                cfg.train.optimizer_param,
                cfg.train.weight_decay).init(params)
            restored = CheckpointStore(path, backend=backend).restore(
                {"params": params, "opt_state": opt_state})
            if restored is None:
                raise FileNotFoundError(
                    f"no checkpoint found in directory {path!r} "
                    f"(tried backend {backend!r})")
            params = restored[0]["params"]
        else:
            import flax.serialization as fser

            with open(path, "rb") as f:
                payload = fser.from_bytes(
                    {"epoch": 0, "state": {"params": params}}, f.read())
            params = payload["state"]["params"]
    return Field(module, params)
