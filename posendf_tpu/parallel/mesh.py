"""Device-mesh and sharding utilities.

The reference has no distributed machinery at all (SURVEY.md §2.2) — one GPU,
DataLoader workers, and a Slurm shell fan-out for data prep. The TPU-native
equivalent is one SPMD program over a ``jax.sharding.Mesh``:

  * axis ``"data"``  — batch data parallelism for training / eval / kNN
    labeling (gradient psum rides ICI; the model is ~1.3M params and is
    replicated),
  * axis ``"seq"``   — frame parallelism for sequence optimization (motion
    denoising); the temporal loss needs a 1-frame halo exchange
    (``parallel/halo.py``).

Tested on the virtual 8-device CPU backend; identical code runs on a v5e pod
slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["init_distributed", "make_mesh", "data_sharding", "replicated",
           "shard_batch", "P"]


def init_distributed(**kwargs) -> int:
    """Initialize multi-host JAX (one process per host of a pod slice).

    Thin wrapper over ``jax.distributed.initialize`` — on TPU pods the
    coordinator address, process count and process id auto-detect from the
    TPU metadata, so a bare ``init_distributed()`` at program start is
    enough; kwargs pass through for non-auto environments
    (``coordinator_address=``, ``num_processes=``, ``process_id=``).
    After this, ``jax.devices()`` spans the whole slice and
    ``make_mesh(("data",))`` builds the global mesh; everything else in
    this package (the SPMD train step, sharded labeling, frame-sharded
    denoising) is already formulated over ``jax.devices()`` and runs
    unchanged. Idempotent: a second call is a no-op.

    Returns the process index (0 on single-host setups or if distributed
    initialization is unavailable). A FAILED initialization in an
    explicitly-requested multi-host setup re-raises: silently degrading
    each host to a local-only process_index-0 run (every host training the
    whole data, racing on the same checkpoint paths) is far worse than
    crashing at startup.
    """
    # true idempotency: ask jax, don't parse exception strings (jax 0.9's
    # double-init message is "distributed.initialize should only be called
    # once.", NOT "already initialized")
    try:
        if jax.distributed.is_initialized():
            return jax.process_index()
    except AttributeError:
        pass  # older jax: fall through to the message check below
    explicit = bool(kwargs)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # only a true double-initialization is ignorable; jaxlib runtime
        # errors (e.g. coordinator unreachable) subclass RuntimeError too
        msg = str(e).lower()
        if ("already initialized" not in msg
                and "only be called once" not in msg):
            if explicit:
                raise
            return 0  # auto-detect found no pod env: local-only mode
    except Exception:
        if explicit:
            raise
        return 0  # single-host / no coordinator detectable: local-only mode
    return jax.process_index()


def make_mesh(
    axes: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over all (or the given) devices.

    Defaults to a 1-D ``data`` mesh over every addressable device — the right
    layout for this workload (SURVEY.md §2.2: batch DP is the only collective
    the model needs; no TP/PP at 1.3M params).
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a pytree of host arrays with the leading dim sharded."""
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
