"""Frame-sharded temporal stencils: the 1-frame halo exchange.

The workload's only cross-element coupling is the adjacent-frame temporal
loss in sequence optimization (``experiments/motion_denoise.py:88-89``:
``vertices[:-1] - vertices[1:]``). When a long clip is sharded over chips on
a ``seq`` mesh axis, each shard needs exactly one neighbor frame — the
degenerate, stencil-width-1 cousin of ring attention (SURVEY.md §5).

Two equivalent implementations:
  * implicit — write ``x[:-1] - x[1:]`` under jit with sharded inputs and let
    the SPMD partitioner insert the collective-permute;
  * explicit — ``shard_map`` + ``ppermute`` (this module), the idiom that
    scales to wider stencils and keeps the communication visible.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["adjacent_difference_sharded", "temporal_loss_sharded"]


def adjacent_difference_sharded(x: jax.Array, mesh: Mesh, axis: str = "seq") -> jax.Array:
    """Sharded x[:-1] - x[1:] over the leading (frame) axis.

    Each shard sends its FIRST frame to its left neighbor (that neighbor
    needs it as the "t+1" of its own last frame) via ``ppermute`` over ICI,
    then computes its local differences. The last shard's trailing halo is
    dropped, matching the unsharded op's (T-1, ...) result.
    """
    n = mesh.shape[axis]

    def local(x_shard):
        idx = jax.lax.axis_index(axis)
        # left neighbor (idx-1) receives our first frame
        halo = jax.lax.ppermute(
            x_shard[:1],
            axis,
            perm=[(i, (i - 1) % n) for i in range(n)],
        )
        ext = jnp.concatenate([x_shard, halo], axis=0)  # (t+1, ...)
        d = ext[:-1] - ext[1:]
        # on the last shard the received halo wraps from shard 0 — mask the
        # final difference to zero there; the caller slices it away
        is_last = idx == n - 1
        d = d.at[-1].set(jnp.where(is_last, jnp.zeros_like(d[-1]), d[-1]))
        return d

    spec = P(axis)
    mapped = jax.shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)(x)
    # the global result has one trailing masked row; drop it
    return mapped[:-1]


def temporal_loss_sharded(verts: jax.Array, mesh: Mesh, axis: str = "seq") -> jax.Array:
    """Mean adjacent-frame vertex displacement, frame-sharded.

    Equals ``mean(norm(verts[:-1] - verts[1:], axis=-1))`` (the reference's
    temporal term) but computed with one 1-frame ppermute per step instead of
    resharding.
    """
    d = adjacent_difference_sharded(verts, mesh, axis)
    return jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12))
