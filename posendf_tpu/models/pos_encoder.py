"""NeRF-style sinusoidal positional encoding.

Parity with the reference's ``PosEncoder`` (``model/network/net_utils.py:5-22``
— defined for the ``ff_enc`` config switch, never used in the active path).
Available here as a real feature: wrap the DFNet input with
``ff_enc=True`` in the config to lift the 126-dim code into
``(2 * num_frequencies [+ 1]) * dim`` Fourier features.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["positional_encoding", "encoded_dim"]


def positional_encoding(x: jax.Array, num_frequencies: int,
                        include_identity: bool = True) -> jax.Array:
    """(..., D) -> (..., D * (2 * num_frequencies + include_identity)).

    Frequencies 2^0 .. 2^(F-1), matching the reference's
    ``torch.pow(2, linspace(0, F-1, F))``; layout is [identity?, sin(f0 x),
    cos(f0 x), sin(f1 x), cos(f1 x), ...] concatenated on the last axis.
    """
    parts = []
    if include_identity:
        parts.append(x)
    for i in range(num_frequencies):
        f = float(2 ** i)
        parts.append(jnp.sin(x * f))
        parts.append(jnp.cos(x * f))
    return jnp.concatenate(parts, axis=-1)


def encoded_dim(dim: int, num_frequencies: int, include_identity: bool = True) -> int:
    return dim * (2 * num_frequencies + (1 if include_identity else 0))
