"""DFNet: the distance head mapping the 126-dim structure code to d >= 0.

Capability parity with the reference ``DFNet``
(``model/network/net_modules.py:9-72``): an MLP
``in_dim -> dims... -> 1`` with the configured activation between layers and
a final output activation (ReLU for lrelu/relu configs, Softplus for
softplus) clamping the predicted distance to be non-negative.

This is where the FLOPs are (~1.36 MFLOP-pairs per pose for the default
[256, 512, 1024, 512, 256, 64] stack): plain dense layers that XLA tiles
straight onto the MXU. Weights are stored (in, out) so forwards are
``x @ w + b`` with no transposes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu.models.activations import resolve

__all__ = ["DFNet"]


def _torch_linear_init(rng: jax.Array, fan_in: int, fan_out: int) -> Tuple[jax.Array, jax.Array]:
    bound = 1.0 / np.sqrt(fan_in)
    k1, k2 = jax.random.split(rng)
    w = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
    return w, b


class DFNet(nn.Module):
    """MLP distance head. (B, in_dim) -> (B, 1), non-negative.

    ``compute_dtype='bfloat16'`` casts activations and weights to bf16 for
    the matmuls (fp32 accumulation via preferred_element_type, fp32 bias and
    nonlinearity) — the MXU's native fast path. Params are stored fp32 either
    way. Note XLA-TPU's DEFAULT precision already runs fp32 matmuls as bf16
    MXU passes (measured distance drift vs CPU fp32: ~1.8e-4); set
    ``precision='highest'`` for true-fp32 passes (~2e-5 drift) when the 1e-4
    reference-parity bar matters more than the ~15% speed cost.
    """

    in_dim: int = 126
    dims: Tuple[int, ...] = (256, 512, 1024, 512, 256, 64)
    activation: str = "lrelu"
    beta: float = 100.0
    compute_dtype: str = "float32"
    precision: str = "default"   # 'highest' = fp32 MXU passes (parity mode)
    # The reference's torch-default init (matched by _torch_linear_init) is
    # a coin flip for lrelu/relu configs: the deep stack contracts the input
    # signal so z_last ≈ b_last + ε is near-CONSTANT across poses, and when
    # the flip lands negative the final ReLU clamps d ≡ 0 for EVERY pose —
    # all training gradients are exactly zero and training silently never
    # starts (measured: 2/6 torch-oracle seeds dead, 2/3 here). live_head
    # replaces the last bias draw with a small positive constant so d > 0
    # from step one. Off by default per the parity-quirk convention;
    # trained-checkpoint loading is unaffected either way.
    live_head: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act, out_act = resolve(self.activation, self.beta)
        widths = (self.in_dim,) + tuple(self.dims) + (1,)
        x = x.reshape(x.shape[0], -1)
        cdtype = jnp.dtype(self.compute_dtype)
        prec = (jax.lax.Precision.HIGHEST if self.precision == "highest"
                else jax.lax.Precision.DEFAULT)
        n_layers = len(widths) - 1
        for l in range(n_layers):
            fan_in, fan_out = widths[l], widths[l + 1]
            last = l == n_layers - 1
            w = self.param(f"w{l}", lambda rng, fi=fan_in, fo=fan_out: _torch_linear_init(rng, fi, fo)[0])
            if last and self.live_head:
                b = self.param(f"b{l}", lambda rng, fo=fan_out: jnp.full((fo,), 0.1))
            else:
                b = self.param(f"b{l}", lambda rng, fi=fan_in, fo=fan_out: _torch_linear_init(rng, fi, fo)[1])
            x = jnp.dot(x.astype(cdtype), w.astype(cdtype),
                        preferred_element_type=jnp.float32,
                        precision=prec) + b
            if l < n_layers - 1:
                # Inter-layer activations are MATERIALIZED in compute_dtype:
                # at serving batches the forward is HBM-bandwidth-bound, and
                # leaving these buffers fp32 (only casting at the matmul
                # input) halves none of the traffic — measured 1.06x from
                # bf16 until this downcast was fused into the activation.
                # Accumulation stays fp32 inside the MXU either way.
                x = act(x).astype(cdtype)
        return out_act(x)
