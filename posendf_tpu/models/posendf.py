"""PoseNDF: the neural unsigned distance field over the pose manifold.

Capability parity with the reference ``PoseNDF`` module
(``model/posendf.py:30-101``): optional StructureEncoder feeding DFNet, with
the reference's input-normalization quirk reproduced exactly — the (B, 21, 4)
pose is normalized across the *joint* axis (``F.normalize(pose, dim=1)``,
``model/posendf.py:71``), not per-quaternion; trained checkpoints bake this
in. Callers always pass unit quaternions, making it a per-column rescale.

Unlike the reference (whose forward entangles loss computation, device moves
and autograd bookkeeping), this module is a pure function (B, 21, 4) ->
(B, 1); losses live in ``posendf_tpu.losses`` and gradients come from
``jax.vjp`` in ``posendf_tpu.field``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from posendf_tpu import kinematics
from posendf_tpu.quat import joint_axis_normalize
from posendf_tpu.models.dfnet import DFNet
from posendf_tpu.models.encoder import StructureEncoder

__all__ = ["PoseNDF"]


class PoseNDF(nn.Module):
    """Distance field d(pose): (B, 21, 4) unit-quaternion pose -> (B, 1)."""

    num_joints: int = 21
    use_encoder: bool = True
    feature_size: int = 6
    dfnet_dims: Tuple[int, ...] = (256, 512, 1024, 512, 256, 64)
    activation: str = "lrelu"
    beta: float = 100.0
    parents: Tuple[int, ...] = kinematics.REFERENCE_PARENTS
    use_fused: bool = False
    ff_enc: bool = False    # NeRF positional encoding on the DFNet input
    ff_freqs: int = 4       # (the reference's unused ff_enc switch, made real)
    compute_dtype: str = "float32"  # 'bfloat16' = MXU fast path on DFNet
    precision: str = "default"      # 'highest' = fp32 MXU passes (parity mode)
    live_head: bool = False         # positive final-bias init (see DFNet)

    def setup(self):
        if self.use_encoder:
            self.enc = StructureEncoder(
                parents=self.parents,
                feature_size=self.feature_size,
                activation=self.activation,
                beta=self.beta,
                use_fused=self.use_fused,
                precision=self.precision,
            )
            in_dim = self.num_joints * self.feature_size
        else:
            self.enc = None
            in_dim = self.num_joints * 4
        if self.ff_enc:
            from posendf_tpu.models.pos_encoder import encoded_dim

            in_dim = encoded_dim(in_dim, self.ff_freqs)
        self.dfnet = DFNet(
            in_dim=in_dim,
            dims=self.dfnet_dims,
            activation=self.activation,
            beta=self.beta,
            compute_dtype=self.compute_dtype,
            precision=self.precision,
            live_head=self.live_head,
        )

    def __call__(self, pose: jax.Array, normalize_input: bool = True) -> jax.Array:
        """Predicted manifold distance for each pose.

        Args:
          pose: (B, 21, 4) quaternions (any leading shape collapsible to B).
          normalize_input: apply the reference's joint-axis normalization
            (on for noisy/query poses, off for the clean manifold branch —
            the reference does NOT normalize ``man_poses``,
            ``model/posendf.py:80-83``).
        Returns:
          (B, 1) non-negative distances.
        """
        pose = pose.reshape(-1, self.num_joints, 4)
        x = joint_axis_normalize(pose) if normalize_input else pose
        if self.enc is not None:
            x = self.enc(x)
        if self.ff_enc:
            from posendf_tpu.models.pos_encoder import positional_encoding

            x = positional_encoding(x.reshape(x.shape[0], -1), self.ff_freqs)
        return self.dfnet(x)
