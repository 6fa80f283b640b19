"""Structure encoder: hierarchical per-joint pose encoding, TPU-first.

Capability parity with the reference ``StructureEncoder``
(``model/network/net_modules.py:114-170``): 21 tiny two-layer MLPs ("BoneMLP",
``net_modules.py:75-111``), one per SMPL body joint, each consuming its own
unit quaternion (4) concatenated with its parent's 6-dim feature; outputs are
concatenated to a (B, 126) code.

TPU-native design — NOT a translation of the reference's Python loop:

  * All 21 BoneMLPs share shapes once root inputs are zero-padded from 4 to
    10 (the pad columns multiply an identically-zero parent feature, so the
    math is unchanged). Weights live in four stacked tensors
    ``w1 (J,10,H)``, ``b1 (J,H)``, ``w2 (J,H,F)``, ``b2 (J,F)``.
  * Joints are evaluated level-by-level over the kinematic tree
    (``kinematics.level_schedule``): one batched einsum per level instead of
    one matmul per joint — sequential depth 12 instead of 21, and each step
    is a single fused XLA op over (B * joints_in_level) rows.
  * The whole chain is also available as a single fused Pallas kernel
    (``posendf_tpu.ops.fused_encoder``) selected via ``use_fused``.

Checkpoint parity: the torch state dict (keys ``enc.net.{i}.net.{0,2}.*``)
maps losslessly onto the stacked tensors — see
``posendf_tpu.training.torch_import``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu import kinematics
from posendf_tpu.models.activations import make_activation

__all__ = ["StructureEncoder"]


def _stacked_linear_init(rng: jax.Array, num_joints: int, fan_in_per_joint: Sequence[int],
                         fan_out: int) -> Tuple[jax.Array, jax.Array]:
    """torch.nn.Linear-style U(-1/sqrt(fan_in), 1/sqrt(fan_in)) init, stacked
    over joints, honoring each joint's true fan-in (4 for roots, 10 else) and
    zeroing the padded parent-feature columns for roots."""
    ws, bs = [], []
    for j in range(num_joints):
        fan_in = fan_in_per_joint[j]
        bound = 1.0 / np.sqrt(fan_in)
        rng, k1, k2 = jax.random.split(rng, 3)
        w = jax.random.uniform(k1, (max(fan_in_per_joint), fan_out), minval=-bound, maxval=bound)
        if fan_in < max(fan_in_per_joint):
            w = w.at[fan_in:].set(0.0)
        b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
        ws.append(w)
        bs.append(b)
    return jnp.stack(ws), jnp.stack(bs)


class StructureEncoder(nn.Module):
    """Kinematic-tree pose encoder over (B, 21, 4) unit quaternions.

    Attributes:
      parents: 21-entry parent table (-1 = root). Defaults to the exact table
        the reference checkpoints bake in (``net_utils.py:46``).
      feature_size: per-joint output feature width (reference: 6).
      activation: lrelu | relu | softplus (reference config: lrelu).
      beta: softplus beta.
      use_fused: route the forward pass through the fused Pallas kernel.
    """

    parents: Tuple[int, ...] = kinematics.REFERENCE_PARENTS
    feature_size: int = 6
    activation: str = "lrelu"
    beta: float = 100.0
    use_fused: bool = False
    precision: str = "default"

    @property
    def num_joints(self) -> int:
        return len(self.parents)

    @property
    def out_dim(self) -> int:
        return self.num_joints * self.feature_size

    @nn.compact
    def __call__(self, quat: jax.Array) -> jax.Array:
        """(B, J, 4) -> (B, J * feature_size)."""
        J = self.num_joints
        F = self.feature_size
        bone_dim = 4
        hidden = bone_dim + F  # reference BoneMLP: n_features = bone_dim + feat

        fan_in = [bone_dim if p == -1 else hidden for p in self.parents]

        w1 = self.param(
            "w1",
            lambda rng: _stacked_linear_init(rng, J, fan_in, hidden)[0],
        )
        b1 = self.param(
            "b1",
            lambda rng: _stacked_linear_init(rng, J, fan_in, hidden)[1],
        )
        w2 = self.param(
            "w2",
            lambda rng: _stacked_linear_init(rng, J, [hidden] * J, F)[0],
        )
        b2 = self.param(
            "b2",
            lambda rng: _stacked_linear_init(rng, J, [hidden] * J, F)[1],
        )

        if self.use_fused:
            from posendf_tpu.ops.fused_encoder import fused_structure_encoder

            return fused_structure_encoder(
                quat, w1, b1, w2, b2,
                parents=self.parents,
                activation=self.activation,
                beta=self.beta,
            )
        return structure_encoder_apply(
            quat, w1, b1, w2, b2,
            parents=self.parents,
            activation=self.activation,
            beta=self.beta,
            precision=self.precision,
        )


def structure_encoder_apply(
    quat: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    *,
    parents: Tuple[int, ...],
    activation: str = "lrelu",
    beta: float = 100.0,
    precision: str = "default",
) -> jax.Array:
    """Pure-XLA level-scheduled forward. (B, J, 4) -> (B, J * F)."""
    act = make_activation(activation, beta)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    B = quat.shape[0]
    J = len(parents)
    F = w2.shape[-1]

    levels = kinematics.level_schedule(tuple(parents))
    features = jnp.zeros((B, J, F), dtype=quat.dtype)
    is_root = np.array([p == -1 for p in parents])

    for joint_ids, parent_ids in levels:
        js = np.array(joint_ids)
        ps = np.array(parent_ids)
        parent_feat = features[:, ps, :]  # (B, n, F); garbage for roots...
        mask = jnp.asarray(~is_root[js], dtype=quat.dtype)[None, :, None]
        parent_feat = parent_feat * mask  # ...zeroed here (roots see zeros)
        inp = jnp.concatenate([quat[:, js, :], parent_feat], axis=-1)  # (B,n,10)
        h = act(jnp.einsum("bnd,ndh->bnh", inp, w1[js], precision=prec) + b1[js])
        f = act(jnp.einsum("bnh,nhf->bnf", h, w2[js], precision=prec) + b2[js])
        features = features.at[:, js, :].set(f)

    return features.reshape(B, J * F)
