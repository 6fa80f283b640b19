"""BodyModel: the user-facing SMPL wrapper the experiments consume.

API parity with the reference wrapper (``experiments/body_model.py:11-53``):
``BodyModel(bm_path, model_type, batch_size, num_betas)`` with
``forward(root_orient, pose_body, betas)`` returning an object with
``vertices``, ``faces``, ``Jtr``, ``betas``, ``body_pose``, ``full_pose``.
Functional under the hood — the forward is a jitted pure function; the
wrapper only holds the (static) model tensors.

``pose_body`` accepts the reference's (B, 69) layout (23 body joints; the
last two are the hands, zero-padded by every caller) or (B, 23, 3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu.smpl.lbs import (
    SMPL_VERTEX_LANDMARKS,
    SMPLModel,
    lbs_forward,
    load_smpl_model,
    synthetic_model,
    with_landmarks,
)

__all__ = ["BodyModel", "BodyModelOutput", "SMPL_VERTEX_LANDMARKS"]


@dataclasses.dataclass
class BodyModelOutput:
    vertices: jax.Array    # (B, V, 3)
    faces: np.ndarray      # (F, 3)
    Jtr: jax.Array         # (B, 45, 3) for real SMPL meshes (24 skeleton
                           # joints + 21 vertex landmarks, smplx order);
                           # (B, 24, 3) for synthetic/small test meshes
    betas: jax.Array
    body_pose: jax.Array   # (B, 69)
    full_pose: jax.Array   # (B, 72)


class BodyModel:
    def __init__(
        self,
        bm_path: Optional[str] = None,
        model_type: str = "smpl",
        num_betas: int = 10,
        model: Optional[SMPLModel] = None,
    ):
        if model_type != "smpl":
            raise NotImplementedError(f"model_type={model_type!r}; only 'smpl' is supported")
        if model is not None:
            self.model = model
        elif bm_path is not None:
            self.model = load_smpl_model(bm_path, num_betas=num_betas)
        else:
            self.model = synthetic_model(num_betas=num_betas)
        self.num_betas = num_betas

    def __call__(
        self,
        root_orient: Optional[jax.Array] = None,
        pose_body: Optional[jax.Array] = None,
        betas: Optional[jax.Array] = None,
    ) -> BodyModelOutput:
        if pose_body is None:
            raise ValueError("pose_body is required")
        pose_body = jnp.asarray(pose_body)
        B = pose_body.shape[0]
        pose_body = pose_body.reshape(B, -1)
        if pose_body.shape[1] == 63:  # 21 joints -> pad hands with zeros
            pose_body = jnp.concatenate([pose_body, jnp.zeros((B, 6), pose_body.dtype)], axis=1)
        if pose_body.shape[1] != 69:
            raise ValueError(f"pose_body must be (B, 63|69), got {pose_body.shape}")
        if root_orient is None:
            root_orient = jnp.zeros((B, 3), pose_body.dtype)
        if betas is None:
            betas = jnp.zeros((B, self.num_betas), pose_body.dtype)
        vertices, joints = lbs_forward(self.model, betas, root_orient, pose_body)
        joints = with_landmarks(vertices, joints)
        full_pose = jnp.concatenate([root_orient.reshape(B, 3), pose_body], axis=1)
        return BodyModelOutput(
            vertices=vertices,
            faces=self.model.faces,
            Jtr=joints,
            betas=betas,
            body_pose=pose_body,
            full_pose=full_pose,
        )
