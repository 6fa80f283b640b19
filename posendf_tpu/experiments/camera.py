"""Perspective camera for image-based fitting.

Capability parity with the SMPLify-X-derived ``PerspectiveCamera``
(``experiments/exp_utils.py:68-143``): fixed focal length 5000, learnable
rotation + translation, pinhole projection of 3D joints to pixels.
Functional formulation — the camera is a params pytree and ``project_points``
is a pure function, so camera parameters optimize inside the same jitted
Adam loops as the body pose.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["init_camera", "project_points"]

FOCAL_LENGTH = 5000.0


def init_camera(batch_size: int = 1, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {
        "rotation": jnp.tile(jnp.eye(3, dtype=dtype)[None], (batch_size, 1, 1)),
        "translation": jnp.zeros((batch_size, 3), dtype),
    }


def project_points(
    camera: Dict[str, jax.Array],
    points: jax.Array,              # (B, N, 3)
    focal_length: float = FOCAL_LENGTH,
    center: jax.Array | None = None,  # (B, 2) principal point
) -> jax.Array:
    """Pinhole projection: x_img = f * (R x + t)_{xy} / (R x + t)_z + c."""
    cam_pts = jnp.einsum("bij,bnj->bni", camera["rotation"], points) \
        + camera["translation"][:, None, :]
    z = cam_pts[..., 2:3]
    xy = cam_pts[..., :2] / jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    img = focal_length * xy
    if center is not None:
        img = img + center[:, None, :]
    return img
