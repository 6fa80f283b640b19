"""Quaternion and rotation ops for PoseNDF-TPU.

Pure-jnp, closed-form, vmap/jit-friendly replacements for the rotation
conversions the reference consumes from pytorch3d.transforms (C++/CUDA):
``axis_angle_to_quaternion``, ``quaternion_to_axis_angle``,
``axis_angle_to_matrix``, ``matrix_to_quaternion`` — see reference usage at
``model/load_data.py:7``, ``data/create_data.py:17``,
``experiments/sample_poses.py:17``.

Conventions (identical to pytorch3d so labeled data / checkpoints interop):
  * quaternions are ``(w, x, y, z)`` — real part first,
  * half-angle formulas with a small-angle Taylor branch,
  * no implicit canonicalization; ``quat_flip`` (w >= 0) is separate, matching
    ``model/load_data.py:12-16``.

Everything here operates on the trailing axis and broadcasts over any leading
batch axes, so the same function serves (4,), (21, 4), (B, 21, 4), ...
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_matrix",
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "quat_flip",
    "quat_normalize",
    "quat_multiply",
    "quat_conjugate",
    "quat_geodesic_distance",
    "weighted_quat_geodesic_distance",
    "quat_slerp",
    "joint_axis_normalize",
    "matrix_to_rotation_6d",
    "rotation_6d_to_matrix",
    "SMPL_JOINT_RANK",
]

# Per-joint importance ranks used by the weighted geodesic metric
# (reference: data/dist_utils.py:16,39 — joint_rank, L2-normalized).
SMPL_JOINT_RANK = jnp.array(
    [7, 7, 7, 6, 6, 6, 5, 5, 5, 4, 4, 4, 4, 4, 3, 3, 3, 2, 2, 1, 1],
    dtype=jnp.float32,
)


def axis_angle_to_quaternion(aa: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> unit quaternion (..., 4), (w, x, y, z).

    Matches pytorch3d.transforms.axis_angle_to_quaternion: q = [cos(t/2),
    sin(t/2) * axis], with sin(t/2)/t evaluated by Taylor series near t = 0
    (pytorch3d uses the expansion 0.5 - t^2/48 for |t| < 1e-6).
    """
    aa = jnp.asarray(aa)
    # Gradient-safe small-angle handling (the "double-where" pattern): the
    # norm's gradient at 0 is NaN, and a plain where() still backpropagates
    # NaN through the untaken branch — so the sqrt argument itself is guarded
    # and the small branch is polynomial in |aa|^2 (smooth at 0). This keeps
    # optimizers that start at the zero pose (e.g. SMPLify stage 2) finite.
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    small = sq < 1e-12  # angle < 1e-6
    safe_sq = jnp.where(small, jnp.ones_like(sq), sq)
    angle = jnp.sqrt(safe_sq)
    half = 0.5 * angle
    sin_half_over_angle = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    xyz = aa * sin_half_over_angle
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) (w, x, y, z) -> axis-angle (..., 3).

    Matches pytorch3d.transforms.quaternion_to_axis_angle: angle =
    2 * atan2(|xyz|, w); returns axis * angle. Small-angle Taylor branch for
    the sin(t/2)/t factor as in pytorch3d.
    """
    q = jnp.asarray(q)
    w = q[..., :1]
    xyz = q[..., 1:]
    # gradient-safe at xyz == 0 (see axis_angle_to_quaternion): for tiny
    # |xyz| with w > 0, angle ~= 2|xyz|/w, so the Taylor branch uses
    # angle^2 ~= 4 sq / w^2 without differentiating a sqrt at 0.
    sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    small = (sq < 1e-12) & (w > 0)
    safe_sq = jnp.where(small, jnp.ones_like(sq), sq)
    norms = jnp.sqrt(safe_sq)
    half_angle = jnp.arctan2(norms, w)
    angle = 2.0 * half_angle
    angle_sq_small = 4.0 * sq / jnp.maximum(w * w, 1e-12)
    sin_half_over_angle = jnp.where(
        small,
        0.5 - angle_sq_small / 48.0,
        jnp.sin(half_angle) / jnp.where(small, jnp.ones_like(angle), angle),
    )
    return xyz / sin_half_over_angle


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) (w, x, y, z) -> rotation matrix (..., 3, 3).

    Same formula as pytorch3d.transforms.quaternion_to_matrix (which assumes
    unit quaternions up to the 2/|q|^2 normalization it applies).
    """
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (via quaternion,
    like pytorch3d.transforms.axis_angle_to_matrix)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), (w, x, y, z).

    Branch-free variant of the standard Shepperd method, matching
    pytorch3d.transforms.matrix_to_quaternion: compute all four candidate
    quaternions and pick the one keyed to the largest squared component.
    """
    m = jnp.asarray(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = jnp.stack(
        [
            _sqrt_positive_part(1.0 + m00 + m11 + m22),
            _sqrt_positive_part(1.0 + m00 - m11 - m22),
            _sqrt_positive_part(1.0 - m00 + m11 - m22),
            _sqrt_positive_part(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=m.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> 6D representation (..., 6): the first
    two ROWS flattened (Zhou et al. CVPR'19, pytorch3d convention — part of
    the conversion surface the reference consumes, ``model/load_data.py:7``)."""
    m = jnp.asarray(m)
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """6D representation (..., 6) -> rotation matrix (..., 3, 3) via
    Gram-Schmidt (pytorch3d.rotation_6d_to_matrix semantics)."""
    d6 = jnp.asarray(d6)
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.sqrt(jnp.maximum(jnp.sum(a1 * a1, -1, keepdims=True), 1e-24))
    a2 = a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1
    b2 = a2 / jnp.sqrt(jnp.maximum(jnp.sum(a2 * a2, -1, keepdims=True), 1e-24))
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def quat_flip(q: jax.Array) -> jax.Array:
    """Canonicalize to the w >= 0 hemisphere of the quaternion double cover.

    Reference: ``model/load_data.py:12-16`` / ``data/create_data.py:29-32``
    negate every quaternion whose real part is negative.
    """
    q = jnp.asarray(q)
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize each quaternion (trailing axis) to unit norm.

    Matches torch.nn.functional.normalize(q, dim=-1): divides by
    max(|q|, eps), so the zero quaternion maps to zero instead of NaN.
    Gradient-safe at q == 0 (sqrt is taken of the clamped square).
    """
    q = jnp.asarray(q)
    n = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), eps * eps))
    return q / n


def joint_axis_normalize(pose: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Replicate the reference's ``F.normalize(pose, dim=1)`` quirk.

    The reference normalizes a (B, 21, 4) pose across the *joint* axis
    (``model/posendf.py:71``), i.e. each (batch, component) column over the 21
    joints — NOT per-quaternion. Trained checkpoints bake this in, so the
    TPU model reproduces it bit-for-bit (callers pass unit quaternions, making
    this an ~1/sqrt(21) per-column rescale).
    """
    pose = jnp.asarray(pose)
    n = jnp.sqrt(jnp.maximum(jnp.sum(pose * pose, axis=1, keepdims=True), eps * eps))
    return pose / n


def quat_conjugate(q: jax.Array) -> jax.Array:
    q = jnp.asarray(q)
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, (w, x, y, z) convention, broadcasting over batches."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_geodesic_distance(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Per-pose geodesic surrogate: mean over joints of 1 - |<qa, qb>|.

    Double-cover-invariant metric used to label training data
    (reference: ``data/dist_utils.py:47``). Inputs (..., J, 4) -> (...,).
    """
    dots = jnp.sum(qa * qb, axis=-1)
    return jnp.mean(1.0 - jnp.abs(dots), axis=-1)


def weighted_quat_geodesic_distance(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Joint-rank-weighted variant (reference: ``data/dist_utils.py:45``):
    sum_j w_j * (1 - |<qa_j, qb_j>|) with w = normalize(joint_rank)."""
    w = SMPL_JOINT_RANK / jnp.linalg.norm(SMPL_JOINT_RANK)
    dots = jnp.sum(qa * qb, axis=-1)
    return jnp.sum(w * (1.0 - jnp.abs(dots)), axis=-1)


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions.

    Shortest-path (flips q1 when <q0, q1> < 0); falls back to lerp for nearly
    parallel quaternions. Used by the interpolation experiment (the reference
    advertises interpolation in README.md:74-76 but never implemented it —
    ``experiments/interpolation.py`` is a stub).

    Returns shape (T,) + broadcast(q0, q1).shape for T interpolation weights
    (scalar t is promoted to T = 1).
    """
    q0 = jnp.asarray(q0)
    q1 = jnp.asarray(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    # gradient-safe: arccos has infinite slope at 1; clamp before arccos and
    # route near-parallel pairs to the lerp branch
    parallel = dot > 1.0 - 1e-7
    safe_dot = jnp.clip(dot, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(safe_dot)
    safe_sin = jnp.sin(theta)

    t = jnp.atleast_1d(jnp.asarray(t, dtype=q0.dtype))
    t = t.reshape((-1,) + (1,) * q0.ndim)  # (T, 1, ..., 1)
    w0 = jnp.where(parallel, 1.0 - t, jnp.sin((1.0 - t) * theta) / safe_sin)
    w1 = jnp.where(parallel, t, jnp.sin(t * theta) / safe_sin)
    return quat_normalize(w0 * q0[None] + w1 * q1[None])
