"""Unit tests for quaternion/rotation ops: closed-form values, round trips,
and pytorch3d convention checks ((w,x,y,z) order, half-angle formulas)."""

import numpy as np
import jax.numpy as jnp
import pytest

from posendf_tpu import quat


def test_axis_angle_to_quaternion_known_values():
    # 90 deg about z
    aa = jnp.array([0.0, 0.0, np.pi / 2])
    q = quat.axis_angle_to_quaternion(aa)
    expected = np.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(np.asarray(q), expected, atol=1e-6)

    # zero rotation -> identity quaternion
    q0 = quat.axis_angle_to_quaternion(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(q0), [1.0, 0, 0, 0], atol=1e-7)


def test_quaternion_axis_angle_roundtrip(rng):
    aa = rng.normal(size=(64, 21, 3)).astype(np.float32) * 0.8
    q = quat.axis_angle_to_quaternion(aa)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-5
    )
    back = quat.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(back), aa, atol=1e-4)


def test_small_angle_branch():
    aa = jnp.array([1e-8, -1e-8, 1e-8])
    q = quat.axis_angle_to_quaternion(aa)
    assert np.isfinite(np.asarray(q)).all()
    back = quat.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(aa), atol=1e-9)


def test_matrix_roundtrip(rng):
    aa = rng.normal(size=(128, 3)).astype(np.float32)
    q = quat.axis_angle_to_quaternion(aa)
    m = quat.quaternion_to_matrix(q)
    m_np = np.asarray(m)
    # proper rotations
    eye = np.einsum("bij,bkj->bik", m_np, m_np)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (128, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m_np), 1.0, atol=1e-5)
    # back to quaternion, same rotation up to sign
    q2 = np.asarray(quat.matrix_to_quaternion(m))
    dots = np.abs(np.sum(q2 * np.asarray(q), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_matrix_matches_rodrigues(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float64)
    m = np.asarray(quat.axis_angle_to_matrix(jnp.asarray(aa)))
    # Rodrigues oracle
    theta = np.linalg.norm(aa, axis=-1, keepdims=True)
    k = aa / theta
    K = np.zeros((32, 3, 3))
    K[:, 0, 1], K[:, 0, 2] = -k[:, 2], k[:, 1]
    K[:, 1, 0], K[:, 1, 2] = k[:, 2], -k[:, 0]
    K[:, 2, 0], K[:, 2, 1] = -k[:, 1], k[:, 0]
    s = np.sin(theta)[..., None]
    c = np.cos(theta)[..., None]
    R = np.eye(3) + s * K + (1 - c) * (K @ K)
    np.testing.assert_allclose(m, R, atol=1e-5)


def test_quat_flip():
    q = jnp.array([[[0.5, 0.5, 0.5, 0.5], [-0.5, 0.5, 0.5, 0.5]]])
    out = np.asarray(quat.quat_flip(q))
    assert (out[..., 0] >= 0).all()
    np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 0.5, 0.5])
    np.testing.assert_allclose(out[0, 1], [0.5, -0.5, -0.5, -0.5])


def test_joint_axis_normalize_matches_torch_f_normalize(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(8, 21, 4)).astype(np.float32)
    ours = np.asarray(quat.joint_axis_normalize(jnp.asarray(x)))
    theirs = torch.nn.functional.normalize(torch.from_numpy(x), dim=1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_geodesic_distance():
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (21, 1))
    assert float(quat.quat_geodesic_distance(q, q)) == pytest.approx(0.0)
    # double cover: q and -q are the same rotation -> distance 0
    assert float(quat.quat_geodesic_distance(q, -q)) == pytest.approx(0.0)
    # orthogonal quaternions -> 1 - 0 = 1 per joint
    q2 = jnp.tile(jnp.array([0.0, 1.0, 0, 0]), (21, 1))
    assert float(quat.quat_geodesic_distance(q, q2)) == pytest.approx(1.0)


def test_weighted_geodesic_matches_reference_formula(rng):
    qa = rng.normal(size=(5, 21, 4)).astype(np.float32)
    qb = rng.normal(size=(5, 21, 4)).astype(np.float32)
    qa /= np.linalg.norm(qa, axis=-1, keepdims=True)
    qb /= np.linalg.norm(qb, axis=-1, keepdims=True)
    ours = np.asarray(quat.weighted_quat_geodesic_distance(jnp.asarray(qa), jnp.asarray(qb)))
    rank = np.array([7, 7, 7, 6, 6, 6, 5, 5, 5, 4, 4, 4, 4, 4, 3, 3, 3, 2, 2, 1, 1], np.float32)
    w = rank / np.linalg.norm(rank)
    oracle = np.sum(w * (1 - np.abs(np.sum(qa * qb, axis=-1))), axis=-1)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_slerp_endpoints_and_midpoint():
    q0 = jnp.array([1.0, 0, 0, 0])
    q1 = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])  # 90 deg z
    np.testing.assert_allclose(np.asarray(quat.quat_slerp(q0, q1, 0.0))[0], np.asarray(q0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(quat.quat_slerp(q0, q1, 1.0))[0], np.asarray(q1), atol=1e-6)
    mid = np.asarray(quat.quat_slerp(q0, q1, 0.5))[0]
    expected = np.array([np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)])
    np.testing.assert_allclose(mid, expected, atol=1e-6)


def test_rotation_6d_roundtrip(rng):
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    m = quat.axis_angle_to_matrix(jnp.asarray(aa))
    d6 = quat.matrix_to_rotation_6d(m)
    assert d6.shape == (32, 6)
    back = quat.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(m), atol=1e-5)
