"""Property-based tests (hypothesis) for the rotation-math core.

The example-based goldens in test_quat.py pin pytorch3d-convention parity;
these pin the ALGEBRAIC invariants over randomized inputs — the properties
every downstream consumer (labeling metrics, projection, SMPL FK) relies on.
Array generation is small (batches <= 8) so each case is a fast CPU eval;
deadlines are disabled because the first example pays the jit compile.
"""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from posendf_tpu import quat

# POSENDF_HYPOTHESIS_EXAMPLES=400 for a deep one-off fuzz sweep
import os

settings.register_profile(
    "ci", deadline=None,
    max_examples=int(os.environ.get("POSENDF_HYPOTHESIS_EXAMPLES", "25")))
settings.load_profile("ci")


def _aa_strategy(max_angle=np.pi - 1e-2):
    """Axis-angle vectors with |angle| < pi (the aa<->quat bijective range)."""

    def build(seed):
        rng = np.random.default_rng(seed)
        v = rng.normal(size=(4, 3))
        norms = np.linalg.norm(v, axis=-1, keepdims=True) + 1e-9
        angle = rng.uniform(1e-4, max_angle, size=(4, 1))
        return (v / norms * angle).astype(np.float32)

    return st.integers(0, 2**32 - 1).map(build)


def _quat_strategy():
    def build(seed):
        rng = np.random.default_rng(seed)
        q = rng.normal(size=(4, 4)).astype(np.float32)
        return q / np.linalg.norm(q, axis=-1, keepdims=True)

    return st.integers(0, 2**32 - 1).map(build)


@given(_aa_strategy())
def test_aa_quat_roundtrip(aa):
    q = quat.axis_angle_to_quaternion(jnp.asarray(aa))
    back = np.asarray(quat.quaternion_to_axis_angle(q))
    np.testing.assert_allclose(back, aa, atol=2e-5)


@given(_quat_strategy())
def test_quat_matrix_roundtrip_up_to_sign(q):
    m = quat.quaternion_to_matrix(jnp.asarray(q))
    back = np.asarray(quat.matrix_to_quaternion(m))
    # q and -q encode the same rotation; matrix_to_quaternion picks one sign
    flip = np.sign(np.sum(back * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(back * flip, q, atol=1e-5)


@given(_quat_strategy())
def test_rotation_matrix_is_orthonormal(q):
    m = np.asarray(quat.quaternion_to_matrix(jnp.asarray(q)))
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), m.shape)
    np.testing.assert_allclose(m @ np.swapaxes(m, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


@given(_quat_strategy())
def test_rotation_6d_roundtrip(q):
    m = quat.quaternion_to_matrix(jnp.asarray(q))
    d6 = quat.matrix_to_rotation_6d(m)
    back = np.asarray(quat.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(back, np.asarray(m), atol=1e-5)


@given(_quat_strategy(), _quat_strategy())
def test_multiply_preserves_unit_norm_and_composes(qa, qb):
    prod = quat.quat_multiply(jnp.asarray(qa), jnp.asarray(qb))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(prod), axis=-1), 1.0, atol=1e-5)
    # rotation of the product == product of the rotations
    mprod = np.asarray(quat.quaternion_to_matrix(prod))
    ma = np.asarray(quat.quaternion_to_matrix(jnp.asarray(qa)))
    mb = np.asarray(quat.quaternion_to_matrix(jnp.asarray(qb)))
    np.testing.assert_allclose(mprod, ma @ mb, atol=1e-5)


@given(_quat_strategy(), _quat_strategy())
def test_geodesic_distance_properties(qa, qb):
    """Double-cover invariance, symmetry, identity, range [0, 1]."""
    d = np.asarray(quat.quat_geodesic_distance(jnp.asarray(qa), jnp.asarray(qb)))
    d_flip = np.asarray(quat.quat_geodesic_distance(jnp.asarray(-qa), jnp.asarray(qb)))
    d_sym = np.asarray(quat.quat_geodesic_distance(jnp.asarray(qb), jnp.asarray(qa)))
    np.testing.assert_allclose(d, d_flip, atol=1e-6)
    np.testing.assert_allclose(d, d_sym, atol=1e-6)
    assert (d >= -1e-6).all() and (d <= 1.0 + 1e-6).all()
    d_self = np.asarray(quat.quat_geodesic_distance(jnp.asarray(qa), jnp.asarray(qa)))
    np.testing.assert_allclose(d_self, 0.0, atol=1e-6)


@given(_quat_strategy())
def test_slerp_endpoints_and_unit_norm(q):
    q0 = jnp.asarray(q)
    q1 = jnp.asarray(np.roll(q, 1, axis=0))
    for t, target in ((0.0, q0), (1.0, q1)):
        # scalar t is promoted to a leading T=1 axis (see quat_slerp docs)
        out = np.asarray(quat.quat_slerp(q0, q1, jnp.float32(t)))[0]
        # slerp may return the sign-canonicalized equivalent
        flip = np.sign(np.sum(out * np.asarray(target), axis=-1, keepdims=True))
        np.testing.assert_allclose(out * flip, np.asarray(target), atol=1e-5)
    mid = np.asarray(quat.quat_slerp(q0, q1, jnp.float32(0.37)))[0]
    np.testing.assert_allclose(np.linalg.norm(mid, axis=-1), 1.0, atol=1e-5)


@given(_quat_strategy())
def test_quat_flip_canonicalizes_without_changing_rotation(q):
    f = np.asarray(quat.quat_flip(jnp.asarray(q)))
    assert (f[..., 0] >= -1e-7).all()  # w >= 0 (load_data.py:12-16 semantics)
    mf = np.asarray(quat.quaternion_to_matrix(jnp.asarray(f)))
    m = np.asarray(quat.quaternion_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(mf, m, atol=1e-5)
