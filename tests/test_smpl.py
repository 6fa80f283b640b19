"""SMPL LBS/FK behavioral golden tests.

Rather than duplicating the LBS equations as an 'oracle', these tests pin
down the geometric invariants any correct implementation must satisfy —
rest-pose identity, rigid global rotation, single-joint articulation,
differentiability, shape-blendshape linearity — which catch indexing/FK/
skinning bugs without a circular reimplementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posendf_tpu.kinematics import SMPL_FULL_PARENTS
from posendf_tpu.smpl import BodyModel, lbs_forward, synthetic_model


@pytest.fixture(scope="module")
def model():
    return synthetic_model(num_vertices=96, seed=0)


def _zeros(B, model):
    return (jnp.zeros((B, 10)), jnp.zeros((B, 3)), jnp.zeros((B, 69)))


def test_rest_pose_identity(model):
    betas, orient, pose = _zeros(2, model)
    verts, joints = lbs_forward(model, betas, orient, pose)
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5)
    rest_joints = np.asarray(model.j_regressor @ model.v_template)
    np.testing.assert_allclose(np.asarray(joints[0]), rest_joints, atol=1e-5)


def test_global_rotation_is_rigid(model):
    betas, _, pose = _zeros(1, model)
    aa = jnp.array([[0.3, -0.4, 0.8]])
    verts, joints = lbs_forward(model, betas, aa, pose)
    verts0, joints0 = lbs_forward(model, betas, jnp.zeros((1, 3)), pose)

    from posendf_tpu.quat import axis_angle_to_matrix

    R = np.asarray(axis_angle_to_matrix(aa))[0]
    root = np.asarray(joints0[0, 0])
    expect = (np.asarray(verts0[0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(verts[0]), expect, atol=1e-4)
    expect_j = (np.asarray(joints0[0]) - root) @ R.T + root
    np.testing.assert_allclose(np.asarray(joints[0]), expect_j, atol=1e-4)


def test_single_joint_rotation_moves_only_subtree(model):
    """Rotating one joint must move exactly its kinematic subtree."""
    j = 4  # left knee
    subtree = {j}
    changed = True
    while changed:
        changed = False
        for c, p in enumerate(SMPL_FULL_PARENTS):
            if p in subtree and c not in subtree:
                subtree.add(c)
                changed = True

    betas, orient, pose = _zeros(1, model)
    pose = pose.at[0, (j - 1) * 3 + 0].set(0.9)  # body_pose joint j-1 maps to SMPL joint j
    _, joints = lbs_forward(model, betas, orient, pose)
    _, joints0 = lbs_forward(model, betas, orient, jnp.zeros((1, 69)))
    delta = np.linalg.norm(np.asarray(joints[0]) - np.asarray(joints0[0]), axis=-1)
    for k in range(24):
        # the rotated joint itself doesn't translate — only its descendants do
        if k in subtree and k != j:
            assert delta[k] > 1e-4, f"descendant joint {k} did not move"
        else:
            assert delta[k] < 1e-5, f"joint {k} outside subtree moved by {delta[k]}"


def test_bone_lengths_preserved_under_pose(model):
    rng = np.random.default_rng(1)
    betas = jnp.zeros((1, 10))
    orient = jnp.asarray(rng.normal(scale=0.5, size=(1, 3)).astype(np.float32))
    pose = jnp.asarray(rng.normal(scale=0.4, size=(1, 69)).astype(np.float32))
    _, joints = lbs_forward(model, betas, orient, pose)
    _, joints0 = lbs_forward(model, betas, jnp.zeros((1, 3)), jnp.zeros((1, 69)))
    j, j0 = np.asarray(joints[0]), np.asarray(joints0[0])
    for c in range(1, 24):
        p = SMPL_FULL_PARENTS[c]
        np.testing.assert_allclose(
            np.linalg.norm(j[c] - j[p]), np.linalg.norm(j0[c] - j0[p]), atol=1e-4
        )


def test_shape_blendshapes_linear(model):
    orient, pose = jnp.zeros((1, 3)), jnp.zeros((1, 69))
    b1 = jnp.ones((1, 10)) * 0.5
    v0, _ = lbs_forward(model, jnp.zeros((1, 10)), orient, pose)
    v1, _ = lbs_forward(model, b1, orient, pose)
    v2, _ = lbs_forward(model, 2 * b1, orient, pose)
    np.testing.assert_allclose(
        np.asarray(v2 - v1), np.asarray(v1 - v0), atol=1e-5
    )


def test_differentiable_through_pose(model):
    def loss(pose):
        v, _ = lbs_forward(model, jnp.zeros((1, 10)), jnp.zeros((1, 3)), pose)
        return jnp.sum(v ** 2)

    g = jax.grad(loss)(jnp.zeros((1, 69)) + 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_body_model_wrapper_api(model):
    bm = BodyModel(model=model)
    out = bm(pose_body=jnp.zeros((3, 63)))  # 63 -> zero-padded to 69
    assert out.vertices.shape == (3, 96, 3)
    assert out.Jtr.shape == (3, 24, 3)
    assert out.body_pose.shape == (3, 69)
    assert out.full_pose.shape == (3, 72)
    assert out.faces.shape[1] == 3
