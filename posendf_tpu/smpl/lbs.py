"""JAX SMPL: linear blend skinning + forward kinematics, TPU-first.

Capability parity with the smplx.SMPL dependency the reference wraps
(``experiments/body_model.py:11-53``; consumed by every experiment and by the
data labeler ``data/prepare_traindata.py:119-147``): shape blendshapes, pose
blendshapes, joint regression, FK over the 24-joint kinematic tree, and
skinning to the template mesh — plus the joints output the experiments
optimize against.

TPU-native design: everything is dense einsums (MXU food); FK is a
level-grouped walk over the static tree (9 sequential levels instead of 24),
batched over frames; no 4x4 homogeneous matmuls — rotations and translations
are composed as (3,3) and (3,) pairs, which XLA fuses tighter. Differentiable
end-to-end (the fitting experiments take gradients through vertices and
joints w.r.t. pose/betas/orient).

Model data: SMPL model files are licensed and cannot ship; ``load_smpl_model``
reads the user's own ``.pkl`` or ``.npz`` (same as the reference, which points
at local model paths). ``synthetic_model`` fabricates a tiny anatomically
structured stand-in for tests.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu.kinematics import SMPL_FULL_PARENTS, level_schedule
from posendf_tpu.quat import axis_angle_to_matrix

__all__ = ["SMPL_VERTEX_LANDMARKS", "with_landmarks", "SMPLModel", "load_smpl_model", "synthetic_model", "lbs_forward"]

NUM_JOINTS = 24


class _StaticArray:
    """Hashable wrapper for host-side arrays living in pytree aux data.

    jit cache keys compare aux data with ``==`` / ``hash``; a bare ndarray
    there makes two structurally-identical models raise "truth value of an
    array is ambiguous" on the second trace.
    """

    __slots__ = ("arr", "_key")

    def __init__(self, arr: np.ndarray):
        self.arr = np.asarray(arr)
        self._key = (self.arr.shape, self.arr.dtype.str, self.arr.tobytes())

    def __eq__(self, other):
        return isinstance(other, _StaticArray) and self._key == other._key

    def __hash__(self):
        return hash(self._key)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SMPLModel:
    """SMPL model tensors (a pytree, so it can cross jit boundaries)."""

    v_template: jax.Array     # (V, 3)
    shapedirs: jax.Array      # (V, 3, n_betas)
    posedirs: jax.Array       # (207, V*3)  — pose-feature-major for one einsum
    j_regressor: jax.Array    # (24, V)
    lbs_weights: jax.Array    # (V, 24)
    faces: np.ndarray         # (F, 3) int — host-side only (static aux data)
    parents: Tuple[int, ...] = SMPL_FULL_PARENTS

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    def tree_flatten(self):
        children = (self.v_template, self.shapedirs, self.posedirs,
                    self.j_regressor, self.lbs_weights)
        # cache the hashable wrapper: flatten runs on every jit dispatch and
        # rebuilding it would re-copy + re-hash the faces buffer each time
        wrapped = self.__dict__.get("_faces_wrapped")
        if wrapped is None or wrapped.arr is not self.faces:
            wrapped = _StaticArray(self.faces)
            self.__dict__["_faces_wrapped"] = wrapped
        aux = (wrapped, self.parents)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        faces, parents = aux
        return cls(*children, faces=faces.arr, parents=parents)


def load_smpl_model(path: str, num_betas: int = 10, dtype=jnp.float32) -> SMPLModel:
    """Load a user-provided SMPL model file (.pkl chumpy-style or .npz)."""
    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        import pickle

        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")

    def arr(x):
        # chumpy arrays expose .r; scipy sparse expose .todense
        if hasattr(x, "r"):
            x = x.r
        if hasattr(x, "todense"):
            x = np.asarray(x.todense())
        return np.asarray(x, dtype=np.float64)

    v_template = arr(data["v_template"])
    shapedirs = arr(data["shapedirs"])[..., :num_betas]
    posedirs = arr(data["posedirs"])  # (V, 3, 207)
    V = v_template.shape[0]
    posedirs = posedirs.reshape(V * 3, -1).T  # (207, V*3)
    j_regressor = arr(data["J_regressor"])
    lbs_weights = arr(data["weights"])
    faces = np.asarray(data.get("f", data.get("faces")), dtype=np.int32)
    parents = data.get("kintree_table")
    if parents is not None:
        kt = np.asarray(parents)
        p = kt[0].astype(np.int64)
        p[0] = -1
        parents = tuple(int(x) for x in p)
    else:
        parents = SMPL_FULL_PARENTS
    return SMPLModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        faces=faces,
        parents=parents,
    )


def synthetic_model(num_vertices: int = 128, num_betas: int = 10, seed: int = 0) -> SMPLModel:
    """Small structured stand-in for tests: joints on a plausible skeleton,
    vertices clustered around joints with soft weights."""
    rng = np.random.default_rng(seed)
    # skeleton rest positions: random bone offsets chained down the tree
    j_rest = np.zeros((NUM_JOINTS, 3))
    j_rest[0] = rng.normal(scale=0.05, size=3)
    for j in range(1, NUM_JOINTS):
        j_rest[j] = j_rest[SMPL_FULL_PARENTS[j]] + rng.normal(scale=0.15, size=3)

    owner = rng.integers(0, NUM_JOINTS, num_vertices)
    v_template = j_rest[owner] + rng.normal(scale=0.08, size=(num_vertices, 3))

    # soft skinning weights: inverse-distance to the 2 nearest joints
    d = np.linalg.norm(v_template[:, None] - j_rest[None], axis=-1)  # (V, 24)
    w = np.exp(-(d / 0.1) ** 2) + 1e-6
    lbs_weights = w / w.sum(axis=1, keepdims=True)

    # exact joint regressor: least-squares-free construction — place one
    # "marker" vertex at each joint so regression is exact
    j_regressor = np.zeros((NUM_JOINTS, num_vertices))
    marker = rng.choice(num_vertices, NUM_JOINTS, replace=False)
    v_template[marker] = j_rest
    j_regressor[np.arange(NUM_JOINTS), marker] = 1.0
    lbs_weights[marker] = np.eye(NUM_JOINTS)[np.arange(NUM_JOINTS)]

    shapedirs = rng.normal(scale=0.01, size=(num_vertices, 3, num_betas))
    shapedirs[marker] = 0.0  # keep regressor exact under shape change
    posedirs = rng.normal(scale=0.001, size=(num_vertices * 3, 207)).T

    faces = rng.integers(0, num_vertices, (64, 3)).astype(np.int32)
    return SMPLModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(j_regressor, jnp.float32),
        lbs_weights=jnp.asarray(lbs_weights, jnp.float32),
        faces=faces,
        parents=SMPL_FULL_PARENTS,
    )


# smplx's VertexJointSelector appends 21 vertex-picked landmarks after the
# 24 skeleton joints (smplx/vertex_joint_selector.py, vertex_ids['smplh'];
# order: 5 face, 6 feet, 10 finger tips). The reference experiments consume
# the FULL 45-joint Jtr (denoise data term motion_denoise.py:93; the kNN
# joint index reads Jtr[:, :25], prepare_traindata.py:147). Ids are for the
# standard 6890-vertex SMPL mesh.
SMPL_VERTEX_LANDMARKS = np.array([
    332, 6260, 2800, 4071, 583,                    # nose reye leye rear lear
    3216, 3226, 3387, 6617, 6624, 6787,            # L/R BigToe SmallToe Heel
    2746, 2319, 2445, 2556, 2673,                  # left  thumb..pinky tips
    6191, 5782, 5905, 6016, 6133,                  # right thumb..pinky tips
])


def with_landmarks(vertices: jax.Array, joints: jax.Array) -> jax.Array:
    """(B, V, 3), (B, 24, 3) -> (B, 45, 3) smplx-ordered joints when the
    mesh is a real SMPL body (landmark vertex ids in range); the skeleton
    joints unchanged for synthetic/small test meshes. Shape-static under
    jit (the branch is on the static vertex count)."""
    if vertices.shape[1] > int(SMPL_VERTEX_LANDMARKS.max()):
        return jnp.concatenate(
            [joints, vertices[:, SMPL_VERTEX_LANDMARKS, :]], axis=1)
    return joints


@partial(jax.jit, static_argnames=())
def lbs_forward(
    model: SMPLModel,
    betas: jax.Array,        # (B, n_betas)
    global_orient: jax.Array,  # (B, 3) axis-angle
    body_pose: jax.Array,      # (B, 69) axis-angle (23 joints)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (vertices (B, V, 3), joints (B, 24, 3)).

    Joints are the 24 FK-transformed SKELETON joints (smplx appends 21
    vertex-picked landmarks after these — ``BodyModel`` adds them for real
    SMPL meshes; this core returns the skeleton).

    ``betas`` may be per-frame (B, n_betas) or per-subject — (1, n_betas) or
    (n_betas,) — which broadcasts over the pose batch like the reference's
    smplx wrapper.
    """
    B = body_pose.reshape(body_pose.shape[0], -1).shape[0]
    if betas.ndim == 1:
        betas = betas[None]
    if betas.shape[0] == 1 and B > 1:
        betas = jnp.broadcast_to(betas, (B,) + betas.shape[1:])
    if betas.shape[0] != B:
        raise ValueError(
            f"betas batch {betas.shape[0]} does not match pose batch {B} "
            "(pass per-frame betas, or (1, n_betas)/(n_betas,) to broadcast)")
    full_pose = jnp.concatenate([global_orient.reshape(B, 1, 3),
                                 body_pose.reshape(B, 23, 3)], axis=1)  # (B,24,3)
    rot = axis_angle_to_matrix(full_pose)  # (B, 24, 3, 3)

    # shape blendshapes + joint regression
    v_shaped = model.v_template[None] + jnp.einsum(
        "vdk,bk->bvd", model.shapedirs, betas)
    joints_rest = jnp.einsum("jv,bvd->bjd", model.j_regressor, v_shaped)

    # pose blendshapes: (R_j - I) for j >= 1, flattened to 207
    eye = jnp.eye(3, dtype=rot.dtype)
    pose_feature = (rot[:, 1:] - eye).reshape(B, 207)
    v_posed = v_shaped + jnp.einsum("pn,bp->bn", model.posedirs,
                                    pose_feature).reshape(B, -1, 3)

    # FK over the static tree, level by level
    J = len(model.parents)
    Rg = jnp.zeros((B, J, 3, 3), dtype=rot.dtype)
    tg = jnp.zeros((B, J, 3), dtype=rot.dtype)
    # dependency-level grouping shared with the structure encoder
    # (kinematics.level_schedule: validated parent<child order, lru-cached)
    levels = [(np.asarray(js), np.asarray(ps))
              for js, ps in level_schedule(model.parents)]
    (roots, _) = levels[0]
    Rg = Rg.at[:, roots].set(rot[:, roots])
    tg = tg.at[:, roots].set(joints_rest[:, roots])
    for js, ps in levels[1:]:
        Rp = Rg[:, ps]                      # (B, n, 3, 3)
        tp = tg[:, ps]                      # (B, n, 3)
        offset = joints_rest[:, js] - joints_rest[:, ps]
        # 3x3 composes as broadcast-mul+sum, NOT einsum: under an extra
        # vmap batch dim (optimize_many's clip axis) XLA 0.9's optimizer
        # mis-reorders the batch dims of the resulting multi-batch small
        # dot and fails its own hlo verifier; elementwise ops lower
        # identically on the VPU (3x3 never hits the MXU either way)
        Rg = Rg.at[:, js].set(
            jnp.sum(Rp[..., :, :, None] * rot[:, js][..., None, :, :],
                    axis=-2))
        tg = tg.at[:, js].set(tp + jnp.sum(Rp * offset[..., None, :],
                                           axis=-1))

    # skinning: x -> Rg_j (x - j_rest) + tg_j, blended by weights
    # t_skin_j = tg_j - Rg_j @ j_rest_j
    t_skin = tg - jnp.sum(Rg * joints_rest[..., None, :], axis=-1)
    R_blend = jnp.einsum("vj,bjik->bvik", model.lbs_weights, Rg)
    t_blend = jnp.einsum("vj,bji->bvi", model.lbs_weights, t_skin)
    vertices = (jnp.sum(R_blend * v_posed[..., None, :], axis=-1)
                + t_blend)
    return vertices, tg
