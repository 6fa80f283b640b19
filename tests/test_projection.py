"""Projection-solver tests: descent property, renorm modes, tangent-space
variant, history contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posendf_tpu.models import PoseNDF
from posendf_tpu.projection import make_projector, project, random_poses


@pytest.fixture(scope="module")
def field():
    module = PoseNDF(dfnet_dims=(64, 64), activation="softplus")
    params = module.init(jax.random.key(1), jnp.zeros((1, 21, 4)))["params"]
    return module, params


def test_history_and_shapes(field):
    module, params = field
    poses = random_poses(jax.random.key(0), 16)
    out, hist = project(module, params, poses, steps=7)
    assert out.shape == (16, 21, 4)
    assert hist.shape == (7, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-5)


class _ToyField(__import__("flax").linen.Module):
    """Analytic field with strong gradients: d(q) = ||q - t||^2 to a fixed
    random target — lets projection-mode differences show up clearly."""

    @__import__("flax").linen.compact
    def __call__(self, pose, normalize_input=True):
        pose = pose.reshape(-1, 21, 4)
        t = self.param("t", jax.nn.initializers.normal(1.0), (21, 4))
        return jnp.mean((pose - t) ** 2, axis=(1, 2))[:, None]


def _toy():
    module = _ToyField()
    params = module.init(jax.random.key(9), jnp.zeros((1, 21, 4)))["params"]
    return module, params


def test_no_renorm_mode_leaves_sphere():
    module, params = _toy()
    poses = random_poses(jax.random.key(2), 8)
    out, _ = project(module, params, poses, steps=3, renormalize=False,
                     step_scale=0.01)
    norms = np.linalg.norm(np.asarray(out), axis=-1)
    # reference-exact mode does not retract to the sphere
    assert not np.allclose(norms, 1.0, atol=1e-4)


def test_tangent_mode_stays_closer_to_sphere():
    """Tangent-space steps (radial component removed) drift off the sphere
    strictly less than ambient steps before retraction."""
    module, params = _toy()
    poses = random_poses(jax.random.key(3), 8)
    # one small step: to first order the tangent step has no radial
    # component, so its norm drift is strictly second-order vs first-order
    out_amb, _ = project(module, params, poses, steps=1, renormalize=False,
                         step_scale=0.05)
    out_tan, _ = project(module, params, poses, steps=1, renormalize=False,
                         step_scale=0.05, tangent=True)
    drift_amb = np.abs(np.linalg.norm(np.asarray(out_amb), axis=-1) - 1).max()
    drift_tan = np.abs(np.linalg.norm(np.asarray(out_tan), axis=-1) - 1).max()
    assert drift_tan < drift_amb


def test_descent_on_toy_field():
    """On an analytic field the projection must strictly reduce d."""
    module, params = _toy()
    poses = random_poses(jax.random.key(5), 8)
    out, hist = project(module, params, poses, steps=20, step_scale=0.02)
    assert float(hist[-1].mean()) < float(hist[0].mean())


def test_make_projector_binding(field):
    module, params = field
    run = make_projector(module, params, steps=3)
    out, hist = run(random_poses(jax.random.key(4), 4))
    assert hist.shape == (3, 4)
