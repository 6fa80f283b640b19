"""Golden-checkpoint regression anchor (round-3 brief item 8).

``examples/golden/`` ships a small PoseNDF trained on the deterministic
synthetic manifold (``scripts/make_golden_checkpoint.py``) plus the exact
distances it produced at build time. These tests pin the WHOLE inference
path — msgpack restore, config load, module apply — to those recorded
numbers, so any refactor that silently changes numerics (not just shapes)
fails here; fresh-init parity tests can't catch that class of bug.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import posendf_tpu

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "golden")


@pytest.fixture(scope="module")
def golden_field():
    if not os.path.exists(os.path.join(GOLDEN, "golden.msgpack")):
        pytest.skip("golden artifacts not built")
    return posendf_tpu.load_field(
        os.path.join(GOLDEN, "golden.msgpack"),
        config=os.path.join(GOLDEN, "golden.yaml"))


@pytest.fixture(scope="module")
def expected():
    return np.load(os.path.join(GOLDEN, "expected.npz"))


def test_golden_distances_reproduce(golden_field, expected):
    """Field distances on the recorded probes match the values recorded at
    checkpoint-build time. Tolerance covers backend drift (CPU vs TPU at
    default precision measured ~2e-5 elsewhere in the suite), NOT model
    drift — a real numerics change moves these by orders more."""
    d = np.asarray(golden_field.distance(jnp.asarray(expected["probes"])))
    np.testing.assert_allclose(d, expected["dist"], atol=2e-4, rtol=2e-4)


def test_golden_field_separates_manifold(golden_field, expected):
    """The committed checkpoint is genuinely TRAINED: on-manifold probes
    (first 64, drawn from the training family) score much lower than
    uniform-random quaternion poses (last 64)."""
    d = np.abs(np.asarray(golden_field.distance(
        jnp.asarray(expected["probes"]))))
    on, off = d[:64].mean(), d[64:].mean()
    assert on < off / 2.5, (on, off)


def test_golden_projection_descends(golden_field, expected):
    """projection onto the golden field reduces distances — the property
    the reference prints per step (experiments/sample_poses.py:72)."""
    from posendf_tpu.projection import project

    probes = jnp.asarray(expected["probes"][64:80])
    _, hist = project(golden_field.module, golden_field.params,
                      probes, steps=20)
    assert float(hist[-1].mean()) < 0.5 * float(hist[0].mean())
