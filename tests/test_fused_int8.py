"""Int8-MXU serving path (``ops/fused_int8.py``).

Three layers of guarantee, mirroring the other fused-kernel suites:
  1. the Pallas kernel (interpret mode on CPU) agrees with the pure-XLA
     emulation ``reference_int8_forward`` — same arithmetic, so tight;
  2. the quantized field agrees with the f32 field to within the error a
     symmetric per-channel int8 scheme can promise (measured, loose bound);
  3. the golden trained checkpoint survives quantization (the realistic
     weight/activation distributions, not just fresh-init ones).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import posendf_tpu
from posendf_tpu.config import PoseNDFConfig
from posendf_tpu.field import Field
from posendf_tpu.ops.fused_int8 import (
    fused_posendf_forward_int8,
    int8_window,
    quantize_posendf,
    reference_int8_forward,
)

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "golden")


def _poses(rng, n):
    q = rng.normal(size=(n, 21, 4)).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


@pytest.fixture(scope="module")
def model():
    # live_head: the reference init's fresh lrelu head is the absorbing
    # dead-zero field (d == 0 for every pose, CLAUDE.md) — useless for
    # measuring quantization error. live_head gives a live fresh field.
    cfg = PoseNDFConfig()
    module = cfg.make_model().clone(live_head=True)
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    return module, params


@pytest.fixture(scope="module")
def qparams(model):
    module, params = model
    calib = _poses(np.random.default_rng(7), 512)
    return quantize_posendf(
        params["enc"], params["dfnet"], calib,
        parents=module.parents, activation=module.activation,
        beta=module.beta)


def test_int8_window_record_architecture():
    # dims of record: 126-256-512-1024-512-256-64-1 -> layers 1..4 qualify
    dims_in = [126, 256, 512, 1024, 512, 256, 64]
    dims_out = [256, 512, 1024, 512, 256, 64, 1]
    assert int8_window(dims_in, dims_out) == (1, 5)


def test_int8_window_small_and_empty():
    assert int8_window([126, 128, 256, 128, 64],
                       [128, 256, 128, 64, 1]) == (1, 3)
    # nothing 128-aligned -> empty window
    assert int8_window([126, 60], [60, 1]) == (0, 0)


def test_quantize_marks_expected_layers(model, qparams):
    module, params = model
    start, stop = qparams["window"]
    assert (start, stop) == (1, 5)
    for l, lyr in enumerate(qparams["layers"]):
        if start <= l < stop:
            w = params["dfnet"][f"w{l}"]
            assert lyr["wq"].dtype == jnp.int8
            assert lyr["dq"].shape == (1, w.shape[1])
            assert lyr["inv_sa"].shape == (1, w.shape[0])
        else:
            assert "w" in lyr and lyr["w"].dtype == jnp.float32


def test_kernel_matches_xla_emulation(model, qparams):
    """Interpret-mode kernel == pure-XLA emulation (same arithmetic).
    B=300 is a non-multiple of the tile, exercising the padding path."""
    module, _ = model
    q = _poses(np.random.default_rng(1), 300)
    ref = reference_int8_forward(q, qparams, parents=module.parents,
                                 activation=module.activation,
                                 beta=module.beta)
    with pltpu.force_tpu_interpret_mode():
        out = fused_posendf_forward_int8(
            q, qparams, parents=module.parents,
            activation=module.activation, beta=module.beta, tile_b=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_quantized_matches_f32_field(model, qparams):
    """End-to-end quantization error on fresh-init weights. A fresh
    live-head field is near-constant (std ~7e-5 over unit quats), so a
    std-relative bound would be noise-dominated — pin the ABSOLUTE error
    instead (measured 1.8e-5; the trained-checkpoint test below pins the
    relative claim on realistic weights)."""
    module, params = model
    field = Field(module, params)
    q = _poses(np.random.default_rng(2), 1024)
    d32 = np.asarray(field.distance(q)).ravel()
    d8 = np.asarray(reference_int8_forward(
        q, qparams, parents=module.parents, activation=module.activation,
        beta=module.beta)).ravel()
    mae = float(np.mean(np.abs(d8 - d32)))
    assert mae < 1e-4, mae


def test_field_quantize_int8_api(model):
    module, params = model
    qfield = Field(module, params).quantize_int8(
        _poses(np.random.default_rng(3), 256))
    q = _poses(np.random.default_rng(4), 64)
    d_xla = np.asarray(qfield.distance_xla(q))
    with pltpu.force_tpu_interpret_mode():
        d_krn = np.asarray(qfield.distance(q))
    assert d_xla.shape == (64, 1)
    np.testing.assert_allclose(d_krn, d_xla, atol=1e-5)


def test_quantized_field_save_load_roundtrip(model, tmp_path):
    """QuantizedField persistence (the serving-surface gap of round 4):
    save -> load reproduces the int8 forward EXACTLY (same int8 weights,
    same scales), needs no module/config at load time, and keeps the
    calibration report + window."""
    from posendf_tpu.field import Field, QuantizedField

    module, params = model
    qfield = Field(module, params).quantize_int8(
        _poses(np.random.default_rng(5), 256))
    path = str(tmp_path / "field.int8.msgpack")
    qfield.save(path)
    loaded = QuantizedField.load(path)

    assert loaded.qparams["window"] == qfield.qparams["window"]
    assert (loaded.qparams["report"]["sa_max"]
            == pytest.approx(qfield.qparams["report"]["sa_max"]))
    assert loaded.module.parents == tuple(module.parents)
    q = _poses(np.random.default_rng(6), 128)
    d_orig = np.asarray(qfield.distance_xla(q))
    d_load = np.asarray(loaded.distance_xla(q))
    np.testing.assert_array_equal(d_load, d_orig)
    # the kernel path reads the same module attrs off the loaded view
    with pltpu.force_tpu_interpret_mode():
        d_krn = np.asarray(loaded.distance(q))
    np.testing.assert_allclose(d_krn, d_orig, atol=1e-5)


def test_quantized_field_load_rejects_other_files(model, tmp_path):
    from posendf_tpu.field import QuantizedField

    path = str(tmp_path / "notafield.msgpack")
    with open(path, "wb") as f:
        f.write(b"\x82\xa5magic\xa3nah\xa1x\x01")
    with pytest.raises(ValueError, match="int8 field"):
        QuantizedField.load(path)


def test_trained_checkpoint_survives_quantization():
    """Realistic (trained) weights at the dims of record: int8 distances
    stay within a small error of f32, and the use of record — ranking /
    comparing poses by distance — is preserved. Uses the L=8 quality-run
    best checkpoint (``docs/quality/ckpt_l8_best.msgpack``, held-out corr
    0.956), the only full-size trained field in the repo; the golden
    checkpoint's 64-wide layers have no quantizable (128-aligned) window."""
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "quality",
        "ckpt_l8_best.msgpack")
    if not os.path.exists(ckpt):
        pytest.skip("L8 quality checkpoint not present")
    field = posendf_tpu.load_field(ckpt)  # defaults = dims of record
    rng = np.random.default_rng(11)
    calib = _poses(rng, 1024)
    qfield = field.quantize_int8(calib)
    assert qfield.qparams["window"] == (1, 5)
    probes = _poses(rng, 2048)
    d32 = np.asarray(field.distance(probes)).ravel()
    d8 = np.asarray(qfield.distance_xla(probes)).ravel()
    # measured on this checkpoint: mae/std 0.023, corr 0.99900,
    # Spearman 0.99960 — bounds leave ~30% headroom
    mae = float(np.mean(np.abs(d8 - d32)))
    denom = max(float(np.std(d32)), 1e-6)
    assert mae < 0.03 * denom, (mae, denom)
    corr = float(np.corrcoef(d8, d32)[0, 1])
    assert corr > 0.998, corr
    # ranking preserved: Spearman via rank vectors
    r32 = np.argsort(np.argsort(d32)).astype(np.float64)
    r8 = np.argsort(np.argsort(d8)).astype(np.float64)
    rho = float(np.corrcoef(r32, r8)[0, 1])
    assert rho > 0.995, rho
