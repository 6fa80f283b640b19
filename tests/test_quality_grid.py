"""Plumbing test for scripts/quality_grid.py — the synthetic end-to-end
reproduction of the reference's headline denoise benchmark
(/root/reference/experiments/motion_denoise.py:171-191).

A micro-sized run must traverse every stage (label -> train -> field eval ->
denoise grid) and emit a well-formed result JSON. Quality itself is NOT
asserted here (the micro budget can't train a real field; the measured grid
lives in docs/ARCHITECTURE.md) — this guards the harness so the recorded
numbers stay reproducible.

Runs in a subprocess: the script manages its own jax platform/config, which
must not leak into this process's 8-virtual-device CPU backend.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "quality_grid.py")


def test_quality_grid_micro(tmp_path):
    out = tmp_path / "qg.json"
    cmd = [
        sys.executable, SCRIPT, "--preset", "smoke", "--device", "cpu",
        "--corpus", "512", "--queries", "1024", "--steps", "30",
        "--batch", "256", "--clips", "1", "--frames", "6",
        "--sigmas", "0.1", "--ablate-prior", "--out", str(out),
        # cover the generalized manifold family (the run-of-record uses a
        # higher intrinsic dimension so labels span the sigma grid)
        "--latents", "4", "--freq", "0.3", "0.8",
        # cover the r5 structured-noise labeling path end to end
        "--structured-frac", "0.25",
        "--save-ckpt", str(tmp_path / "qg.msgpack"),
    ]
    env = dict(os.environ)
    # the script forces the CPU backend itself (smoke preset); keep the
    # subprocess from inheriting this suite's forced 8-device flag wholesale
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr

    result = json.loads(out.read_text())
    assert result["corpus"] == 512 and result["queries"] == 1024
    # every stage produced a finite measurement
    assert np.isfinite(result["label_s"]) and result["label_s"] > 0
    assert np.isfinite(result["train_s"]) and result["train_s"] > 0
    assert np.isfinite(result["field_mae"])
    assert 0.0 <= result["field_live_frac"] <= 1.0
    (row,) = result["grid"]
    assert row["sigma"] == 0.1
    assert np.isfinite(row["v2v_input_cm"]) and row["v2v_input_cm"] > 0
    assert np.isfinite(row["v2v_out_cm"]) and row["v2v_out_cm"] > 0
    assert np.isfinite(row["final_pose_pr"])
    assert np.isfinite(row["prior_at_input"])
    # prior ablation: the zero-prior solve ran and the attribution fields
    # are consistent
    assert np.isfinite(row["v2v_out_noprior_cm"]) and row["v2v_out_noprior_cm"] > 0
    assert row["prior_v2v_gain_cm"] == (
        row["v2v_out_noprior_cm"] - row["v2v_out_cm"])
    # val gating on by default: best retention fields recorded
    assert result["val_gate"] is True
    assert result["field_corr_best"] is None or np.isfinite(result["field_corr_best"])
    assert result["best_step"] >= 0
    # recenter provenance: only meaningful for --init he (default he-matched)
    assert result["recenter"] is None
    # manifold-family provenance recorded
    assert result["latents"] == 4 and result["freq"] == [0.3, 0.8]
    assert result["structured_frac"] == 0.25

    # --load-ckpt: re-run the grid from the saved params WITHOUT training
    # (how docs/quality/ckpt_l8_best.msgpack is consumed) — field eval must
    # reproduce the trained field exactly
    out2 = tmp_path / "qg_loaded.json"
    cmd2 = [
        sys.executable, SCRIPT, "--preset", "smoke", "--device", "cpu",
        "--corpus", "512", "--queries", "1024", "--steps", "30",
        "--batch", "256", "--clips", "1", "--frames", "6",
        "--sigmas", "0.1", "--out", str(out2),
        "--latents", "4", "--freq", "0.3", "0.8",
        # same noise spec as the training run: the held-out label draw must
        # match for the exact-reproduction assertion below
        "--structured-frac", "0.25",
        "--load-ckpt", str(tmp_path / "qg.msgpack"),
    ]
    proc = subprocess.run(cmd2, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    loaded = json.loads(out2.read_text())
    assert loaded["steps"] == 0 and loaded["train_s"] == 0.0
    assert loaded["init"] == "loaded"
    assert loaded["loaded_ckpt"].endswith("qg.msgpack")
    # same params + same held-out labels (seeded) -> identical field eval
    assert loaded["field_mae"] == result["field_mae"]
    (lrow,) = loaded["grid"]
    assert np.isfinite(lrow["v2v_out_cm"]) and lrow["v2v_out_cm"] > 0


def test_val_gate_triggers_on_nan_final_corr():
    """The gate must swap in the retained best when the final field
    COLLAPSED (pred.std()==0 -> corr NaN): a bare `best > nan` comparison is
    False, which would bypass the gate in exactly the run it exists to save."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("quality_grid", SCRIPT)
    qg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qg)

    assert qg.gate_should_swap(0.95, float("nan"))      # collapsed final
    assert qg.gate_should_swap(0.95, 0.30)              # ordinary erosion
    assert not qg.gate_should_swap(0.95, 0.96)          # final still best
