"""From-scratch initialization that survives the dead-ReLU-head attractor.

The reference trains with a final ReLU on the distance head
(``/root/reference/model/network/net_modules.py:30-41,69``) under torch's
default U(+-1/sqrt(fan_in)) linear init. That combination has a measured
failure mode when training from scratch (it does not affect loading trained
checkpoints):

- the 9-layer stack contracts the input signal, so the head pre-activation
  ``z`` is nearly constant across poses with a spread (~0.16 after an He
  gain) that dwarfs the kNN distance labels (~0.02 at the reference sigma
  grid, ``data/create_data.py:51-52``);
- every pose therefore starts far above its label, the dist-L1 force is
  uniformly downward, predictions cross zero, and the ReLU clamps them
  there.  In the clamped region BOTH the value and the input gradient are
  exactly zero, so the dist, manifold, and eikonal terms all vanish — the
  constant-zero field is an absorbing state.  Measured on the synthetic
  end-to-end benchmark (``scripts/quality_grid.py``): four independent runs
  (lr 1e-4..3e-5, 300..20000 steps, with/without bias recentering) all
  collapsed within ~500 steps (field corr NaN, live fraction 0%).

``moment_matched_head_init`` removes the attractor without changing the
architecture or the loss: scale the last layer so the pre-activation spread
matches the LABEL spread, and recenter its bias just under the label mean.
Initial predictions are then a small random function at the right scale —
the L1 force is differential (half up, half down) from step 0 instead of a
uniform push into the dead zone.  With it, the same run that collapsed
trains to field corr 0.81 / live 37.5% / clean-vs-noisy separation
0.0000 vs 0.0144 (probe of record, 2026-08-19).

This is an opt-in training aid, not a parity default: the torch-faithful
init stays the default per the repo's quirk convention (CLAUDE.md).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["he_gain", "moment_matched_head_init"]

# torch's default Linear init draws U(+-1/sqrt(fan_in)) — variance 1/(3n).
# He's ReLU-family variance is 2/n: a sqrt(6) gain converts one to the other
# while keeping the exact draw (so seeds stay comparable across modes).
HE_GAIN = float(np.sqrt(6.0))


def he_gain(params: dict, gain: float = HE_GAIN) -> dict:
    """Scale every weight matrix (keys starting with ``w``) by ``gain``.

    Under the torch-parity init the input-gradient norm through the default
    9-layer stack is ~2e-4, so the eikonal term starts flat; the He gain
    restores a live gradient field at init. Biases are untouched.
    """
    return {
        top: {k: (v * gain if k.startswith("w") else v) for k, v in sub.items()}
        for top, sub in params.items()
    }


def _head_layer_index(dfnet_params: dict) -> int:
    return max(int(k[1:]) for k in dfnet_params if k[0] == "w")


def moment_matched_head_init(
    module,
    params: dict,
    probe_poses: jax.Array,
    labels: np.ndarray,
    *,
    gain: float = HE_GAIN,
    mean_frac: float = 0.8,
) -> Tuple[dict, dict]:
    """He-gain ``params`` and moment-match the head layer to the labels.

    Args:
        module: the PoseNDF flax module ``params`` belongs to.
        probe_poses: (B, 21, 4) sample of the TRAINING poses (a few thousand
            noisy queries); the pre-activation statistics are measured on it.
        labels: their kNN distance labels, shape (B,) (mean-of-k, the
            quantity the dist-L1 term regresses).
        gain: weight gain applied first (sqrt(6) = torch-default -> He).
        mean_frac: the head bias is recentered so the mean pre-activation is
            ``mean_frac * labels.mean()``.  Must stay below 1: starting just
            UNDER the targets makes the net initial L1 force gently upward,
            away from the ReLU dead zone.

    Returns:
        (new_params, stats) where stats records the measured moments
        (``z_mean``, ``z_std``, ``scale``, ``new_bias``) for logging.
    """
    params = he_gain(params, gain)
    dfn = dict(params["dfnet"])
    li = _head_layer_index(dfn)
    b_arr = dfn[f"b{li}"]
    bL = float(np.asarray(b_arr).ravel()[0])

    # Read the UNCLAMPED head pre-activation through a +100 bias shift: the
    # output activation (ReLU or softplus) is ~identity far above zero, so
    # apply(shifted) - 100 recovers z without touching the module. Probe
    # through a non-Pallas clone when the encoder is fused (same param
    # tree; Mosaic kernels cannot run inside this one-off CPU-safe apply).
    probe_mod = (module.clone(use_fused=False)
                 if getattr(module, "use_fused", False) else module)
    shifted = dict(params, dfnet=dict(dfn, **{f"b{li}": b_arr + 100.0}))
    z = np.asarray(
        jax.jit(lambda p, q: probe_mod.apply({"params": p}, q))(shifted, probe_poses)
        - 100.0
    ).ravel()

    lbl = np.asarray(labels).ravel()
    if float(lbl.std()) < 1e-9:
        # degenerate/constant labels would zero the head weight matrix and
        # silently produce a constant field — same class of guard as the
        # z.std() floor below
        raise ValueError(
            "moment_matched_head_init: the probe labels have ~zero spread "
            f"(std={float(lbl.std()):.3g}); matching the head to them would "
            "zero the weight matrix. Check the label pipeline (a constant "
            "dist column usually means the kNN labeler ran against a "
            "degenerate corpus).")
    scale = float(lbl.std()) / max(float(z.std()), 1e-9)
    dfn[f"w{li}"] = dfn[f"w{li}"] * scale
    new_mean = scale * (float(z.mean()) - bL) + bL
    new_bias = bL + float(mean_frac * lbl.mean() - new_mean)
    dfn[f"b{li}"] = jnp.full_like(b_arr, new_bias)

    stats = {
        "z_mean": float(z.mean()),
        "z_std": float(z.std()),
        "label_mean": float(lbl.mean()),
        "label_std": float(lbl.std()),
        "scale": scale,
        "new_bias": new_bias,
    }
    return dict(params, dfnet=dfn), stats
