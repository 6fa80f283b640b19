"""Import reference PyTorch checkpoints into PoseNDF-TPU params.

The reference saves ``{epoch, model_state_dict, optimizer_state_dict}`` to
``checkpoints/checkpoint_epoch_best.tar`` (``model/train_posendf.py:147-156``)
with state-dict keys:

  * ``enc.net.{i}.net.0.{weight,bias}``  — BoneMLP layer 1, i in 0..20
    (weight shape (10, 4) for roots, (10, 10) otherwise),
  * ``enc.net.{i}.net.2.{weight,bias}``  — BoneMLP layer 2, weight (6, 10),
  * ``dfnet.lin{l}.{weight,bias}``       — DFNet layers, l in 0..6.

Mapping to the TPU layout: torch Linear computes ``x @ W.T + b``; our dense
layers store ``(in, out)``, so weights transpose. Root BoneMLP weights are
zero-padded from 4 to 10 input columns (the pad multiplies an identically-zero
parent feature — see ``models/encoder.py``). This importer supports the 1e-4
distance-parity requirement against pretrained reference models.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

from posendf_tpu import kinematics

__all__ = [
    "params_from_torch_state_dict",
    "load_torch_checkpoint",
    "torch_state_dict_from_params",
    "save_torch_checkpoint",
]


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch.Tensor without importing torch at module scope
    return t.detach().cpu().numpy()


def params_from_torch_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    *,
    parents: Sequence[int] = kinematics.REFERENCE_PARENTS,
    feature_size: int = 6,
    dtype=np.float32,
) -> Dict:
    """Build a PoseNDF params pytree from a reference torch state dict."""
    sd = {k: _to_numpy(v).astype(dtype) for k, v in state_dict.items()}
    J = len(parents)
    bone_dim = 4
    hidden = bone_dim + feature_size

    params: Dict = {}
    has_enc = any(k.startswith("enc.") for k in sd)
    if has_enc:
        w1 = np.zeros((J, hidden, hidden), dtype=dtype)
        b1 = np.zeros((J, hidden), dtype=dtype)
        w2 = np.zeros((J, hidden, feature_size), dtype=dtype)
        b2 = np.zeros((J, feature_size), dtype=dtype)
        for j in range(J):
            tw1 = sd[f"enc.net.{j}.net.0.weight"]  # (hidden, fan_in)
            fan_in = tw1.shape[1]
            w1[j, :fan_in, :] = tw1.T
            b1[j] = sd[f"enc.net.{j}.net.0.bias"]
            w2[j] = sd[f"enc.net.{j}.net.2.weight"].T
            b2[j] = sd[f"enc.net.{j}.net.2.bias"]
        params["enc"] = {"w1": w1, "b1": b1, "w2": w2, "b2": b2}

    dfnet: Dict = {}
    l = 0
    while f"dfnet.lin{l}.weight" in sd:
        dfnet[f"w{l}"] = sd[f"dfnet.lin{l}.weight"].T
        dfnet[f"b{l}"] = sd[f"dfnet.lin{l}.bias"]
        l += 1
    if l == 0:
        raise ValueError("state dict has no dfnet.lin* keys — not a PoseNDF checkpoint")
    params["dfnet"] = dfnet
    return params


def torch_state_dict_from_params(
    params: Mapping,
    *,
    parents: Sequence[int] = kinematics.REFERENCE_PARENTS,
) -> Dict[str, "np.ndarray"]:
    """Inverse of ``params_from_torch_state_dict``: export TPU params to the
    reference's state-dict layout so users can move checkpoints back to the
    PyTorch implementation. Root BoneMLP weights are un-padded to (10, 4)."""
    out: Dict[str, np.ndarray] = {}
    if "enc" in params:
        enc = params["enc"]
        w1 = np.asarray(enc["w1"])
        b1 = np.asarray(enc["b1"])
        w2 = np.asarray(enc["w2"])
        b2 = np.asarray(enc["b2"])
        for j, p in enumerate(parents):
            fan_in = 4 if p == -1 else w1.shape[1]
            out[f"enc.net.{j}.net.0.weight"] = w1[j, :fan_in, :].T.copy()
            out[f"enc.net.{j}.net.0.bias"] = b1[j].copy()
            out[f"enc.net.{j}.net.2.weight"] = w2[j].T.copy()
            out[f"enc.net.{j}.net.2.bias"] = b2[j].copy()
    dfnet = params["dfnet"]
    l = 0
    while f"w{l}" in dfnet:
        out[f"dfnet.lin{l}.weight"] = np.asarray(dfnet[f"w{l}"]).T.copy()
        out[f"dfnet.lin{l}.bias"] = np.asarray(dfnet[f"b{l}"]).copy()
        l += 1
    return out


def save_torch_checkpoint(path: str, params: Mapping, epoch: int = 0,
                          **kwargs) -> None:
    """Write a reference-format ``.tar`` checkpoint (model_state_dict +
    epoch) loadable by the upstream PyTorch code. Requires torch."""
    import torch

    sd = {k: torch.from_numpy(v) for k, v in
          torch_state_dict_from_params(params, **kwargs).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd}, path)


def load_torch_checkpoint(path: str, **kwargs) -> Tuple[Dict, Optional[int]]:
    """Load a reference ``checkpoint_epoch_best.tar`` file. Returns (params,
    epoch). Requires torch (CPU build is sufficient)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("model_state_dict", ckpt)
    epoch = ckpt.get("epoch") if isinstance(ckpt, dict) else None
    return params_from_torch_state_dict(state_dict, **kwargs), epoch
