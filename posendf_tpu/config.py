"""Typed configuration that round-trips the reference YAML schema.

The reference loads YAML into a raw nested dict with zero validation
(``configs/config.py:2-6``); the canonical schema is ``configs/amass.yaml``.
Here the same YAML loads into typed dataclasses (unknown/dead keys from the
reference schema are accepted and preserved for round-tripping), with CLI
overrides and sane defaults matching ``configs/amass.yaml`` exactly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml

__all__ = [
    "DataConfig", "ExperimentConfig", "DFNetConfig", "StrEncConfig",
    "TrainConfig", "PoseNDFConfig", "load_config", "save_config",
]


@dataclass
class DataConfig:
    data_dir: str = "./posendf_data/"
    amass_dir: str = "./amass_raw/"
    sample_pt: int = 100000
    sample_distribution: List[float] = field(default_factory=lambda: [0.5, 0.5])
    sample_sigmas: List[float] = field(default_factory=lambda: [0.0, 0.001])
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class ExperimentConfig:
    bodymodel: str = "smpl"
    root_dir: str = "./experiments_out"
    exp_name: str = "main"
    num_part: int = 21
    val: bool = False
    val_every: int = 100   # validation cadence in epochs (reference
                           # trainer.py:23-24 validates every 100)
    test: bool = False
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class DFNetConfig:
    in_dim: int = 126
    dims: List[int] = field(default_factory=lambda: [256, 512, 1024, 512, 256, 64])
    act: str = "lrelu"
    beta: float = 100.0
    ff_enc: bool = False   # NeRF positional encoding on the DFNet input
    ff_freqs: int = 4
    compute_dtype: str = "float32"  # 'bfloat16' = MXU fast path
    precision: str = "default"      # 'highest' = true-fp32 matmuls (parity mode)
    live_head: bool = False         # positive final-bias init: fixes the
                                    # reference's dead-ReLU-head coin flip
                                    # at init (see models/dfnet.py)
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class StrEncConfig:
    use: bool = True
    out_dim: int = 6          # per-joint feature size (reference StrEnc.out_dim)
    in_dim: int = 84
    num_part: int = 21
    act: str = "lrelu"
    beta: float = 100.0
    corrected_tree: bool = False   # opt-in fixed parent table (see kinematics.py)
    fused: bool = False            # Pallas fused-encoder kernel
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class TrainConfig:
    device: str = "tpu"
    batch_size: int = 4            # files per step (x num_pts poses each)
    num_pts: int = 5000            # poses sampled per file (model/load_data.py:21)
    continue_train: bool = True
    optimizer: str = "Adam"
    optimizer_param: float = 1e-5  # learning rate
    weight_decay: float = 1e-4     # reference hardcodes wd=1e-4 (train_posendf.py:30)
    num_worker: int = 8
    max_epoch: int = 200000
    loss_type: str = "l1"
    man_loss: float = 1.0
    dist: float = 1.0
    eikonal: float = 1.0
    flip: bool = False             # quat_flip training inputs (w >= 0)
    remat: bool = False            # jax.checkpoint the loss forwards (big batches)
    fused_grads: bool = False      # Pallas fused train-gradient kernel (TPU,
                                   # lrelu/relu; multi-chip via shard_map+pmean;
                                   # ops/fused_train.py)
    fused_tile: int = 2048         # kernel batch tile (v5e sweep: 2048 at the
                                   # 20k batch; smaller batches clamp anyway)
    ckpt_backend: str = "msgpack"  # or 'orbax'
    early_stop_patience: int = 0   # stop after N consecutive non-improving
                                   # validations (0 = off; needs
                                   # experiment.val). Guards the measured
                                   # training-length erosion (docs/quality/).
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class PoseNDFConfig:
    data: DataConfig = field(default_factory=DataConfig)
    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    dfnet: DFNetConfig = field(default_factory=DFNetConfig)
    strenc: StrEncConfig = field(default_factory=StrEncConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def exp_name(self) -> str:
        """Hyperparameter-encoding experiment dir name, same scheme as the
        reference (``model/train_posendf.py:58-60``)."""
        prefix = "flip_" if self.train.flip else ""
        return (
            f"{prefix}{self.experiment.exp_name}_{self.dfnet.act}_{self.train.loss_type}"
            f"_{self.train.optimizer_param}_dist{self.train.dist}_eik{self.train.eikonal}"
        )

    def make_model(self):
        from posendf_tpu import kinematics
        from posendf_tpu.models import PoseNDF

        parents = kinematics.parent_table(self.strenc.corrected_tree)
        return PoseNDF(
            num_joints=self.experiment.num_part,
            use_encoder=self.strenc.use,
            feature_size=self.strenc.out_dim,
            dfnet_dims=tuple(self.dfnet.dims),
            activation=self.dfnet.act,
            beta=self.dfnet.beta,
            parents=parents,
            use_fused=self.strenc.fused,
            ff_enc=self.dfnet.ff_enc,
            ff_freqs=self.dfnet.ff_freqs,
            compute_dtype=self.dfnet.compute_dtype,
            precision=self.dfnet.precision,
            live_head=self.dfnet.live_head,
        )


def _take(d: Dict[str, Any], cls, mapping: Dict[str, str]) -> Any:
    """Build dataclass from a raw dict: known keys via mapping, rest -> extra."""
    known = {}
    extra = {}
    field_names = {f.name for f in dataclasses.fields(cls)}
    for k, v in d.items():
        dest = mapping.get(k, k)
        if dest in field_names and dest != "extra":
            known[dest] = v
        else:
            extra[k] = v
    return cls(**known, extra=extra)


def load_config(path: str) -> PoseNDFConfig:
    """Load either the reference ``amass.yaml`` schema or this repo's native
    schema (they share key names; reference nesting is auto-detected)."""
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return config_from_dict(raw)


def config_from_dict(raw: Dict[str, Any]) -> PoseNDFConfig:
    data = _take(raw.get("data", {}), DataConfig, {})
    exp = _take(raw.get("experiment", {}), ExperimentConfig, {})
    model = raw.get("model", {})
    dfnet = _take(model.get("DFNet", raw.get("dfnet", {})), DFNetConfig, {})
    strenc = _take(model.get("StrEnc", raw.get("strenc", {})), StrEncConfig, {})
    train = _take(raw.get("train", {}), TrainConfig, {})
    # the reference puts the quat-flip switch under data: (its pretrained
    # 'flip_*' experiments set data.flip); honor it when train.flip is unset
    if "flip" in data.extra and "flip" not in raw.get("train", {}):
        train.flip = bool(data.extra["flip"])
    return PoseNDFConfig(data=data, experiment=exp, dfnet=dfnet, strenc=strenc, train=train)


def save_config(cfg: PoseNDFConfig, path: str) -> None:
    def enc(dc):
        d = dataclasses.asdict(dc)
        d.update(d.pop("extra", {}))
        return d

    raw = {
        "data": enc(cfg.data),
        "experiment": enc(cfg.experiment),
        "model": {"DFNet": enc(cfg.dfnet), "StrEnc": enc(cfg.strenc)},
        "train": enc(cfg.train),
    }
    with open(path, "w") as f:
        yaml.safe_dump(raw, f, sort_keys=False)
