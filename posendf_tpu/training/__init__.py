from posendf_tpu.training.checkpoints import CheckpointStore
from posendf_tpu.training.torch_import import (
    load_torch_checkpoint,
    params_from_torch_state_dict,
)

__all__ = [
    "CheckpointStore",
    "load_torch_checkpoint",
    "params_from_torch_state_dict",
]


def __getattr__(name):
    # Trainer pulls in optax; import lazily to keep light paths light.
    if name in ("Trainer", "make_optimizer", "make_train_step"):
        from posendf_tpu.training import trainer as _t

        return getattr(_t, name)
    raise AttributeError(name)
