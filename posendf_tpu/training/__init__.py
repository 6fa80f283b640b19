from posendf_tpu.training.checkpoints import CheckpointStore
from posendf_tpu.training.init_utils import he_gain, moment_matched_head_init
from posendf_tpu.training.torch_import import (
    load_torch_checkpoint,
    params_from_torch_state_dict,
)

__all__ = [
    "CheckpointStore",
    "he_gain",
    "load_torch_checkpoint",
    "moment_matched_head_init",
    "params_from_torch_state_dict",
]


def __getattr__(name):
    # Trainer pulls in optax; import lazily to keep light paths light.
    if name in ("Trainer", "make_optimizer", "make_train_step"):
        from posendf_tpu.training import trainer as _t

        return getattr(_t, name)
    raise AttributeError(name)
