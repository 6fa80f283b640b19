from posendf_tpu.training.torch_import import (
    load_torch_checkpoint,
    params_from_torch_state_dict,
)

__all__ = ["load_torch_checkpoint", "params_from_torch_state_dict"]
