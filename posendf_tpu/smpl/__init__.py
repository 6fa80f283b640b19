from posendf_tpu.smpl.body_model import BodyModel, BodyModelOutput
from posendf_tpu.smpl.lbs import (
    SMPLModel,
    lbs_forward,
    load_smpl_model,
    synthetic_model,
)

__all__ = [
    "BodyModel", "BodyModelOutput",
    "SMPLModel", "lbs_forward", "load_smpl_model", "synthetic_model",
]
