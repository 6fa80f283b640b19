from posendf_tpu.models.dfnet import DFNet
from posendf_tpu.models.encoder import StructureEncoder
from posendf_tpu.models.posendf import PoseNDF

__all__ = ["DFNet", "StructureEncoder", "PoseNDF"]
