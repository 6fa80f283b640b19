from posendf_tpu.data.pipeline import TrainingBatcher, prefetch_to_device
from posendf_tpu.data.splits import AMASS_SPLITS

__all__ = ["TrainingBatcher", "prefetch_to_device", "AMASS_SPLITS"]
