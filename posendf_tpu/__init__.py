"""PoseNDF-TPU: a TPU-native neural pose-manifold distance-field framework.

A ground-up JAX / Flax / pjit / Pallas rebuild of the capabilities of
Pose-NDF (ECCV 2022; reference implementation garvita-tiwari/PoseNDF):
learning a neural unsigned distance field over the manifold of plausible
human poses — points on (S^3)^21 — and using it as a differentiable prior
for pose generation, interpolation, motion denoising and image-based fitting.

Everything on the compute path is jit-compiled XLA with optional Pallas
kernels; scaling is via jax.sharding meshes (data-parallel training, sharded
kNN labeling, frame-sharded sequence optimization with halo exchange).
"""

from posendf_tpu import quat, kinematics
from posendf_tpu.config import PoseNDFConfig, load_config
from posendf_tpu.field import Field, load_field, make_field
from posendf_tpu.models import DFNet, PoseNDF, StructureEncoder

__version__ = "0.1.0"

__all__ = [
    "quat", "kinematics",
    "PoseNDFConfig", "load_config",
    "Field", "load_field", "make_field",
    "DFNet", "PoseNDF", "StructureEncoder",
]
