from posendf_tpu.experiments.camera import init_camera, project_points
from posendf_tpu.experiments.denoise import MotionDenoiser, v2v_cm
from posendf_tpu.experiments.fit_image import ImageFitter
from posendf_tpu.experiments.interpolate import interpolate
from posendf_tpu.experiments.optim import (
    AnnealSpec,
    make_annealed_solver,
    run_annealed_adam,
)
from posendf_tpu.experiments.partial import (
    PartialCompleter,
    complete_by_retrieval,
    dof_mask,
    observation_mask,
)
from posendf_tpu.experiments.render import render_meshes, save_meshes, save_obj

__all__ = [
    "init_camera", "project_points",
    "MotionDenoiser", "v2v_cm",
    "ImageFitter",
    "interpolate",
    "AnnealSpec", "make_annealed_solver", "run_annealed_adam",
    "PartialCompleter", "complete_by_retrieval", "dof_mask",
    "observation_mask",
    "render_meshes", "save_meshes", "save_obj",
]
