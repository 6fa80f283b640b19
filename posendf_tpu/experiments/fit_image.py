"""Image-based 3D pose estimation: SMPLify-style fitting with the field prior.

Capability parity with the reference ``ImageFit``
(``experiments/image_fitting.py:21-243``). The reference's staged loop is
sketch-quality (undefined names, tensors overwritten with booleans — SURVEY.md
§2.1 #23); this implements the *intended* three-stage behavior:

  stage 1 — camera init (``:110-137``): optimize camera ROTATION +
    translation + body global orientation against the torso keypoints
    (OpenPose RHip/LHip/RShoulder/LShoulder), with a depth regularizer
    toward an initial distance estimate (``trans_estimation = 10`` in the
    reference, ``:32``). The reference's ``PerspectiveCamera`` registers
    rotation as a learnable ``nn.Parameter`` (``exp_utils.py:90-95``) — a
    raw 3x3 that gradient steps would drift off SO(3); here rotation is
    parameterized as axis-angle and mapped through
    ``axis_angle_to_matrix``, so it stays a rotation while optimizing
    (set ``optimize_camera_rotation=False`` for the fixed-identity
    SMPLify convention);
  stage 2 — full-body fit (``:139-168``): optimize pose + orientation + betas
    under confidence-weighted 2D reprojection error + the pose prior;
  stage 3 — pose refinement (``:183-213``): the denoising schedule (prior +
    data term toward the stage-2 joints).

Keypoints are OpenPose BODY_25 (x, y, confidence), the format the reference
reads from ``kpts.npz`` (``:239``); SMPL joints map to OpenPose via
``SMPL_TO_OPENPOSE`` (unmapped keypoints get zero weight).

Each stage is one jitted annealed-Adam scan (experiments/optim.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu.experiments.camera import init_camera, project_points
from posendf_tpu.experiments.optim import AnnealSpec, make_annealed_solver
from posendf_tpu.quat import axis_angle_to_quaternion
from posendf_tpu.smpl import BodyModel
from posendf_tpu.smpl.lbs import SMPL_VERTEX_LANDMARKS, lbs_forward, with_landmarks

__all__ = ["ImageFitter", "SMPL_TO_OPENPOSE", "SMPLX45_TO_OPENPOSE", "run_cli"]

# OpenPose BODY_25 index -> SMPL joint index (-1 = no SMPL correspondence:
# eyes/ears/feet tips live on mesh vertices, out of scope for the 24-joint
# skeleton of synthetic test meshes).
SMPL_TO_OPENPOSE = np.array([
    15,  # 0  nose ~ head
    12,  # 1  neck
    17,  # 2  RShoulder
    19,  # 3  RElbow
    21,  # 4  RWrist
    16,  # 5  LShoulder
    18,  # 6  LElbow
    20,  # 7  LWrist
    0,   # 8  MidHip ~ pelvis
    2,   # 9  RHip
    5,   # 10 RKnee
    8,   # 11 RAnkle
    1,   # 12 LHip
    4,   # 13 LKnee
    7,   # 14 LAnkle
    -1, -1, -1, -1,  # 15-18 eyes/ears
    -1, -1, -1, -1, -1, -1,  # 19-24 feet
])

# 45-joint (smplx Jtr with vertex landmarks, lbs.SMPL_VERTEX_LANDMARKS order:
# 24 nose, 25-28 R/L eye, R/L ear, 29-34 L/R BigToe SmallToe Heel) ->
# BODY_25.  On real SMPL meshes every BODY_25 keypoint has a correspondence,
# so the fit also constrains head orientation and foot contact — the signal
# the reference's ``camera(body_model_output.joints)`` projection carries
# (``image_fitting.py:68,86`` projects the full smplx joint set).
SMPLX45_TO_OPENPOSE = np.array([
    24,  # 0  nose (landmark, not the head joint)
    12,  # 1  neck
    17, 19, 21,        # 2-4   R shoulder/elbow/wrist
    16, 18, 20,        # 5-7   L shoulder/elbow/wrist
    0,                 # 8     MidHip
    2, 5, 8,           # 9-11  R hip/knee/ankle
    1, 4, 7,           # 12-14 L hip/knee/ankle
    25, 26, 27, 28,    # 15-18 REye LEye REar LEar
    29, 30, 31,        # 19-21 LBigToe LSmallToe LHeel
    32, 33, 34,        # 22-24 RBigToe RSmallToe RHeel
])

TORSO_OPENPOSE_IDXS = (9, 12, 2, 5)  # reference init_joints_idxs (:30)

STAGE1_SPECS = {"data": AnnealSpec(scale=1.0), "depth": AnnealSpec(scale=100.0)}
STAGE2_SPECS = {"data": AnnealSpec(scale=1.0),
                "pose_pr": AnnealSpec(scale=100.0, power=1, anneal=-1.0)}
STAGE3_SPECS = {
    "pose_pr": AnnealSpec(scale=100.0, power=1, anneal=-1.0),
    "data": AnnealSpec(scale=10.0, power=1, anneal=-1.0, active_after=0),
}

# The reference weights the fit prior LINEARLY (1e2 * L / (1+it),
# image_fitting.py:40) — measured failure mode on a trained lrelu field:
# a ReLU-clamped distance head's d=0 set is a REGION (not a surface), and
# from the zero-pose init (inside it) the linear boundary penalty
# 100*grad(d) pins the solve there, overriding the keypoints entirely
# (stage-2 residual stalls ~8000 px^2 vs ~80 prior-off; the final pose is
# IDENTICAL whatever the observations). The denoise schedule never hits
# this because ITS prior is self-weighted (1e7 * L^2, motion_denoise.py:33)
# — the weight vanishes with the loss, so small excursions off the zero
# set are nearly free. ``prior_form='self'`` applies that same
# self-weighted form to fit stages 2-3 (scripts/fit_image_quality.py
# measures the ablation with it); the default stays reference-exact.
SELF_WEIGHTED_PRIOR = AnnealSpec(scale=1e7, power=2, anneal=-1.0)


class ImageFitter:
    def __init__(self, module, params, body_model: BodyModel,
                 trans_estimation: float = 10.0, focal_length: float = 5000.0,
                 optimize_camera_rotation: bool = True,
                 prior_scale: float = 1.0, prior_form: str = "reference"):
        """``prior_scale`` multiplies the pose-prior weight of stages 2-3
        (0.0 = the prior-off ablation with an otherwise identical solve —
        scripts/fit_image_quality.py measures what the prior buys).
        ``prior_form``: 'reference' = the linear 1e2*L/(1+it) weighting
        (image_fitting.py:40); 'self' = the denoise schedule's
        self-weighted 1e7*L^2/(1+it) (see SELF_WEIGHTED_PRIOR — escapes
        the zero-region pinning the linear form measurably suffers)."""
        if prior_form not in ("reference", "self"):
            raise ValueError(f"prior_form must be 'reference' or 'self', "
                             f"got {prior_form!r}")
        self.module = module
        self.params = params
        self.body_model = body_model
        self.trans_estimation = trans_estimation
        self.focal_length = focal_length
        self.optimize_camera_rotation = optimize_camera_rotation
        self.prior_scale = prior_scale
        self.prior_form = prior_form
        # stage solvers cached by (batch, iterations, steps_per_iter): all
        # per-image data flows through the solver's aux pytree, so fitting a
        # folder of same-shaped keypoint files compiles each stage ONCE (the
        # MotionDenoiser pattern; recompiling is seconds per image, minutes
        # over a remote-compile relay)
        self._solvers = {}

    def _mapped_joints(self, joints: jax.Array) -> jax.Array:
        """(B, 24|45, 3) joints -> (B, 25, 3) OpenPose-ordered. With the
        45-joint landmark set every BODY_25 slot is real; on 24-joint
        synthetic meshes eye/ear/feet slots fall back to joint 0 and are
        masked by the validity weights."""
        table = (SMPLX45_TO_OPENPOSE if joints.shape[1] >= 45
                 else SMPL_TO_OPENPOSE)
        gather = np.where(table >= 0, table, 0)
        return joints[:, gather, :]

    def _get_solvers(self, B: int, iterations: int, steps_per_iter: int):
        key = (B, iterations, steps_per_iter)
        if key in self._solvers:
            return self._solvers[key]

        smpl_model = self.body_model.model
        module, params = self.module, self.params
        n_betas = self.body_model.num_betas
        focal = self.focal_length
        trans_est = self.trans_estimation
        torso = np.asarray(TORSO_OPENPOSE_IDXS)

        def fk(betas, orient, pose):
            verts, joints = lbs_forward(smpl_model, betas, orient, pose)
            return verts, with_landmarks(verts, joints)

        opt_rot = self.optimize_camera_rotation

        def stage1_terms(p, aux):
            from posendf_tpu.quat import axis_angle_to_matrix

            _, joints = fk(jnp.zeros((B, n_betas)), p["global_orient"],
                           jnp.zeros((B, 69)))
            rot = (axis_angle_to_matrix(p["cam_rot"]) if opt_rot
                   else aux["rot0"])
            cam = {"rotation": rot, "translation": p["translation"]}
            proj = project_points(cam, self._mapped_joints(joints), focal,
                                  aux["center"])
            err = jnp.sum((proj[:, torso] - aux["gt_xy"][:, torso]) ** 2)
            depth = jnp.sum((p["translation"][:, 2] - trans_est) ** 2)
            return {"data": err, "depth": depth}

        def stage2_terms(p, aux):
            _, joints = fk(p["betas"], p["global_orient"], p["pose_body"])
            cam = {"rotation": aux["rot"], "translation": aux["translation"]}
            proj = project_points(cam, self._mapped_joints(joints), focal,
                                  aux["center"])
            conf = aux["conf"]
            err = jnp.sum(conf[..., None] * (proj - aux["gt_xy"]) ** 2) \
                / (jnp.sum(conf) + 1e-8)
            quat = axis_angle_to_quaternion(p["pose_body"].reshape(B, 23, 3)[:, :21])
            prior = jnp.mean(module.apply({"params": params}, quat))
            return {"data": err, "pose_pr": prior}

        def stage3_terms(pose_body, aux):
            quat = axis_angle_to_quaternion(pose_body.reshape(B, 23, 3)[:, :21])
            prior = jnp.mean(module.apply({"params": params}, quat))
            _, joints = fk(aux["betas"], aux["orient"], pose_body)
            data = jnp.mean(jnp.sqrt(
                jnp.sum((joints - aux["anchor_joints"]) ** 2, -1) + 1e-12))
            return {"pose_pr": prior, "data": data}

        kw = dict(iterations=iterations, steps_per_iter=steps_per_iter, lr=0.02)
        g = self.prior_scale
        base_pr = (SELF_WEIGHTED_PRIOR if self.prior_form == "self"
                   else STAGE2_SPECS["pose_pr"])
        specs2 = dict(STAGE2_SPECS,
                      pose_pr=base_pr._replace(scale=base_pr.scale * g))
        specs3 = dict(STAGE3_SPECS,
                      pose_pr=base_pr._replace(scale=base_pr.scale * g))
        solvers = (
            make_annealed_solver(stage1_terms, STAGE1_SPECS, **kw),
            make_annealed_solver(stage2_terms, specs2, **kw),
            make_annealed_solver(stage3_terms, specs3, **kw),
        )
        self._solvers[key] = solvers
        return solvers

    def optimize(
        self,
        keypoints: np.ndarray,           # (25, 3) or (B, 25, 3) x, y, conf
        iterations: int = 10,
        steps_per_iter: int = 10,
        center: Optional[np.ndarray] = None,  # (2,) principal point (pixels)
    ) -> Tuple[Dict[str, jax.Array], Dict[str, float]]:
        kp = jnp.asarray(keypoints, jnp.float32)
        if kp.ndim == 2:
            kp = kp[None]
        B = kp.shape[0]
        gt_xy = kp[..., :2]
        conf = kp[..., 2]
        # real SMPL meshes carry the 45-joint landmark set -> every BODY_25
        # keypoint maps; synthetic 24-joint test meshes mask eyes/ears/feet
        n_verts = self.body_model.model.v_template.shape[0]
        has_landmarks = n_verts > int(SMPL_VERTEX_LANDMARKS.max())
        table = SMPLX45_TO_OPENPOSE if has_landmarks else SMPL_TO_OPENPOSE
        valid = jnp.asarray(table >= 0, jnp.float32)[None]
        conf = conf * valid
        center_arr = (jnp.tile(jnp.asarray(center, jnp.float32)[None], (B, 1))
                      if center is not None else jnp.zeros((B, 2)))

        n_betas = self.body_model.num_betas
        solve1, solve2, solve3 = self._get_solvers(B, iterations, steps_per_iter)

        def fk(betas, orient, pose):
            verts, joints = lbs_forward(self.body_model.model, betas, orient, pose)
            return verts, with_landmarks(verts, joints)

        # ---- stage 1: camera rotation + translation + global orient on
        # torso joints
        cam0 = init_camera(B)
        cam0["translation"] = cam0["translation"].at[:, 2].set(self.trans_estimation)
        rot0 = cam0["rotation"]
        stage1_init = {"translation": cam0["translation"],
                       "global_orient": jnp.zeros((B, 3))}
        if self.optimize_camera_rotation:
            stage1_init["cam_rot"] = jnp.zeros((B, 3))
        p1, h1 = solve1(stage1_init,
                        {"rot0": rot0, "center": center_arr, "gt_xy": gt_xy})
        if self.optimize_camera_rotation:
            from posendf_tpu.quat import axis_angle_to_matrix

            rot = axis_angle_to_matrix(jax.lax.stop_gradient(p1["cam_rot"]))
        else:
            rot = rot0

        # ---- stage 2: full body (pose, orient, betas) vs all keypoints + prior
        translation = jax.lax.stop_gradient(p1["translation"])
        # NOT exact zeros: the reference model's joint-axis normalize
        # (x,y,z)/||xyz|| is directionally singular at zero rotations —
        # measured on the trained L=8 field, d jumps 0.008 -> 0.104 within
        # 1e-3 of the zero pose and the prior gradient there is ~2e10,
        # which poisons Adam's second moment for the whole solve (the
        # fit then ignores the keypoints entirely). The reference never
        # starts at exact zeros (it inits from loaded data,
        # image_fitting.py:239); a tiny fixed symmetry-breaking draw is
        # the equivalent safeguard here.
        pose0 = 1e-2 * jax.random.normal(jax.random.key(0), (B, 69))
        stage2_init = {
            "pose_body": pose0,
            "global_orient": jax.lax.stop_gradient(p1["global_orient"]),
            "betas": jnp.zeros((B, n_betas)),
        }
        p2, h2 = solve2(stage2_init,
                        {"rot": rot, "center": center_arr, "gt_xy": gt_xy,
                         "conf": conf, "translation": translation})

        # ---- stage 3: pose refinement around the stage-2 solution
        _, anchor_joints = fk(p2["betas"], p2["global_orient"], p2["pose_body"])
        anchor_joints = jax.lax.stop_gradient(anchor_joints)
        betas2 = jax.lax.stop_gradient(p2["betas"])
        orient2 = jax.lax.stop_gradient(p2["global_orient"])
        pose3, h3 = solve3(p2["pose_body"],
                           {"betas": betas2, "orient": orient2,
                            "anchor_joints": anchor_joints})

        result = {
            "pose_body": pose3,
            "global_orient": orient2,
            "betas": betas2,
            "camera_translation": translation,
            "camera_rotation": rot,
        }
        metrics = {
            "stage1_final_data": float(h1["data"][-1]),
            "stage2_final_data": float(h2["data"][-1]),
            "stage2_final_prior": float(h2["pose_pr"][-1]),
            "stage3_final_prior": float(h3["pose_pr"][-1]),
        }
        return result, metrics


def project_result_keypoints(fitter: ImageFitter, result: Dict[str, jax.Array],
                             center: Optional[np.ndarray] = None) -> np.ndarray:
    """Project the fitted body's BODY_25 keypoints through the fitted camera:
    (B, 25, 2) pixel coordinates — the quantity the reference's staged fit
    renders against the image (``image_fitting.py:68,86``)."""
    verts, joints = lbs_forward(fitter.body_model.model, result["betas"],
                                result["global_orient"], result["pose_body"])
    joints = with_landmarks(verts, joints)
    B = joints.shape[0]
    center_arr = (jnp.tile(jnp.asarray(center, jnp.float32)[None], (B, 1))
                  if center is not None else jnp.zeros((B, 2)))
    cam = {"rotation": result["camera_rotation"],
           "translation": result["camera_translation"]}
    proj = project_points(cam, fitter._mapped_joints(joints),
                          fitter.focal_length, center_arr)
    return np.asarray(proj)


def save_keypoint_overlay(img_path: str, out_path: str, proj_xy: np.ndarray,
                          gt_xy: Optional[np.ndarray] = None,
                          radius: int = 4) -> Optional[str]:
    """Draw projected (and optionally ground-truth) keypoints over the image.
    Returns the written path, or None when PIL is unavailable (overlay is
    diagnostics, same policy as render.py)."""
    try:
        from PIL import Image, ImageDraw
    except Exception:
        return None
    img = Image.open(img_path).convert("RGB")
    draw = ImageDraw.Draw(img)

    def dots(xy, color):
        for x, y in np.asarray(xy).reshape(-1, 2):
            if np.isfinite(x) and np.isfinite(y):
                draw.ellipse([x - radius, y - radius, x + radius, y + radius],
                             outline=color, width=2)

    if gt_xy is not None:
        dots(gt_xy, (60, 200, 60))     # green: detected keypoints
    dots(proj_xy, (230, 70, 70))       # red: fitted-model projection
    img.save(out_path)
    return out_path


def run_cli(args) -> None:
    import os

    from posendf_tpu.cli import _load, _load_params

    cfg = _load(args)
    module, params = _load_params(cfg, args.ckpt)
    bm = BodyModel(bm_path=args.bm_path) if args.bm_path else BodyModel()

    kp_path = os.path.join(args.image_folder, "kpts.npz")
    with np.load(kp_path) as z:
        key = "0" if "0" in z else list(z.keys())[0]
        keypoints = np.asarray(z[key], np.float32)
    center = None
    img_path = os.path.join(args.image_folder, "img.jpg")
    if os.path.exists(img_path):
        try:
            from PIL import Image

            w, h = Image.open(img_path).size
            center = np.array([w / 2.0, h / 2.0], np.float32)
        except Exception:
            center = None

    fitter = ImageFitter(module, params, bm,
                         prior_form=getattr(args, "prior_form", "reference"))
    result, metrics = fitter.optimize(keypoints, center=center)
    for k, v in metrics.items():
        print(f"{k}: {v:0.8f}")
    if args.out:
        np.savez(args.out, **{k: np.asarray(v) for k, v in result.items()})
        print(f"wrote {args.out}")
    if getattr(args, "save_mesh", False) or getattr(args, "render", False):
        from posendf_tpu.experiments.render import export_pose_meshes

        out_dir = args.mesh_dir or args.image_folder
        export_pose_meshes(out_dir, bm, [("fit", result["pose_body"])],
                           save_mesh=args.save_mesh, render=args.render,
                           betas=result["betas"],
                           global_orient=result["global_orient"])
        # projected-keypoint overlay on the source image, when it exists
        # (reference renders the fit against the image, image_fitting.py:68,86)
        if os.path.exists(img_path):
            proj = project_result_keypoints(fitter, result, center=center)
            gt = np.asarray(keypoints, np.float32).reshape(-1, 25, 3)[..., :2]
            overlay = save_keypoint_overlay(
                img_path, os.path.join(out_dir, "overlay.png"), proj, gt)
            if overlay:
                print(f"wrote keypoint overlay -> {overlay}")
        print(f"wrote meshes/renders -> {out_dir}")
