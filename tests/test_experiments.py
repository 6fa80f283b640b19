"""Experiment-layer tests: annealed optimizer engine, motion denoising,
partial completion, interpolation, camera projection, image fitting, and
mesh export — hermetic via the synthetic body model and a small trained(ish)
field."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from posendf_tpu.experiments import (
    AnnealSpec,
    ImageFitter,
    MotionDenoiser,
    PartialCompleter,
    init_camera,
    interpolate,
    project_points,
    run_annealed_adam,
    save_meshes,
    render_meshes,
)
from posendf_tpu.models import PoseNDF
from posendf_tpu.smpl import BodyModel, synthetic_model


@pytest.fixture(scope="module")
def field():
    """A small softplus field (positive distances, nonzero gradients)."""
    module = PoseNDF(dfnet_dims=(64, 64), activation="softplus")
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    return module, params


@pytest.fixture(scope="module")
def body():
    return BodyModel(model=synthetic_model(num_vertices=80, seed=1))


def test_annealed_adam_minimizes_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0])

    def terms(x):
        return {"data": jnp.sum((x - target) ** 2)}

    x, hist = run_annealed_adam(
        terms, jnp.zeros(3), {"data": AnnealSpec(scale=1.0)},
        iterations=4, steps_per_iter=100, lr=0.05,
    )
    assert float(hist["data"][-1]) < 1e-2
    np.testing.assert_allclose(np.asarray(x), np.asarray(target), atol=0.2)


def test_annealed_adam_gating():
    """Terms with active_after must not influence early iterations."""
    history = []

    def terms(x):
        return {"a": jnp.sum(x ** 2), "b": jnp.sum((x - 10.0) ** 2)}

    x, hist = run_annealed_adam(
        terms, jnp.ones(2),
        {"a": AnnealSpec(scale=1.0),
         "b": AnnealSpec(scale=1e6, active_after=5)},  # never active (3 iters)
        iterations=3, steps_per_iter=50, lr=0.05,
    )
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=0.05)


def test_anneal_runtime_override_matches_static():
    """Runtime overrides carrying the SAME values as the static spec must
    reproduce the static solve bit-for-bit (one jaxpr, values as traced
    scalars), and different runtime values must actually change the solve."""
    from posendf_tpu.experiments.optim import make_annealed_solver

    target = jnp.asarray([1.0, -2.0, 3.0])

    def terms(x, aux):
        return {"data": jnp.sum((x - target) ** 2),
                "pull": jnp.sum(x ** 2)}

    specs = {"data": AnnealSpec(scale=1.0, anneal=-1.0),
             "pull": AnnealSpec(scale=0.5, anneal=+1.0, active_after=0)}
    solve = make_annealed_solver(terms, specs, iterations=3,
                                 steps_per_iter=20, lr=0.05)
    x_static, _ = solve(jnp.zeros(3), {})
    same = {"data": {"scale": jnp.float32(1.0), "anneal": jnp.float32(-1.0)},
            "pull": {"scale": jnp.float32(0.5), "anneal": jnp.float32(1.0),
                     "active_after": jnp.float32(0.0)}}
    x_same, _ = solve(jnp.zeros(3), {"anneal_runtime": same})
    np.testing.assert_array_equal(np.asarray(x_same), np.asarray(x_static))

    # zeroing 'pull' at runtime -> pure quadratic -> strictly closer to the
    # target than the two-term static solve (which 'pull' drags toward 0)
    off = {"pull": {"scale": jnp.float32(0.0)}}
    x_off, _ = solve(jnp.zeros(3), {"anneal_runtime": off})
    assert not np.allclose(np.asarray(x_off), np.asarray(x_static))
    err_off = float(np.sum((np.asarray(x_off) - np.asarray(target)) ** 2))
    err_static = float(np.sum((np.asarray(x_static) - np.asarray(target)) ** 2))
    assert err_off < err_static, (err_off, err_static)


def test_adaptive_runtime_endpoints():
    """s=1 must reproduce the reference schedule exactly; s=0 is the
    input-anchored endpoint; out-of-range s clips."""
    from posendf_tpu.experiments.denoise import (DENOISE_SPECS,
                                                 adaptive_runtime)

    hi = adaptive_runtime(1.0)
    assert float(hi["pose_pr"]["scale"]) == pytest.approx(
        DENOISE_SPECS["pose_pr"].scale)
    assert float(hi["temp"]["scale"]) == pytest.approx(
        DENOISE_SPECS["temp"].scale)
    assert float(hi["data"]["anneal"]) == pytest.approx(
        DENOISE_SPECS["data"].anneal)
    assert float(hi["data"]["active_after"]) == pytest.approx(
        DENOISE_SPECS["data"].active_after)

    lo = adaptive_runtime(0.0)
    assert float(lo["pose_pr"]["scale"]) == pytest.approx(1e4)
    assert float(lo["temp"]["scale"]) == pytest.approx(0.1)
    assert float(lo["data"]["anneal"]) == pytest.approx(0.0)
    assert float(lo["data"]["active_after"]) == pytest.approx(-1.0)

    # clipping + the ablation's prior_gain
    assert float(adaptive_runtime(7.3)["temp"]["scale"]) == pytest.approx(10.0)
    assert float(adaptive_runtime(-2.0)["temp"]["scale"]) == pytest.approx(0.1)
    assert float(adaptive_runtime(0.5, prior_gain=0.0)["pose_pr"]["scale"]) == 0.0


def test_adaptive_denoiser_mechanism(field, body):
    """specs='adaptive' runs end to end, reports the noise estimate, and the
    estimate is a valid level in [0, 1]."""
    module, params = field
    rng = np.random.default_rng(3)
    noisy = jnp.asarray(rng.normal(scale=0.3, size=(4, 69)).astype(np.float32))
    den = MotionDenoiser(module, params, body, specs="adaptive")
    final_pose, metrics = den.optimize(noisy, iterations=2, steps_per_iter=5)
    assert final_pose.shape == (4, 69)
    assert 0.0 <= metrics["noise_level_s"] <= 1.0
    for k in ("noise_d_input", "noise_d_floor", "noise_d_probe",
              "v2v_vs_input_cm", "final_pose_pr"):
        assert np.isfinite(metrics[k]), (k, metrics)


def test_image_fit_tracks_observations_with_prior_on(field, body):
    """Regression guard for the zero-pose singularity: the model's
    joint-axis normalize is directionally singular at exact-zero rotations
    (prior gradient ~2e10 there on trained fields), and a stage-2 init AT
    that point poisoned Adam's second moment so badly the fit returned the
    SAME pose whatever the keypoints. With the symmetry-breaking init,
    different observations must give different fits."""
    module, params = field
    rng = np.random.default_rng(11)
    fitter = ImageFitter(module, params, body, prior_form="self")
    kp_a = np.ones((1, 25, 3), np.float32)
    kp_a[..., :2] = 200.0 * rng.standard_normal((1, 25, 2))
    kp_b = np.ones((1, 25, 3), np.float32)
    kp_b[..., :2] = 200.0 * rng.standard_normal((1, 25, 2))
    res_a, _ = fitter.optimize(kp_a, iterations=2, steps_per_iter=10)
    res_b, _ = fitter.optimize(kp_b, iterations=2, steps_per_iter=10)
    pa, pb = np.asarray(res_a["pose_body"]), np.asarray(res_b["pose_body"])
    assert np.all(np.isfinite(pa)) and np.all(np.isfinite(pb))
    assert not np.allclose(pa, pb, atol=1e-3), "fit ignores observations"


def test_motion_denoise_runs_and_improves_prior(field, body):
    module, params = field
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.normal(scale=0.3, size=(6, 69)).astype(np.float32))
    denoiser = MotionDenoiser(module, params, body)
    final_pose, metrics = denoiser.optimize(noisy, iterations=2, steps_per_iter=5)
    assert final_pose.shape == (6, 69)
    assert np.isfinite(metrics["v2v_vs_input_cm"])
    assert np.isfinite(metrics["final_pose_pr"])


def test_motion_denoise_v2v_vs_gt(field, body):
    module, params = field
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.normal(scale=0.2, size=(4, 69)).astype(np.float32))
    noisy = gt + 0.1 * jnp.asarray(rng.normal(size=(4, 69)).astype(np.float32))
    denoiser = MotionDenoiser(module, params, body)
    _, metrics = denoiser.optimize(noisy, gt, iterations=2, steps_per_iter=5)
    assert "v2v_cm" in metrics and np.isfinite(metrics["v2v_cm"])


def test_partial_completer(field, body):
    module, params = field
    rng = np.random.default_rng(2)
    pose = jnp.asarray(rng.normal(scale=0.2, size=(5, 69)).astype(np.float32))
    completer = PartialCompleter(module, params, body)
    final_pose, metrics = completer.optimize(pose, iterations=2, steps_per_iter=3)
    assert final_pose.shape == (5, 69)


def test_interpolate_path_properties(field):
    module, params = field
    key = jax.random.key(0)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (21, 4))
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = jax.random.normal(kb, (21, 4))
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    path, dist = interpolate(module, params, a, b, num_steps=7, projection_steps=3)
    assert path.shape == (7, 21, 4)
    assert dist.shape == (7,)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(path), axis=-1), 1.0, atol=1e-4)


def test_camera_projection_geometry():
    cam = init_camera(1)
    cam["translation"] = cam["translation"].at[0, 2].set(10.0)
    pts = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    img = project_points(cam, pts, focal_length=5000.0)
    np.testing.assert_allclose(np.asarray(img[0, 0]), [0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(img[0, 1]), [500.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(img[0, 2]), [0.0, 500.0], atol=1e-3)
    # center offset shifts pixels
    img_c = project_points(cam, pts, focal_length=5000.0,
                           center=jnp.asarray([[128.0, 128.0]]))
    np.testing.assert_allclose(np.asarray(img_c[0, 0]), [128.0, 128.0], atol=1e-4)


def test_image_fitter_end_to_end(field, body):
    """Project a known body through a known camera, fit from zeros: stage 1
    must drive the torso reprojection error down."""
    module, params = field
    rng = np.random.default_rng(3)
    gt_pose = jnp.asarray(rng.normal(scale=0.15, size=(1, 69)).astype(np.float32))
    out = body(pose_body=gt_pose)
    cam = init_camera(1)
    cam["translation"] = cam["translation"].at[0, 2].set(10.0)
    from posendf_tpu.experiments.fit_image import SMPL_TO_OPENPOSE

    gather = np.where(SMPL_TO_OPENPOSE >= 0, SMPL_TO_OPENPOSE, 0)
    kp_xy = np.asarray(project_points(cam, out.Jtr[:, gather, :], 5000.0))[0]
    conf = (SMPL_TO_OPENPOSE >= 0).astype(np.float32)
    keypoints = np.concatenate([kp_xy, conf[:, None]], axis=1)  # (25, 3)

    fitter = ImageFitter(module, params, body)
    result, metrics = fitter.optimize(keypoints, iterations=2, steps_per_iter=10)
    assert result["pose_body"].shape == (1, 69)
    assert np.isfinite(metrics["stage2_final_data"])
    assert metrics["stage1_final_data"] < 1e7  # torso error decreased from init

    # second image of the same shape reuses the cached stage solvers (no
    # per-image recompilation) and still produces a valid result
    assert len(fitter._solvers) == 1
    solvers = fitter._solvers[(1, 2, 10)]
    keypoints2 = keypoints.copy()
    keypoints2[:, :2] += rng.normal(scale=2.0, size=(25, 2))
    result2, metrics2 = fitter.optimize(keypoints2, iterations=2, steps_per_iter=10)
    assert fitter._solvers[(1, 2, 10)] is solvers
    assert np.isfinite(metrics2["stage2_final_data"])
    # different data must give a different fit (aux actually flows through)
    assert not np.allclose(np.asarray(result2["pose_body"]),
                           np.asarray(result["pose_body"]))


def test_image_fitter_recovers_camera_rotation(field, body):
    """Stage 1 optimizes camera ROTATION (reference surface:
    exp_utils.py:68-143 registers it as an nn.Parameter): keypoints rendered
    through a rotated camera must fit to low reprojection error with
    rotation free, at least as well as the identity-locked camera (global
    orient gives the locked camera partial gauge compensation, so the gap
    is real but modest), and the solved rotation must leave the identity."""
    from posendf_tpu.experiments.fit_image import SMPL_TO_OPENPOSE
    from posendf_tpu.quat import axis_angle_to_matrix

    module, params = field
    out = body(pose_body=jnp.zeros((1, 69)))
    # ground-truth camera: translation + a ~17 degree rotation
    rot_aa = jnp.asarray([[0.2, -0.15, 0.1]])
    cam = {"rotation": axis_angle_to_matrix(rot_aa),
           "translation": jnp.asarray([[0.0, 0.0, 10.0]])}
    gather = np.where(SMPL_TO_OPENPOSE >= 0, SMPL_TO_OPENPOSE, 0)
    kp_xy = np.asarray(project_points(cam, out.Jtr[:, gather, :], 5000.0))[0]
    conf = (SMPL_TO_OPENPOSE >= 0).astype(np.float32)
    keypoints = np.concatenate([kp_xy, conf[:, None]], axis=1)

    free = ImageFitter(module, params, body)
    result, m_free = free.optimize(keypoints, iterations=4, steps_per_iter=25)
    fixed = ImageFitter(module, params, body, optimize_camera_rotation=False)
    _, m_fixed = fixed.optimize(keypoints, iterations=4, steps_per_iter=25)

    assert result["camera_rotation"].shape == (1, 3, 3)
    # the free camera must actually have moved off the identity
    assert not np.allclose(np.asarray(result["camera_rotation"]),
                           np.eye(3), atol=1e-3)
    assert m_free["stage1_final_data"] <= m_fixed["stage1_final_data"]
    assert m_free["stage1_final_data"] < 0.1  # px^2 over 4 torso joints


def test_openpose_mapping_tables_consistent():
    """The 45-joint landmark mapping agrees with the 24-joint one on every
    skeleton-mapped BODY_25 slot (except the nose, which upgrades from the
    head joint to the nose landmark) and covers all 25 slots."""
    from posendf_tpu.experiments.fit_image import (
        SMPL_TO_OPENPOSE, SMPLX45_TO_OPENPOSE)

    assert SMPLX45_TO_OPENPOSE.shape == (25,)
    assert (SMPLX45_TO_OPENPOSE >= 0).all()
    assert SMPLX45_TO_OPENPOSE.max() < 45
    for op_idx, smpl_j in enumerate(SMPL_TO_OPENPOSE):
        if smpl_j >= 0 and op_idx != 0:
            assert SMPLX45_TO_OPENPOSE[op_idx] == smpl_j
    assert SMPLX45_TO_OPENPOSE[0] == 24  # nose landmark
    # eyes/ears/feet land in the landmark block
    assert (SMPLX45_TO_OPENPOSE[15:] >= 24).all()


def test_mesh_export_and_render(tmp_path, body):
    out = body(pose_body=jnp.zeros((2, 69)))
    paths = save_meshes(str(tmp_path), np.asarray(out.vertices), out.faces, prefix="t")
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    with open(paths[0]) as f:
        head = f.readline()
    assert head.startswith("v ")
    imgs = render_meshes(str(tmp_path), np.asarray(out.vertices[:1]), out.faces,
                         prefix="t", image_size=64)
    assert len(imgs) == 1 and os.path.exists(imgs[0])


def test_phong_render_is_lit_rgb(body):
    """The default shading is the reference's Phong setup
    (exp_utils.py:43,51-55 — point light, white material): RGB output,
    smoothly varying intensity (interpolated vertex normals), and a flat
    grayscale mode kept for diagnostics."""
    from posendf_tpu.experiments.render import render_mesh

    out = body(pose_body=jnp.zeros((1, 69)))
    v = np.asarray(out.vertices[0])
    rgb = render_mesh(v, out.faces, image_size=64)
    assert rgb.shape == (64, 64, 3)
    lit = rgb[rgb.sum(-1) > 0]
    assert len(lit) > 20  # the mesh covers some pixels
    # ambient floor 0.5, diffuse+specular on top -> values span a range
    assert float(lit.min()) >= 0.45 and float(lit.max()) <= 1.0
    assert float(lit.std()) > 0.01, "no shading variation"
    gray = render_mesh(v, out.faces, image_size=64, shading="flat")
    assert gray.shape == (64, 64)
    with pytest.raises(ValueError, match="shading"):
        render_mesh(v, out.faces, shading="wireframe")


def test_motion_denoise_single_frame_is_finite(field, body):
    """One-frame input has no temporal stencil; the empty-mean NaN must not
    poison the solve."""
    module, params = field
    rng = np.random.default_rng(7)
    noisy = jnp.asarray(rng.normal(scale=0.2, size=(1, 63)).astype(np.float32))
    denoiser = MotionDenoiser(module, params, body)
    out, metrics = denoiser.optimize(noisy, iterations=1, steps_per_iter=3)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.isfinite(metrics["final_pose_pr"])
    assert metrics["final_temp"] == 0.0


def test_motion_denoise_rejects_mismatched_gt(field, body):
    module, params = field
    rng = np.random.default_rng(8)
    noisy = jnp.asarray(rng.normal(scale=0.2, size=(4, 63)).astype(np.float32))
    gt = jnp.asarray(rng.normal(scale=0.2, size=(6, 63)).astype(np.float32))
    denoiser = MotionDenoiser(module, params, body)
    with pytest.raises(ValueError, match="frames"):
        denoiser.optimize(noisy, gt, iterations=1, steps_per_iter=1)


def test_synthesize_grid_single_family_and_smooth(tmp_path):
    """The synthetic benchmark grid must (a) draw every gt sequence from ONE
    manifold family reproducible from family_seed (so a checkpoint trained
    on write_synthetic_dataset(seed=S) is evaluated on ITS manifold), and
    (b) be temporally smooth (the property the temporal loss relies on)."""
    from posendf_tpu.data.synthetic import manifold_family
    from posendf_tpu.experiments.denoise_benchmark import synthesize_grid
    from posendf_tpu.quat import axis_angle_to_quaternion

    root = synthesize_grid(str(tmp_path / "g"), grid=((0.05, 60), (0.1, 60)),
                           seqs_per_level=2, seed=3, family_seed=11)
    fam = manifold_family(np.random.default_rng(11))
    axes = fam[0]
    for level in sorted(os.listdir(root)):
        for seq in sorted(os.listdir(os.path.join(root, level))):
            with np.load(os.path.join(root, level, seq, "gt_results.npz")) as z:
                gt = z["pose_body"]
            quats = np.asarray(axis_angle_to_quaternion(
                jnp.asarray(gt.reshape(len(gt), 21, 3))))
            # (a) every joint's rotation axis matches the family's axis
            # (axis-angle direction = quat xyz direction, up to sign)
            xyz = quats[..., 1:]
            norm = np.linalg.norm(xyz, axis=-1, keepdims=True)
            mask = norm[..., 0] > 1e-4
            cos = np.abs(np.sum(xyz / np.where(norm > 1e-8, norm, 1.0)
                                * axes[None], axis=-1))
            assert np.all(cos[mask] > 0.999)
            # (b) adjacent frames are close (smooth latent trajectories);
            # independent per-frame latents would give dots well below 0.9
            step = np.abs(np.sum(quats[1:] * quats[:-1], axis=-1))
            assert np.min(step) > 0.98


def test_motion_denoiser_named_specs_and_bad_string(field, body):
    """Regression: spec-name strings beyond 'adaptive' must resolve to the
    matching dicts (the CLI flag values), and an unknown string must fail
    at construction — not as a TypeError iterating the string's characters
    inside the first optimize()."""
    from posendf_tpu.experiments.denoise import (ADAPTIVE_SPECS,
                                                 BALANCED_SPECS,
                                                 DENOISE_SPECS)

    module, params = field
    assert MotionDenoiser(module, params, body,
                          specs="balanced").specs == BALANCED_SPECS
    assert MotionDenoiser(module, params, body,
                          specs="reference").specs == DENOISE_SPECS
    ad = MotionDenoiser(module, params, body, specs="adaptive")
    assert ad.adaptive and ad.specs == ADAPTIVE_SPECS
    assert not MotionDenoiser(module, params, body,
                              specs="balanced").adaptive
    with pytest.raises(ValueError, match="unknown specs name"):
        MotionDenoiser(module, params, body, specs="blanced")


# ---------------------------------------------------------------------------
# partial observation: occlusion-aware masks, inpaint mode, retrieval engine
# ---------------------------------------------------------------------------

def test_observation_mask_tree_and_carriers():
    """The mask zeroes an occluded joint's skeleton node AND all kinematic
    descendants (an unobserved shoulder invalidates every downstream joint
    position), leaves the rest observed; landmarks follow their carriers on
    the 45-row real layout."""
    from posendf_tpu.experiments.partial import observation_mask
    from posendf_tpu.kinematics import SMPL_FULL_PARENTS

    body = BodyModel(model=synthetic_model(num_vertices=80, seed=1))
    # body joint 15 (l_shoulder) = skeleton 16; descendants 18, 20, 22
    mask = observation_mask(body, [15])
    assert mask.shape == (24,)
    masked = {i for i in range(24) if mask[i] == 0.0}
    expect = set()
    for k in range(24):
        a = k
        while a != -1:
            if a == 16:
                expect.add(k)
                break
            a = SMPL_FULL_PARENTS[a]
    assert masked == expect == {16, 18, 20, 22}
    with pytest.raises(ValueError, match="body-pose joint indices"):
        observation_mask(body, [23])


def test_dof_mask():
    from posendf_tpu.experiments.partial import dof_mask

    m = dof_mask([0, 20])
    assert m.shape == (69,)
    assert m[:3].tolist() == [1, 1, 1] and m[60:63].tolist() == [1, 1, 1]
    assert m.sum() == 6.0
    with pytest.raises(ValueError, match="out of range"):
        dof_mask([23])


def test_inpaint_mode_freezes_observed_dofs(field, body):
    """mode='inpaint': observed dofs return BIT-EXACT, occluded dofs move."""
    from posendf_tpu.experiments.partial import INPAINT_SPECS

    module, params = field
    rng = np.random.default_rng(5)
    pose = rng.normal(scale=0.2, size=(4, 69)).astype(np.float32)
    occ = [12, 15, 17, 19]
    comp = PartialCompleter(module, params, body, specs=INPAINT_SPECS)
    out, _ = comp.optimize(jnp.asarray(pose), iterations=2, steps_per_iter=4,
                           occluded_joints=occ, mode="inpaint")
    out = np.asarray(out)
    occ_dofs = sorted(d for j in occ for d in range(3 * j, 3 * j + 3))
    vis_dofs = [d for d in range(69) if d not in occ_dofs]
    np.testing.assert_array_equal(out[:, vis_dofs], pose[:, vis_dofs])
    assert not np.allclose(out[:, occ_dofs], pose[:, occ_dofs])
    with pytest.raises(ValueError, match="requires occluded_joints"):
        comp.optimize(jnp.asarray(pose), mode="inpaint")
    with pytest.raises(ValueError, match="'anchor' or 'inpaint'"):
        comp.optimize(jnp.asarray(pose), mode="retrieval",
                      occluded_joints=occ)


def test_data_joint_mask_changes_solve_and_validates(field, body):
    module, params = field
    rng = np.random.default_rng(6)
    pose = jnp.asarray(rng.normal(scale=0.2, size=(3, 69)).astype(np.float32))
    den = MotionDenoiser(module, params, body)
    n_rows = body(pose_body=pose).Jtr.shape[1]
    mask = np.ones(n_rows, np.float32)
    mask[5:] = 0.0
    out_masked, _ = den.optimize(pose, iterations=2, steps_per_iter=4,
                                 data_joint_mask=mask)
    out_plain, _ = den.optimize(pose, iterations=2, steps_per_iter=4)
    assert not np.allclose(np.asarray(out_masked), np.asarray(out_plain))
    with pytest.raises(ValueError, match="data_joint_mask"):
        den.optimize(pose, data_joint_mask=np.ones(n_rows + 1, np.float32))


def test_complete_by_retrieval_reconstructs_limb():
    """Visible-weighted kNN splice: corrupted joints recovered from the
    corpus (error drops vs input), observed joints bit-exact. The engine
    the partial closed loop measures best for structured occlusions
    (docs/quality/partial_closed_loop.json)."""
    from posendf_tpu.data.synthetic import (manifold_family,
                                            synthetic_motion_sequence)
    from posendf_tpu.data.synthetic import synthetic_manifold_poses
    from posendf_tpu.experiments.partial import complete_by_retrieval
    from posendf_tpu.quat import axis_angle_to_quaternion

    rng = np.random.default_rng(7)
    family = manifold_family(rng, 21, latents=2)
    corpus = synthetic_manifold_poses(rng, 4096, family=family)
    gt_q = synthetic_motion_sequence(rng, 8, family=family)
    occ = [12, 15, 17, 19]
    bad = np.asarray(gt_q).copy()
    noise = rng.normal(scale=0.5, size=(8, len(occ), 4)).astype(np.float32)
    bad[:, occ] = bad[:, occ] + noise
    bad[:, occ] /= np.linalg.norm(bad[:, occ], axis=-1, keepdims=True)

    done = complete_by_retrieval(corpus, bad, occ, k=5)
    vis = [j for j in range(21) if j not in occ]
    np.testing.assert_array_equal(done[:, vis], bad[:, vis])

    def occ_err(q):
        dots = np.abs(np.sum(q[:, occ] * np.asarray(gt_q)[:, occ], -1))
        return float(np.mean(1.0 - dots))

    assert occ_err(done) < 0.5 * occ_err(bad)
    with pytest.raises(ValueError, match="proper nonempty subset"):
        complete_by_retrieval(corpus, bad, list(range(21)))
    with pytest.raises(ValueError, match="proper nonempty subset"):
        complete_by_retrieval(corpus, bad, [])


def test_partial_optimize_guards_and_param_mask_validation(field, body):
    """Regression: pre-r5 positional iterations now raises a migration
    TypeError; param_mask accepts (B, 69) and rejects unbroadcastable
    shapes with a clear error; even retrieval windows are rejected."""
    from posendf_tpu.experiments.partial import complete_by_retrieval

    module, params = field
    rng = np.random.default_rng(8)
    pose = jnp.asarray(rng.normal(scale=0.2, size=(3, 69)).astype(np.float32))
    comp = PartialCompleter(module, params, body)
    with pytest.raises(TypeError, match="gt_pose_body"):
        comp.optimize(pose, 5, 10)

    den = MotionDenoiser(module, params, body)
    full_mask = np.ones((3, 69), np.float32)
    full_mask[1:] = 0.0  # freeze all but frame 0 — per-frame masks work
    out, _ = den.optimize(pose, iterations=1, steps_per_iter=3,
                          param_mask=full_mask)
    np.testing.assert_array_equal(np.asarray(out)[1:], np.asarray(pose)[1:])
    assert not np.allclose(np.asarray(out)[0], np.asarray(pose)[0])
    with pytest.raises(ValueError, match="param_mask"):
        den.optimize(pose, param_mask=np.ones((2, 69), np.float32))

    corpus = np.array(jax.random.normal(jax.random.key(0), (64, 21, 4)))
    corpus /= np.linalg.norm(corpus, axis=-1, keepdims=True)
    with pytest.raises(ValueError, match="must be odd"):
        complete_by_retrieval(corpus, corpus[:3], [1, 2], temporal_window=4)


def test_complete_by_retrieval_exact_recovery_invariant():
    """When the corpus CONTAINS the ground-truth poses, k=1 retrieval on
    clean visible joints must recover the occluded joints exactly (up to
    the quaternion double cover) — the engine's correctness invariant,
    independent of corpus density."""
    from posendf_tpu.data.synthetic import (manifold_family,
                                            synthetic_manifold_poses)
    from posendf_tpu.experiments.partial import complete_by_retrieval

    rng = np.random.default_rng(13)
    family = manifold_family(rng, 21, latents=2)
    corpus = synthetic_manifold_poses(rng, 512, family=family)
    gt = corpus[64:72]                      # the clip IS in the corpus
    occ = [13, 16, 18, 20]
    bad = gt.copy()
    bad[:, occ] = rng.normal(size=(8, len(occ), 4)).astype(np.float32)
    bad[:, occ] /= np.linalg.norm(bad[:, occ], axis=-1, keepdims=True)

    done = complete_by_retrieval(corpus, bad, occ, k=1, temporal_window=1)
    dots = np.abs(np.sum(done[:, occ] * gt[:, occ], -1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_optimize_many_matches_serial(field, body):
    """The batched vmapped solve must reproduce the serial per-clip solves
    (clips are independent; vmap only changes the batching), including the
    per-clip adaptive runtime scalars."""
    module, params = field
    rng = np.random.default_rng(17)
    clips = rng.normal(scale=0.25, size=(3, 5, 69)).astype(np.float32)
    gt = rng.normal(scale=0.2, size=(3, 5, 69)).astype(np.float32)

    for specs in (None, "adaptive"):
        den = MotionDenoiser(module, params, body, specs=specs)
        many_pose, many_m = den.optimize_many(
            jnp.asarray(clips), jnp.asarray(gt),
            iterations=2, steps_per_iter=4)
        assert many_pose.shape == (3, 5, 69)
        for c in range(3):
            pose_c, m_c = den.optimize(
                jnp.asarray(clips[c]), jnp.asarray(gt[c]),
                iterations=2, steps_per_iter=4)
            np.testing.assert_allclose(np.asarray(many_pose[c]),
                                       np.asarray(pose_c), atol=2e-5)
            for k in ("v2v_cm", "v2v_input_cm", "final_pose_pr"):
                np.testing.assert_allclose(many_m[k][c], m_c[k], atol=1e-4,
                                           rtol=1e-3)
            if specs == "adaptive":
                np.testing.assert_allclose(many_m["noise_level_s"][c],
                                           m_c["noise_level_s"], atol=1e-6)

    with pytest.raises(ValueError, match="clips, frames, dofs"):
        MotionDenoiser(module, params, body).optimize_many(
            jnp.asarray(clips[0]))


def test_run_sweep_batched_matches_serial(tmp_path, field, body):
    """The sweep's batched (vmapped optimize_many) path must score every
    sequence like the serial path — same per-level v2v arrays."""
    from posendf_tpu.experiments.denoise_benchmark import (run_sweep,
                                                           synthesize_grid)

    module, params = field
    root = synthesize_grid(str(tmp_path / "g"), grid=((0.1, 6),),
                           seqs_per_level=3, seed=4, family_seed=11)
    den = MotionDenoiser(module, params, body)
    serial = run_sweep(den, root, iterations=1, steps_per_iter=3,
                       batch_clips=False)
    batched = run_sweep(den, root, iterations=1, steps_per_iter=3,
                        batch_clips=True)
    assert set(serial) == set(batched)
    for level in serial:
        np.testing.assert_allclose(batched[level], serial[level],
                                   atol=1e-4, rtol=1e-4)


def test_optimize_many_shared_betas_and_order_stability(tmp_path, field, body):
    """Regressions from review: (a) a shared (num_betas,) betas vector must
    work in the batched solve (BodyModel returns betas as passed, so it
    needs pre-broadcast); (b) run_sweep's per-level score arrays keep the
    sorted-sequence order even when same-shape grouping batches clips out
    of order (mixed-length level)."""
    from posendf_tpu.experiments.denoise_benchmark import run_sweep

    module, params = field
    rng = np.random.default_rng(19)
    clips = rng.normal(scale=0.2, size=(2, 4, 69)).astype(np.float32)
    den = MotionDenoiser(module, params, body)
    out, m = den.optimize_many(jnp.asarray(clips),
                               betas=jnp.zeros(body.num_betas),
                               iterations=1, steps_per_iter=2)
    assert out.shape == (2, 4, 69)
    with pytest.raises(ValueError, match="betas"):
        den.optimize_many(jnp.asarray(clips),
                          betas=jnp.zeros((3, body.num_betas)),
                          iterations=1, steps_per_iter=2)

    level = tmp_path / "grid" / "mixed"
    for i, T in enumerate((6, 4, 6)):   # seq01 (len 4) sorts between the 6s
        d = level / f"seq{i:02d}"
        d.mkdir(parents=True)
        gt = rng.normal(scale=0.2, size=(T, 63)).astype(np.float32)
        np.savez(d / "gt_results.npz", pose_body=gt)
        np.savez(d / "observations.npz",
                 pose_body=gt + 0.1 * rng.standard_normal(gt.shape
                                                          ).astype(np.float32))
    serial = run_sweep(den, str(tmp_path / "grid"), iterations=1,
                       steps_per_iter=2, batch_clips=False)
    batched = run_sweep(den, str(tmp_path / "grid"), iterations=1,
                        steps_per_iter=2, batch_clips=True)
    # element-by-element (NOT as sets): positional order must match
    np.testing.assert_allclose(batched["mixed"], serial["mixed"],
                               atol=1e-4, rtol=1e-4)
    assert len(serial["mixed"]) == 3
