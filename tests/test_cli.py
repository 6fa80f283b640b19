"""CLI smoke tests: every subcommand drives end-to-end on tiny settings."""

import os

import numpy as np
import pytest

from posendf_tpu.cli import main
from posendf_tpu.data.synthetic import write_synthetic_dataset

CFG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "configs", "amass.yaml")


def test_generate(tmp_path, capsys):
    out = str(tmp_path / "poses.npz")
    main(["generate", "-c", CFG, "--num-poses", "3", "--steps", "2", "--out", out])
    with np.load(out) as z:
        assert z["pose"].shape == (3, 21, 4)
        assert z["dist_history"].shape == (2, 3)
    assert "projected 3 poses" in capsys.readouterr().out


def test_generate_with_mesh_output(tmp_path):
    mesh_dir = str(tmp_path / "meshes")
    main(["generate", "-c", CFG, "--num-poses", "2", "--steps", "1",
          "--save-mesh", "--mesh-dir", mesh_dir])
    objs = os.listdir(os.path.join(mesh_dir, "meshes"))
    assert len(objs) == 4  # init + out per pose


def test_interpolate(tmp_path, capsys):
    out = str(tmp_path / "path.npz")
    main(["interpolate", "-c", CFG, "--num-steps", "4", "--out", out])
    with np.load(out) as z:
        assert z["path"].shape == (4, 21, 4)
    assert "interpolated 4 steps" in capsys.readouterr().out


def test_denoise(tmp_path, capsys):
    rng = np.random.default_rng(0)
    motion = str(tmp_path / "motion.npz")
    np.savez(motion, pose_body=rng.normal(scale=0.2, size=(4, 63)).astype(np.float32))
    out = str(tmp_path / "denoised.npz")
    main(["denoise", "-c", CFG, "--motion-data", motion, "--out", out])
    with np.load(out) as z:
        assert z["pose_body"].shape == (4, 69)
    assert "v2v_vs_input_cm" in capsys.readouterr().out


def test_denoise_balanced_specs(tmp_path, capsys):
    """--specs balanced selects the library's gentler schedule
    (BALANCED_SPECS; measured decomposition in docs/ARCHITECTURE.md §7)."""
    from posendf_tpu.experiments.denoise import BALANCED_SPECS, DENOISE_SPECS

    # the alternative schedule really is different where it matters
    assert BALANCED_SPECS["pose_pr"].scale < DENOISE_SPECS["pose_pr"].scale
    assert BALANCED_SPECS["temp"].scale < DENOISE_SPECS["temp"].scale
    rng = np.random.default_rng(3)
    motion = str(tmp_path / "motion.npz")
    np.savez(motion,
             pose_body=rng.normal(scale=0.05, size=(2, 63)).astype(np.float32))
    main(["denoise", "-c", CFG, "--motion-data", motion,
          "--specs", "balanced"])
    assert "v2v_vs_input_cm" in capsys.readouterr().out


def test_partial(tmp_path, capsys):
    rng = np.random.default_rng(1)
    motion = str(tmp_path / "motion.npz")
    np.savez(motion, pose_body=rng.normal(scale=0.2, size=(8, 63)).astype(np.float32))
    main(["partial", "-c", CFG, "--motion-data", motion, "--max-frames", "4"])
    assert "final_pose_pr" in capsys.readouterr().out


def test_fit_image(tmp_path, capsys):
    rng = np.random.default_rng(2)
    folder = tmp_path / "img"
    folder.mkdir()
    kpts = np.zeros((25, 3), np.float32)
    kpts[:15, :2] = rng.normal(scale=100, size=(15, 2))
    kpts[:15, 2] = 1.0
    np.savez(folder / "kpts.npz", **{"0": kpts})
    out = str(tmp_path / "fit.npz")
    main(["fit-image", "-c", CFG, "--image-folder", str(folder), "--out", out])
    with np.load(out) as z:
        assert z["pose_body"].shape == (1, 69)
    assert "stage2_final_data" in capsys.readouterr().out


def test_prepare_data_and_train(tmp_path, capsys):
    # raw AMASS-shaped fixture
    rng = np.random.default_rng(3)
    raw = tmp_path / "raw"
    for subset in ("ACCAD",):
        d = raw / subset / "s1"
        d.mkdir(parents=True)
        np.savez(d / "clip_poses.npz",
                 poses=rng.normal(scale=0.3, size=(80, 156)).astype(np.float32))
    out_dir = tmp_path / "prep"
    main(["prepare-data", "-c", CFG, "--amass-raw", str(raw),
          "--out-dir", str(out_dir), "--num-samples", "10", "--runs", "2",
          "--k", "3", "--k-candidates", "0", "--split", "ACCAD"])
    captured = capsys.readouterr().out
    assert "stage 1" in captured and "stage 3" in captured
    labeled = out_dir / "labeled" / "ACCAD"
    assert len(os.listdir(labeled)) == 1


def test_denoise_bench_synthesized(tmp_path, capsys):
    root = str(tmp_path / "grid")
    main(["denoise-bench", "-c", CFG, "--data-root", root, "--synthesize",
          "--seqs-per-level", "1", "--iterations", "1", "--steps-per-iter", "2",
          "--out", str(tmp_path / "table.npz")])
    out = capsys.readouterr().out
    assert "mean v2v" in out
    with np.load(tmp_path / "table.npz") as z:
        assert len(z.files) == 4  # the four grid levels


def test_cli_version(capsys):
    from posendf_tpu import __version__
    from posendf_tpu.cli import build_parser

    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--version"])
    assert e.value.code == 0
    assert __version__ in capsys.readouterr().out


def test_denoise_with_mesh_output(tmp_path):
    rng = np.random.default_rng(4)
    motion = str(tmp_path / "motion.npz")
    np.savez(motion, pose_body=rng.normal(scale=0.2, size=(3, 63)).astype(np.float32))
    mesh_dir = str(tmp_path / "dn")
    main(["denoise", "-c", CFG, "--motion-data", motion,
          "--save-mesh", "--render", "--mesh-dir", mesh_dir])
    objs = os.listdir(os.path.join(mesh_dir, "meshes"))
    assert len(objs) == 6  # init + out per frame
    assert any(o.startswith("init_") for o in objs)
    assert any(o.startswith("out_") for o in objs)
    renders = os.listdir(os.path.join(mesh_dir, "render"))
    assert len(renders) == 6


def test_partial_with_mesh_output(tmp_path):
    rng = np.random.default_rng(5)
    motion = str(tmp_path / "motion.npz")
    np.savez(motion, pose_body=rng.normal(scale=0.2, size=(4, 63)).astype(np.float32))
    mesh_dir = str(tmp_path / "po")
    main(["partial", "-c", CFG, "--motion-data", motion, "--max-frames", "2",
          "--save-mesh", "--mesh-dir", mesh_dir])
    objs = os.listdir(os.path.join(mesh_dir, "meshes"))
    assert len(objs) == 4  # init + out for 2 frames


def test_fit_image_with_mesh_and_overlay(tmp_path):
    PIL = pytest.importorskip("PIL")  # noqa: F841 — overlay needs PIL
    from PIL import Image

    rng = np.random.default_rng(6)
    folder = tmp_path / "img"
    folder.mkdir()
    kpts = np.zeros((25, 3), np.float32)
    kpts[:15, :2] = rng.normal(scale=100, size=(15, 2))
    kpts[:15, 2] = 1.0
    np.savez(folder / "kpts.npz", **{"0": kpts})
    Image.new("RGB", (64, 48)).save(folder / "img.jpg")
    mesh_dir = str(tmp_path / "fit_out")
    main(["fit-image", "-c", CFG, "--image-folder", str(folder),
          "--save-mesh", "--mesh-dir", mesh_dir])
    objs = os.listdir(os.path.join(mesh_dir, "meshes"))
    assert objs == ["fit_0000.obj"]
    assert os.path.exists(os.path.join(mesh_dir, "overlay.png"))


def test_train_yaml_patience_fails_loud_without_vald(tmp_path):
    """Early-stop patience set in the CONFIG FILE (not the CLI flag) must
    fail just as loud when the vald split is missing — degrading the erosion
    guardrail to an unvalidated full-length run would be a silent no-op."""
    from posendf_tpu.config import PoseNDFConfig, save_config

    labeled, amass = write_synthetic_dataset(str(tmp_path))
    cfg = PoseNDFConfig()
    cfg.data.data_dir = labeled
    cfg.data.amass_dir = amass
    cfg.experiment.root_dir = str(tmp_path / "exp")
    cfg.train.batch_size = 2
    cfg.train.num_pts = 16
    cfg.train.max_epoch = 1
    cfg.train.early_stop_patience = 3  # via YAML, no CLI flag
    path = str(tmp_path / "cfg.yaml")
    save_config(cfg, path)
    with pytest.raises(SystemExit, match="vald"):
        main(["train", "-c", path])


def test_partial_occlusion_modes(tmp_path, capsys):
    """The r5 occlusion-aware partial surface: --occluded-joints anchor
    mode, inpaint mode, and retrieval mode against a corpus file."""
    rng = np.random.default_rng(4)
    motion = str(tmp_path / "motion.npz")
    np.savez(motion,
             pose_body=rng.normal(scale=0.2, size=(6, 63)).astype(np.float32))
    main(["partial", "-c", CFG, "--motion-data", motion, "--max-frames", "4",
          "--occluded-joints", "15", "17"])
    assert "final_pose_pr" in capsys.readouterr().out

    main(["partial", "-c", CFG, "--motion-data", motion, "--max-frames", "4",
          "--occluded-joints", "15", "17", "--mode", "inpaint"])
    assert "final_pose_pr" in capsys.readouterr().out

    corpus = str(tmp_path / "corpus.npz")
    q = rng.normal(size=(256, 21, 4)).astype(np.float32)
    np.savez(corpus, pose=q / np.linalg.norm(q, axis=-1, keepdims=True))
    out = str(tmp_path / "completed.npz")
    main(["partial", "-c", CFG, "--motion-data", motion, "--max-frames", "4",
          "--occluded-joints", "15", "17", "--mode", "retrieval",
          "--corpus", corpus, "--out", out])
    assert "wrote" in capsys.readouterr().out
    with np.load(out) as z:
        assert z["pose_body"].shape == (4, 69)

    with pytest.raises(SystemExit, match="requires --corpus"):
        main(["partial", "-c", CFG, "--motion-data", motion,
              "--mode", "retrieval"])
