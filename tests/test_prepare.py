"""Data-manufacturing pipeline tests: AMASS sampling, noisy-query generation,
device-side kNN labeling (end-to-end against a NumPy oracle)."""

import os

import numpy as np
import pytest

from posendf_tpu.data.prepare import (
    NoiseSpec,
    _to_quats,
    build_corpus,
    label_sequence,
    label_split,
    sample_amass,
    sample_noisy_queries,
)
from posendf_tpu.data.synthetic import synthetic_manifold_poses


@pytest.fixture(scope="module")
def raw_amass(tmp_path_factory):
    """Fabricate a raw-AMASS-shaped directory: <subset>/<seq>/clip.npz with
    'poses' (T, 156) axis-angle."""
    root = tmp_path_factory.mktemp("raw_amass")
    rng = np.random.default_rng(0)
    for subset in ("ACCAD", "CMU"):
        for seq in ("s1", "s2"):
            d = root / subset / seq
            d.mkdir(parents=True)
            T = 120
            poses = rng.normal(scale=0.3, size=(T, 156)).astype(np.float32)
            np.savez(d / "clip_poses.npz", poses=poses,
                     betas=rng.normal(size=16).astype(np.float32))
            # a shape file that must be skipped
            np.savez(d / "shape.npz", poses=np.zeros((5, 156), np.float32))
    return str(root)


def test_sample_amass_stage1(raw_amass, tmp_path):
    out = sample_amass(raw_amass, str(tmp_path / "sampled"), ["ACCAD", "CMU"], seed=0)
    assert len(out) == 4  # 2 subsets x 2 seqs; shape.npz skipped
    with np.load(out[0]) as z:
        pb = z["pose_body"]
        assert pb.shape[1] == 63
        # 0.3 of the middle 0.8 of 120 frames = ~28
        assert 20 <= len(pb) <= 35
        assert "root_orient" in z and "betas" in z
    # idempotence: second run reuses files
    out2 = sample_amass(raw_amass, str(tmp_path / "sampled"), ["ACCAD", "CMU"], seed=1)
    assert sorted(out) == sorted(out2)


def test_to_quats_matches_quat_module(rng):
    import jax.numpy as jnp

    from posendf_tpu.quat import axis_angle_to_quaternion

    aa = rng.normal(scale=0.5, size=(17, 63)).astype(np.float32)
    ours = _to_quats(aa)
    ref = np.asarray(axis_angle_to_quaternion(jnp.asarray(aa.reshape(17, 21, 3))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_noisy_queries_normalized(rng):
    clean = synthetic_manifold_poses(rng, 64)
    q = sample_noisy_queries(clean, 100, NoiseSpec(), rng)
    assert q.shape == (100, 21, 4)
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_noisy_queries_shared_noise_quirk(rng):
    """Reference quirk (create_data.py:88): ONE (21,4) noise draw broadcast
    across every pose of a sigma group. With identical clean poses, all
    queries inside a group must therefore be IDENTICAL — and distinct
    between groups/runs. per_pose_noise=True is the corrected variant."""
    one = synthetic_manifold_poses(rng, 1)
    clean = np.repeat(one, 64, axis=0)  # identical clean poses
    spec = NoiseSpec()

    # default path: shared noise => each sigma group collapses to one pose
    q = sample_noisy_queries(clean, 100, spec, np.random.default_rng(1))
    counts = spec.counts(100)
    start = 0
    group_reps = []
    for n in counts:
        g = q[start:start + n]
        np.testing.assert_array_equal(g, np.repeat(g[:1], n, axis=0))
        group_reps.append(g[0])
        start += n
    # distinct draws across sigma groups
    assert not np.allclose(group_reps[0], group_reps[1])

    # runs > 1: each run has its own shared draw per sigma
    q2 = sample_noisy_queries(clean, 100, spec, np.random.default_rng(1),
                              runs=2)
    assert q2.shape == (100, 21, 4)
    g_run1 = q2[:10]      # run 1, sigma 0 group (counts(50)[0] == 10)
    g_run2 = q2[50:60]    # run 2, sigma 0 group
    np.testing.assert_array_equal(g_run1, np.repeat(g_run1[:1], 10, axis=0))
    assert not np.allclose(g_run1[0], g_run2[0])

    # corrected variant: independent noise per pose
    qp = sample_noisy_queries(clean, 100, spec, np.random.default_rng(1),
                              per_pose_noise=True)
    assert not np.allclose(qp[0], qp[1])


def test_noisy_queries_rejects_silent_truncation(rng):
    """runs must divide num_samples (truncating would return fewer queries
    than requested), and degenerate per-run counts raise instead of
    crashing in np.concatenate."""
    import pytest

    clean = synthetic_manifold_poses(rng, 16)
    with pytest.raises(ValueError, match="divide"):
        sample_noisy_queries(clean, 1005, NoiseSpec(), rng, runs=10)
    with pytest.raises(ValueError, match="zero"):
        sample_noisy_queries(clean, 10, NoiseSpec(), rng, runs=10)


def test_noisy_queries_match_reference_port(rng):
    """The default path must equal a direct numpy port of the reference
    sampler loop (create_data.py:85-91) driven by the same Generator."""
    clean = synthetic_manifold_poses(rng, 64)
    spec = NoiseSpec()

    r1 = np.random.default_rng(7)
    ours = sample_noisy_queries(clean, 100, spec, r1)

    r2 = np.random.default_rng(7)
    ref = []
    for sigma, n in zip(spec.sigmas, spec.counts(100)):
        indices = r2.integers(0, len(clean), n)
        sampled = clean[indices]
        # reference: one rand(21,4) for the whole group, broadcast add
        sampled = sampled + sigma * r2.random((21, 4), dtype=np.float32)
        sampled = sampled / np.linalg.norm(sampled, axis=2, keepdims=True)
        ref.extend(sampled)
    np.testing.assert_allclose(ours, np.asarray(ref), atol=1e-7)


def test_label_sequence_against_oracle(rng):
    clean = synthetic_manifold_poses(rng, 128)
    corpus = synthetic_manifold_poses(rng, 256)
    labeled = label_sequence(clean, corpus, num_queries=50, k=5,
                             rng=np.random.default_rng(0))
    assert labeled["pose"].shape == (50, 21, 4)
    assert labeled["dist"].shape == (50, 5)
    assert labeled["nn_pose"].shape == (50, 5, 21, 4)
    # oracle check on the first few queries
    q = labeled["pose"][:8]
    dots = (q[:, None] * corpus[None]).sum(-1)
    geo = (1 - np.abs(dots)).mean(-1)
    ref = np.sort(geo, axis=1)[:, :5]
    np.testing.assert_allclose(labeled["dist"][:8], ref, atol=1e-5)
    # distances ascending
    assert (np.diff(labeled["dist"], axis=1) >= -1e-6).all()


def test_label_sequence_two_stage_matches_exact(rng):
    clean = synthetic_manifold_poses(rng, 64)
    corpus = synthetic_manifold_poses(rng, 200)
    r = np.random.default_rng(3)
    exact = label_sequence(clean, corpus, num_queries=30, k=5,
                           rng=np.random.default_rng(3))
    twostage = label_sequence(clean, corpus, num_queries=30, k=5,
                              k_candidates=200, rng=np.random.default_rng(3))
    np.testing.assert_allclose(exact["dist"], twostage["dist"], atol=1e-5)


def test_label_split_end_to_end(raw_amass, tmp_path):
    sampled = str(tmp_path / "sampled")
    labeled = str(tmp_path / "labeled")
    sample_amass(raw_amass, sampled, ["ACCAD", "CMU"], seed=0)
    out = label_split(sampled, labeled, ["ACCAD", "CMU"],
                      num_queries=10, runs=2, k=5)
    assert len(out) == 4
    with np.load(out[0]) as z:
        assert z["pose"].shape == (20, 21, 4)
        assert z["dist"].shape == (20, 5)
    # restart guard
    out2 = label_split(sampled, labeled, ["ACCAD", "CMU"], num_queries=10, runs=2)
    assert sorted(out) == sorted(out2)


def test_labeled_output_feeds_training_batcher(raw_amass, tmp_path):
    """The manufactured data must be directly consumable by the trainer."""
    from posendf_tpu.data.pipeline import TrainingBatcher

    sampled = str(tmp_path / "sampled")
    labeled = str(tmp_path / "labeled")
    sample_amass(raw_amass, sampled, ["ACCAD", "CMU"], seed=0)
    label_split(sampled, labeled, ["ACCAD", "CMU"], num_queries=10, runs=2)
    # manifold files: the sampled dir stores axis-angle; build quat files
    corpus, files = build_corpus(sampled, ["ACCAD", "CMU"])
    man_dir = tmp_path / "man" / "ACCAD"
    man_dir.mkdir(parents=True)
    np.savez(man_dir / "all.npz", pose=corpus)
    b = TrainingBatcher(labeled, str(tmp_path / "man"), batch_size=2, num_pts=16)
    batch = b.sample_batch()
    assert batch["pose"].shape == (32, 21, 4)
    assert (batch["dist"] >= 0).all()


def test_label_sequence_joint_space(rng):
    """Joint-space candidate search (the reference's primary faiss index)
    followed by geodesic re-rank: with exhaustive candidates it must match
    the exact quat-space geodesic search."""
    from posendf_tpu.smpl import BodyModel, synthetic_model

    clean = synthetic_manifold_poses(rng, 32)
    corpus = synthetic_manifold_poses(rng, 100)
    bm = BodyModel(model=synthetic_model(num_vertices=64, seed=3))
    exact = label_sequence(clean, corpus, num_queries=20, k=4,
                           rng=np.random.default_rng(5))
    joints = label_sequence(clean, corpus, num_queries=20, k=4,
                            k_candidates=100, space="joints", body_model=bm,
                            rng=np.random.default_rng(5))
    np.testing.assert_allclose(joints["dist"], exact["dist"], atol=1e-5)

    with pytest.raises(ValueError):
        label_sequence(clean, corpus, num_queries=5, k=2, space="joints",
                       k_candidates=50, rng=np.random.default_rng(0))


# --------------------------------------------------------------------------
# 'auto' engine selection: the measured corpus-safety probe
# --------------------------------------------------------------------------

def test_probe_fast_safety_pose_corpus_passes():
    """Pose-like manifold corpus: the prescreen bound is tight (joint
    angles < pi keep |w| off the sign-flip boundary), so the probe must
    measure near-perfect bound-vs-exact agreement and declare it safe."""
    from posendf_tpu.data.prepare import probe_fast_safety

    rng = np.random.default_rng(0)
    corpus = synthetic_manifold_poses(rng, 2048)
    stats = probe_fast_safety(corpus, np.random.default_rng(1),
                              n_queries=128)
    assert stats["safe"], stats
    assert stats["w_margin_frac"] <= 0.02, stats
    assert stats["topk_overlap"] >= 0.995, stats
    assert stats["label_mae_rel"] < 0.01, stats


def test_probe_fast_safety_uniform_s3_fails():
    """The adversarial corpus ARCHITECTURE 4 documents (~0.22 recall for
    the blind fast engine): uniform-random S^3 quats put ~15% of joints
    within sign-flip range of w=0 — the probe must catch it."""
    from posendf_tpu.data.prepare import probe_fast_safety

    rng = np.random.default_rng(2)
    q = rng.normal(size=(2048, 21, 4)).astype(np.float32)
    corpus = q / np.linalg.norm(q, axis=-1, keepdims=True)
    stats = probe_fast_safety(corpus, np.random.default_rng(3),
                              n_queries=128)
    assert not stats["safe"], stats
    assert stats["w_margin_frac"] > 0.02, stats


def test_resolve_auto_picks_fast_on_pose_corpus():
    from posendf_tpu.data.prepare import resolve_knn_precision

    rng = np.random.default_rng(4)
    corpus = synthetic_manifold_poses(rng, 1024)
    prec, stats = resolve_knn_precision(
        "auto", corpus, k=5, rng=np.random.default_rng(5),
        backend="tpu", verbose=False)
    assert prec == "fast"
    assert stats is not None and stats["safe"]


def test_resolve_auto_picks_exact_on_uniform_corpus():
    from posendf_tpu.data.prepare import resolve_knn_precision

    rng = np.random.default_rng(6)
    q = rng.normal(size=(1024, 21, 4)).astype(np.float32)
    corpus = (q / np.linalg.norm(q, axis=-1, keepdims=True)).astype(np.float32)
    prec, stats = resolve_knn_precision(
        "auto", corpus, k=5, rng=np.random.default_rng(7),
        backend="tpu", verbose=False)
    assert prec == "highest"
    assert stats is not None and not stats["safe"]


def test_resolve_auto_ineligible_searches_fall_back_exact():
    """When the fast engine cannot apply (non-TPU backend, two-stage
    search, big k, joint-space embedding), auto must resolve to the exact
    default WITHOUT probing."""
    from posendf_tpu.data.prepare import resolve_knn_precision

    corpus = synthetic_manifold_poses(np.random.default_rng(8), 256)
    for kwargs in ({"backend": "cpu"}, {"backend": "tpu", "k_candidates": 50},
                   {"backend": "tpu", "k": 9},
                   {"backend": "tpu", "space": "joints"},
                   {"backend": "tpu", "fused": False}):
        prec, stats = resolve_knn_precision("auto", corpus, verbose=False,
                                            **{"k": 5, **kwargs})
        assert prec == "highest", kwargs
        assert stats is None
    # concrete values pass through untouched, no probe
    for p in ("highest", "high", "default", "fast"):
        assert resolve_knn_precision(p, corpus, k=5) == (p, None)


def test_label_sequence_auto_resolves_on_cpu(rng_corpus=None):
    """precision='auto' through label_sequence on the CPU backend must
    behave exactly like the exact default (resolution -> 'highest')."""
    rng = np.random.default_rng(9)
    corpus = synthetic_manifold_poses(rng, 256)
    clean = synthetic_manifold_poses(rng, 32)
    ref = label_sequence(clean, corpus, num_queries=20, k=3,
                         rng=np.random.default_rng(1), precision="highest")
    out = label_sequence(clean, corpus, num_queries=20, k=3,
                         rng=np.random.default_rng(1), precision="auto")
    np.testing.assert_array_equal(out["dist"], ref["dist"])
    np.testing.assert_array_equal(out["pose"], ref["pose"])


def test_resolve_auto_with_mesh_defaults_exact():
    """Regression: 'auto' under a mesh with fused unset must resolve to
    exact 'highest' — the sharded DEFAULT engine is the XLA scan, which
    has no prescreen analog, so resolving to 'fast' would silently run
    bf16 'default' dots (near-tie neighbor swaps) while logging that the
    fast bound is safe. fused=True keeps the fast engine available (the
    shard_map'd kernel runs it per-chip)."""
    from posendf_tpu.data.prepare import resolve_knn_precision

    corpus = synthetic_manifold_poses(np.random.default_rng(10), 512)
    mesh_sentinel = object()   # only `is None` is inspected pre-probe
    prec, stats = resolve_knn_precision(
        "auto", corpus, k=5, backend="tpu", mesh=mesh_sentinel,
        verbose=False)
    assert prec == "highest" and stats is None
    prec, stats = resolve_knn_precision(
        "auto", corpus, k=5, backend="tpu", mesh=mesh_sentinel, fused=True,
        rng=np.random.default_rng(11), verbose=False)
    assert prec == "fast" and stats is not None and stats["safe"]


def test_label_sequence_fast_without_kernel_falls_back_exact():
    """Regression: precision='fast' where the fused kernel cannot run
    (here: fused=False) promises prescreen + EXACT rerank; the only
    faithful XLA fallback is exact 'highest' — the labels must be
    bit-identical to an exact run, not bf16-noisy."""
    rng = np.random.default_rng(12)
    corpus = synthetic_manifold_poses(rng, 256)
    clean = synthetic_manifold_poses(rng, 32)
    ref = label_sequence(clean, corpus, num_queries=20, k=3,
                         rng=np.random.default_rng(2), precision="highest",
                         fused=False)
    out = label_sequence(clean, corpus, num_queries=20, k=3,
                         rng=np.random.default_rng(2), precision="fast",
                         fused=False)
    np.testing.assert_array_equal(out["dist"], ref["dist"])
    np.testing.assert_array_equal(out["nn_pose"], ref["nn_pose"])


def test_structured_noise_sampler():
    """NoiseSpec.structured_frac: structured samples corrupt exactly one
    limb chain (other joints returned clean to fp precision), counts add
    up, and frac=0.0 keeps the reference draw stream (same rng, same
    output)."""
    from posendf_tpu.data.prepare import (SMPL_LIMB_CHAINS, NoiseSpec,
                                          sample_noisy_queries)

    clean = synthetic_manifold_poses(np.random.default_rng(0), 1)

    spec = NoiseSpec(structured_frac=1.0, structured_sigma=(0.5, 1.0))
    out = sample_noisy_queries(clean, 64, spec, np.random.default_rng(1),
                               per_pose_noise=True)
    assert out.shape == (64, 21, 4)
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1), 1.0, atol=1e-6)
    chains = [set(c) for c in SMPL_LIMB_CHAINS]
    for q in out:
        moved = {j for j in range(21)
                 if not np.allclose(q[j], clean[0, j], atol=1e-6)}
        assert moved in chains, f"corrupted joints {moved} are not one chain"

    # half-and-half: total count is grid(32) + 32 structured
    spec_h = NoiseSpec(structured_frac=0.5)
    out_h = sample_noisy_queries(clean, 64, spec_h,
                                 np.random.default_rng(2),
                                 per_pose_noise=True)
    grid_n = int(NoiseSpec().counts(32).sum())
    assert len(out_h) == grid_n + 32

    # frac=0.0 must not consume any extra rng draws vs the default spec
    a = sample_noisy_queries(clean, 40, NoiseSpec(),
                             np.random.default_rng(3), per_pose_noise=True)
    b = sample_noisy_queries(clean, 40, NoiseSpec(structured_frac=0.0),
                             np.random.default_rng(3), per_pose_noise=True)
    np.testing.assert_array_equal(a, b)


def test_label_sequence_structured_spec_labels_match_oracle(rng):
    """Structured queries flow through labeling unchanged: exact top-k
    distances against the brute-force oracle."""
    from posendf_tpu.data.prepare import NoiseSpec, label_sequence

    corpus = synthetic_manifold_poses(rng, 256)
    clean = synthetic_manifold_poses(rng, 32)
    spec = NoiseSpec(structured_frac=0.5)
    labeled = label_sequence(clean, corpus, num_queries=24, k=3,
                             rng=np.random.default_rng(5), spec=spec)
    q = labeled["pose"]
    dots = (q[:, None] * corpus[None]).sum(-1)
    geo = (1 - np.abs(dots)).mean(-1)
    ref = np.sort(geo, axis=1)[:, :3]
    np.testing.assert_allclose(labeled["dist"], ref, atol=1e-5)


def test_structured_only_small_batch_is_valid():
    """Regression: a structured-only request (grid count 0 by design) must
    sample, not raise the 'rounds every per-sigma count to zero' error."""
    from posendf_tpu.data.prepare import NoiseSpec, sample_noisy_queries

    clean = synthetic_manifold_poses(np.random.default_rng(20), 4)
    out = sample_noisy_queries(clean, 2, NoiseSpec(structured_frac=1.0),
                               np.random.default_rng(21),
                               per_pose_noise=True)
    assert out.shape == (2, 21, 4)
    # a tiny GRID request still fails loud
    with pytest.raises(ValueError, match="rounds every per-sigma count"):
        sample_noisy_queries(clean, 2, NoiseSpec(),
                             np.random.default_rng(22))
