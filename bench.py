"""Benchmark: NDF forward evals/sec/chip (primary) + 200-step projection.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

North stars (BASELINE.md): >= 1M NDF forward evals/sec/chip; 200-step
projection of 10k poses < 1 s. ``vs_baseline`` is the ratio of measured
evals/sec to the 1M target (>1 beats it).

Measurement notes: the remote-TPU relay in this environment has ~30 ms
dispatch RTT and a broken ``block_until_ready`` (returns before execution),
so each measurement runs its iterations INSIDE one jitted ``lax.fori_loop``
and is timed to a scalar host readback — one dispatch, N executions, forced
synchronization.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from functools import partial

import numpy as np


def _section_failed(name: str) -> None:
    """Sections degrade to null metrics rather than killing the bench, but
    the cause must land on stderr (stdout carries exactly one JSON line)."""
    print(f"[bench] section '{name}' failed:", file=sys.stderr)
    traceback.print_exc(file=sys.stderr)


def main():
    import os

    import jax

    # persistent compilation cache: the remote-compile service in this
    # environment takes ~1 min per Pallas kernel; warm runs skip it entirely
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.projection import project

    dev = jax.devices()[0]

    # environment provenance (VERDICT r3 #6): record which jax/jaxlib/libtpu
    # and cache state produced this artifact, so cross-round diffs are
    # attributable (the r03 multichip incident was an unrecorded libtpu skew)
    def _env_provenance():
        try:
            import jaxlib

            jaxlib_v = getattr(jaxlib, "__version__", None)
        except Exception:
            jaxlib_v = None
        try:
            platform_version = str(dev.client.platform_version)
        except Exception:
            platform_version = None
        try:
            n_cached = len(os.listdir(cache_dir))
        except OSError:
            n_cached = 0
        return {
            "jax": jax.__version__,
            "jaxlib": jaxlib_v,
            "backend": jax.default_backend(),
            "platform_version": platform_version,  # libtpu build on TPU
            "device_kind": getattr(dev, "device_kind", None),
            "compile_cache_entries_at_start": n_cached,
        }

    env_provenance = _env_provenance()
    print(f"[bench] env: {env_provenance}", file=sys.stderr)
    cfg = PoseNDFConfig()
    module = cfg.make_model()
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]

    # flagship config: Pallas fused structure encoder (falls back to the
    # pure-XLA path on backends without Mosaic, e.g. CPU)
    fused_ok = True
    try:
        cfg_fused = PoseNDFConfig()
        cfg_fused.strenc.fused = True
        module_fused = cfg_fused.make_model()
        jax.block_until_ready(
            module_fused.apply({"params": params},
                               jnp.ones((256, 21, 4), jnp.float32)))
    except Exception:
        fused_ok = False
    bench_module = module_fused if fused_ok else module

    # ---------- forward throughput ----------
    B = 1 << 17  # 131k poses/step keeps the MXU fed
    rng = np.random.default_rng(0)
    pose = rng.random((B, 21, 4)).astype(np.float32)
    pose /= np.linalg.norm(pose, axis=-1, keepdims=True)
    pose = jax.device_put(pose, dev)

    @partial(jax.jit, static_argnames=("iters",))
    def fwd_loop(params, pose, iters):
        def body(i, acc):
            # acc feedback prevents the loop body from being hoisted/DCE'd
            d = bench_module.apply({"params": params}, pose + acc * 0)
            return acc + jnp.sum(d)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def timed(fn, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn())  # scalar readback = hard sync through the relay
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = 10, 60
    float(fwd_loop(params, pose, lo))
    float(fwd_loop(params, pose, hi))  # compile both
    t_lo = timed(lambda: fwd_loop(params, pose, lo))
    t_hi = timed(lambda: fwd_loop(params, pose, hi))
    per_iter = (t_hi - t_lo) / (hi - lo)  # dispatch RTT cancels
    evals_enc = B / per_iter  # fused-encoder + XLA DFNet pipeline

    # whole-model single-kernel forward (Field.distance_fused) — measured
    # fastest at tile 2048; headline = best public serving path
    evals_wm = None
    try:
        from posendf_tpu.ops.fused_model import fused_posendf_forward

        @partial(jax.jit, static_argnames=("iters",))
        def wm_loop(params, pose, iters):
            def body(i, acc):
                d = fused_posendf_forward(
                    pose + acc * 0, params["enc"], params["dfnet"],
                    parents=module.parents, activation=module.activation,
                    beta=module.beta)
                return acc + jnp.sum(d)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(wm_loop(params, pose, lo))
        float(wm_loop(params, pose, hi))
        t_lo_w = timed(lambda: wm_loop(params, pose, lo))
        t_hi_w = timed(lambda: wm_loop(params, pose, hi))
        evals_wm = B / ((t_hi_w - t_lo_w) / (hi - lo))
    except Exception:
        _section_failed('whole_model_kernel')
        evals_wm = None

    # int8-MXU serving path (ops/fused_int8.py): the DFNet's wide layers on
    # the int8 MXU (394 TOPS peak = 2x bf16), per-input-channel static
    # quantization folded into the weights. Throughput on fresh-init
    # weights; quality delta measured separately on the trained L=8
    # checkpoint (realistic weight/activation distributions).
    evals_int8 = None
    int8_mae_over_std = None
    try:
        from posendf_tpu.field import Field
        from posendf_tpu.ops.fused_int8 import fused_posendf_forward_int8

        calib = rng.random((4096, 21, 4)).astype(np.float32)
        calib /= np.linalg.norm(calib, axis=-1, keepdims=True)
        qparams = Field(module, params).quantize_int8(
            jnp.asarray(calib)).qparams

        @partial(jax.jit, static_argnames=("iters",))
        def i8_loop(pose, iters):
            def body(i, acc):
                d = fused_posendf_forward_int8(
                    pose + acc * 0, qparams, parents=module.parents,
                    activation=module.activation, beta=module.beta,
                    tile_b=4096)
                return acc + jnp.sum(d)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(i8_loop(pose, lo))
        float(i8_loop(pose, hi))
        t_lo_8 = timed(lambda: i8_loop(pose, lo))
        t_hi_8 = timed(lambda: i8_loop(pose, hi))
        evals_int8 = B / ((t_hi_8 - t_lo_8) / (hi - lo))

        l8 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "docs", "quality", "ckpt_l8_best.msgpack")
        if os.path.exists(l8):
            import posendf_tpu as _pndf

            tf = _pndf.load_field(l8)
            qrng = np.random.default_rng(11)
            tcal = qrng.normal(size=(1024, 21, 4)).astype(np.float32)
            tcal /= np.linalg.norm(tcal, axis=-1, keepdims=True)
            tq = tf.quantize_int8(jnp.asarray(tcal))
            tprob = qrng.normal(size=(2048, 21, 4)).astype(np.float32)
            tprob /= np.linalg.norm(tprob, axis=-1, keepdims=True)
            d32 = np.asarray(tf.distance(jnp.asarray(tprob))).ravel()
            d8 = np.asarray(tq.distance_xla(jnp.asarray(tprob))).ravel()
            int8_mae_over_std = float(
                np.mean(np.abs(d8 - d32)) / max(np.std(d32), 1e-9))
    except Exception:
        _section_failed('int8_serving')

    evals_per_sec = max(evals_enc, evals_wm or 0.0)
    per_iter = B / evals_per_sec

    # ---------- hardware-ceiling metrics (VERDICT r1 #6) ----------
    # v5e: 197 TFLOP/s MXU (one-pass bf16 == fp32-DEFAULT), ~819 GB/s HBM.
    # FLOPs per pose from XLA's own cost model (falls back to the analytic
    # 2.726 MFLOP: 1.36M dfnet MACs + 3.4k encoder MACs, x2).
    PEAK_FLOPS, PEAK_HBM = 197e12, 819e9
    try:
        ca = jax.jit(lambda p, q: bench_module.apply({"params": p}, q)) \
            .lower(params, pose).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        fwd_flops_per_pose = float(ca["flops"]) / B
    except Exception:
        fwd_flops_per_pose = 2.726e6
    mfu_pct = evals_per_sec * fwd_flops_per_pose / PEAK_FLOPS * 100
    # compulsory HBM traffic: 84 fp32 in + 1 fp32 out per pose + one weight
    # read per dispatch (~5.5 MB / B poses). Far below 100% == compute-bound
    # (inter-layer activations stay in VMEM through XLA fusion; see
    # docs/ARCHITECTURE.md section 5 roofline).
    fwd_bytes_per_pose = 85 * 4 + 5.5e6 / B
    hbm_util_pct = evals_per_sec * fwd_bytes_per_pose / PEAK_HBM * 100

    # ---------- 200-step projection of 10k poses ----------
    NP_, STEPS = 10_000, 200
    poses = rng.random((NP_, 21, 4)).astype(np.float32)
    poses /= np.linalg.norm(poses, axis=-1, keepdims=True)
    poses = jax.device_put(poses, dev)

    def proj_sum():
        out, _ = project(module, params, poses, steps=STEPS)
        return jnp.sum(out)

    proj_jit = jax.jit(proj_sum)
    float(proj_jit())  # compile
    proj_s = timed(proj_jit)

    # fused value-and-grad kernel path (ops/fused_grad.py) — one Pallas
    # program per step instead of XLA forward + vjp backward
    proj_fused_s = None
    try:
        def proj_fused_sum():
            out, _ = project(module, params, poses, steps=STEPS, fused=True)
            return jnp.sum(out)

        pf_jit = jax.jit(proj_fused_sum)
        float(pf_jit())  # compile
        proj_fused_s = timed(pf_jit)
    except Exception:
        _section_failed('projection_fused')
        proj_fused_s = None

    # ---------- value-and-grad throughput at serving batch (131k) ----------
    # the solver primitive: d AND grad_q d per pose. Fused kernel wins ~2x
    # over XLA fwd+vjp once the batch amortizes the tile grid.
    vag_fused = None
    try:
        from posendf_tpu.ops.fused_grad import fused_distance_and_grad

        @partial(jax.jit, static_argnames=("iters",))
        def vag_loop(params, pose, iters):
            def body(i, acc):
                d, g = fused_distance_and_grad(
                    pose + acc * 0, params["enc"], params["dfnet"],
                    parents=module.parents, activation=module.activation,
                    beta=module.beta)
                return acc + jnp.sum(d) + jnp.sum(g[0, 0])

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(vag_loop(params, pose, lo))
        float(vag_loop(params, pose, hi))
        t_lo3 = timed(lambda: vag_loop(params, pose, lo))
        t_hi3 = timed(lambda: vag_loop(params, pose, hi))
        vag_fused = B / ((t_hi3 - t_lo3) / (hi - lo))
        # input-only backward costs the same matmul MACs as the forward
        # (XLA's cost model can't see inside the Pallas kernel)
        vag_mfu_pct = vag_fused * 2.0 * fwd_flops_per_pose / PEAK_FLOPS * 100
    except Exception:
        _section_failed('value_and_grad')
        vag_fused = None
        vag_mfu_pct = None

    # ---------- bf16 fast path (compute_dtype=bfloat16, 262k batch) --------
    bf16_evals = None
    try:
        cfg_bf16 = PoseNDFConfig()
        cfg_bf16.strenc.fused = fused_ok
        cfg_bf16.dfnet.compute_dtype = "bfloat16"
        module_bf16 = cfg_bf16.make_model()
        B2 = 1 << 18
        pose2 = jnp.concatenate([pose, pose])[:B2]

        @partial(jax.jit, static_argnames=("iters",))
        def bf16_loop(params, pose, iters):
            def body(i, acc):
                d = module_bf16.apply({"params": params}, pose + acc * 0)
                return acc + jnp.sum(d)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        float(bf16_loop(params, pose2, lo))
        float(bf16_loop(params, pose2, hi))
        t_lo2 = timed(lambda: bf16_loop(params, pose2, lo))
        t_hi2 = timed(lambda: bf16_loop(params, pose2, hi))
        bf16_evals = B2 / ((t_hi2 - t_lo2) / (hi - lo))
    except Exception:
        _section_failed('bf16_forward')
        bf16_evals = None

    # ---------- training step throughput (reference config: 20k poses) ----
    train_ms = None
    try:
        from posendf_tpu.training.trainer import make_optimizer, make_train_step

        opt = make_optimizer(cfg.train.optimizer_param, cfg.train.weight_decay)
        tstep = make_train_step(module, opt, loss_type="l1",
                                weights={"dist": 1.0, "man_loss": 1.0,
                                         "eikonal": 1.0})
        tb = 20_000
        tbatch = {
            "pose": pose[:tb],
            "dist": jnp.abs(jax.random.normal(jax.random.key(1), (tb,))),
            "man_poses": pose[:tb],
        }
        # a live output head: the default init's dead-head coin flip makes
        # every gradient exactly zero (identical op count, but measure at a
        # non-degenerate point)
        _bL = 1 + max(int(k[1:]) for k in params["dfnet"] if k[0] == "w")
        tparams = dict(params, dfnet=dict(
            params["dfnet"], **{f"b{_bL - 1}":
                                params["dfnet"][f"b{_bL - 1}"] + 0.5}))
        topt = opt.init(tparams)

        def time_train_step(step, b):
            # 50-step diff: at ~4-6 ms/step a 10-step diff (~50 ms) is
            # inside the relay's jitter and misleads tile choices
            # (see ops/fused_train.py tile history)
            @partial(jax.jit, static_argnames=("n",))
            def loop(p, s, batch, n):
                def body(i, carry):
                    p, s = carry
                    p, s, _ = step(p, s, batch)
                    return (p, s)

                p, s = jax.lax.fori_loop(0, n, body, (p, s))
                return jnp.sum(jax.tree_util.tree_leaves(p)[0])

            float(loop(tparams, topt, b, 2))
            float(loop(tparams, topt, b, 52))
            t_lo = timed(lambda: loop(tparams, topt, b, 2))
            t_hi = timed(lambda: loop(tparams, topt, b, 52))
            return (t_hi - t_lo) / 50 * 1e3

        train_ms = time_train_step(tstep, tbatch)
        try:
            # objective-gradient FLOPs from XLA's own cost model of the
            # autodiff step — the "useful work" numerator for BOTH paths
            # (the fused kernel computes the identical math; chain of
            # custody in ops/fused_train.py)
            ca = jax.jit(tstep).lower(tparams, topt, tbatch) \
                .compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            train_flops = float(ca["flops"])
            train_autodiff_mfu_pct = (train_flops / (train_ms * 1e-3)
                                      / PEAK_FLOPS * 100)
        except Exception:
            train_flops = None
            train_autodiff_mfu_pct = None
    except Exception:
        _section_failed('train_autodiff')
        train_ms = None
        train_flops = None
        train_autodiff_mfu_pct = None

    # ---------- fused train-gradient kernel (ops/fused_train.py) ----------
    # same 20k-batch step with loss + dL/dparams computed in two Pallas
    # programs (double backprop VMEM-resident) instead of autodiff
    train_fused_ms = None
    if fused_ok and train_ms is not None:
        try:
            tstep_f = make_train_step(module, opt, loss_type="l1",
                                      weights={"dist": 1.0, "man_loss": 1.0,
                                               "eikonal": 1.0}, fused=True)
            train_fused_ms = time_train_step(tstep_f, tbatch)
        except Exception:
            _section_failed('train_fused')
            train_fused_ms = None
    train_fused_mfu_pct = (
        train_flops / (train_fused_ms * 1e-3) / PEAK_FLOPS * 100
        if train_fused_ms and train_flops else None)
    # flagship training MFU = the best available step implementation (the
    # fused Pallas kernel on TPU; autodiff elsewhere) against the same
    # useful-FLOPs numerator
    train_mfu_pct = max(
        (m for m in (train_autodiff_mfu_pct, train_fused_mfu_pct)
         if m is not None), default=None)

    # fused train step at 65k poses — the fused sweet spot: autodiff is
    # bandwidth-walled past 20k (eikonal activations spill to HBM) while
    # the kernel holds ~12M poses/s (ARCHITECTURE.md section 5)
    train_fused_65k_ms = None
    if train_fused_ms is not None:
        try:
            b65 = 1 << 16
            tb65 = {
                "pose": pose[:b65],
                "dist": jnp.abs(jax.random.normal(jax.random.key(2), (b65,))),
                "man_poses": pose[b65:2 * b65],
            }
            train_fused_65k_ms = time_train_step(tstep_f, tb65)
        except Exception:
            _section_failed('train_fused_65k')
            train_fused_65k_ms = None

    # ---------- serving-batch fused projection (131k x 50 steps) ----------
    proj_big_s = None
    try:
        def proj_big():  # serving batch = the full 131k pose buffer
            out, _ = project(module, params, pose, steps=50, fused=True)
            return jnp.sum(out)

        pb_jit = jax.jit(proj_big)
        float(pb_jit())
        proj_big_s = timed(pb_jit)
    except Exception:
        _section_failed('projection_131k')
        proj_big_s = None

    # ---------- kNN labeling throughput (the faiss replacement) -----------
    # exact single-stage geodesic top-5 of noisy queries against a 262k-pose
    # corpus — the data-manufacturing hot loop (prepare.label_sequence)
    knn_qps = None
    try:
        from posendf_tpu.ops.knn import geodesic_topk

        corpus = jnp.concatenate([pose, pose])[: 1 << 18]
        queries = pose[:4096]

        @jax.jit
        def knn_once(queries, corpus):
            d, idx = geodesic_topk(queries, corpus, k=5)
            return jnp.sum(d) + idx[0, 0]

        float(knn_once(queries, corpus))
        knn_s = timed(lambda: knn_once(queries, corpus))
        knn_qps = queries.shape[0] / knn_s
    except Exception:
        _section_failed('knn_262k')
        knn_qps = None

    # same search through the fused Pallas kernel (distance + top-k merge in
    # one VMEM-resident pass, ops/fused_knn.py) — the default labeling path
    # on TPU
    knn_fused_qps = None
    try:
        from posendf_tpu.ops.fused_knn import fused_geodesic_topk

        def knn_fused_once():
            d, idx = fused_geodesic_topk(queries, corpus, 5)
            return float(jnp.sum(d) + idx[0, 0])

        knn_fused_once()
        knn_fused_s = timed(knn_fused_once)
        knn_fused_qps = queries.shape[0] / knn_fused_s
    except Exception:
        _section_failed('knn_fused')
        knn_fused_qps = None

    # 'fast' labeling composite (label_sequence(precision='fast')): ONE
    # K=84 systolic pass per distance tile scoring the hemisphere-
    # canonicalized upper bound, then exact fp32 rerank of 8 candidates —
    # exact labels for near-neighbor queries (see ops/fused_knn.py)
    knn_fast_qps = None
    try:
        from posendf_tpu.ops.fused_knn import fused_geodesic_topk_fast

        @jax.jit
        def knn_fast_once(q, c):
            d, idx = fused_geodesic_topk_fast(q, c, 5)
            return jnp.sum(d) + idx[0, 0]

        float(knn_fast_once(queries, corpus))
        knn_fast_s = timed(lambda: float(knn_fast_once(queries, corpus)))
        knn_fast_qps = queries.shape[0] / knn_fast_s
    except Exception:
        _section_failed('knn_fast')
        knn_fast_qps = None

    # ---------- mesh-sharded labeling (the Slurm-fan-out replacement) ------
    # label_sequence(mesh=) end to end: noisy-query sampling + sharded
    # geodesic top-5 + host readback, on a data mesh over all local devices
    # (one chip under the driver; the same code path scales over ICI)
    knn_sharded_qps = None
    try:
        from posendf_tpu.data.prepare import label_sequence
        from posendf_tpu.parallel import make_mesh

        mesh = make_mesh(("data",))
        # reuse the 262k corpus the knn section built (one ~88 MB device
        # buffer + one host copy, not two of each)
        try:
            corpus_dev = corpus
        except NameError:  # knn section failed before building it
            corpus_dev = jnp.concatenate([pose, pose])[: 1 << 18]
        corpus_np262 = np.asarray(corpus_dev)
        clean = np.asarray(pose[:256])
        nq = 8192
        label_sequence(  # warm-up: compile the sharded search
            clean, corpus_dev, corpus_np=corpus_np262, num_queries=nq, k=5,
            mesh=mesh, rng=np.random.default_rng(0))
        t0 = time.perf_counter()
        label_sequence(clean, corpus_dev, corpus_np=corpus_np262,
                       num_queries=nq, k=5, mesh=mesh,
                       rng=np.random.default_rng(1))
        knn_sharded_qps = nq / (time.perf_counter() - t0)
    except Exception:
        _section_failed('knn_sharded')
        knn_sharded_qps = None

    # ---------- kNN at AMASS scale (1M-row corpus, VERDICT r2 #4) ---------
    # the real labeling corpus is 10^6-10^7 rows (SURVEY §2.2); qps scales
    # ~1/N so the 262k number above cannot be extrapolated blindly. Corpus
    # is GENERATED on device (336 MB host->device through the ~10 MB/s relay
    # would take ~35 s and measure nothing).
    knn_1m_qps = None
    knn_1m_exact_qps = None
    knn_1m_bf16_qps = None
    knn_1m_fast_qps = None
    try:
        from posendf_tpu.ops.fused_knn import fused_geodesic_topk

        N1 = 1 << 20
        c1 = jax.random.normal(jax.random.key(11), (N1, 21, 4), jnp.float32)
        corpus_1m = c1 / jnp.linalg.norm(c1, axis=-1, keepdims=True)

        @jax.jit
        def knn_1m_once(q, c):
            d, idx = fused_geodesic_topk(q, c, 5)
            return jnp.sum(d) + idx[0, 0]

        float(knn_1m_once(queries, corpus_1m))  # compile
        knn_1m_s = timed(lambda: float(knn_1m_once(queries, corpus_1m)))
        knn_1m_qps = queries.shape[0] / knn_1m_s

        # approximate fast mode: per-joint dots on the MXU (single-pass
        # bf16) — what label_sequence(precision='default') uses
        @jax.jit
        def knn_1m_bf16_once(q, c):
            d, idx = fused_geodesic_topk(q, c, 5, dot_impl="mxu_bf16")
            return jnp.sum(d) + idx[0, 0]

        try:
            float(knn_1m_bf16_once(queries, corpus_1m))
            knn_1m_bf16_s = timed(
                lambda: float(knn_1m_bf16_once(queries, corpus_1m)))
            knn_1m_bf16_qps = queries.shape[0] / knn_1m_bf16_s
        except Exception:
            _section_failed('knn_1m_bf16')
            knn_1m_bf16_qps = None

        @jax.jit
        def knn_1m_exact_once(q, c):
            d, idx = geodesic_topk(q, c, k=5)
            return jnp.sum(d) + idx[0, 0]

        float(knn_1m_exact_once(queries, corpus_1m))
        knn_1m_exact_s = timed(
            lambda: float(knn_1m_exact_once(queries, corpus_1m)))
        knn_1m_exact_qps = queries.shape[0] / knn_1m_exact_s

        # 'fast' prescreen+rerank at AMASS scale — the headline labeling
        # engine (2.05x the bf16-MXU approximate path, 3.7x exact, with
        # near-exact labels on pose corpora; measured 2026-08-20)
        try:
            from posendf_tpu.ops.fused_knn import fused_geodesic_topk_fast

            @jax.jit
            def knn_1m_fast_once(q, c):
                d, idx = fused_geodesic_topk_fast(q, c, 5)
                return jnp.sum(d) + idx[0, 0]

            float(knn_1m_fast_once(queries, corpus_1m))
            knn_1m_fast_s = timed(
                lambda: float(knn_1m_fast_once(queries, corpus_1m)))
            knn_1m_fast_qps = queries.shape[0] / knn_1m_fast_s
        except Exception:
            _section_failed('knn_1m_fast')
            knn_1m_fast_qps = None
        del c1, corpus_1m
    except Exception:
        _section_failed('knn_1m')
        knn_1m_qps = None
        knn_1m_exact_qps = None

    # ---------- end-to-end training throughput: npz -> update -------------
    # VERDICT r2 #2: everything upstream of the step — native/numpy batch
    # assembly, host->device transfer, prefetch overlap — measured as
    # sustained poses/s over full epochs of the reference batch recipe
    # (4 files x 5000 rows = 20k poses/step, model/load_data.py:76-85).
    # NOTE the relay artifact: each 20k-pose batch is ~13.5 MB of H2D
    # traffic; this environment's relay moves ~8-10 MB/s, so the e2e number
    # here is transfer-bound by the harness, not by the design (the
    # host-assembly rate and the device step time bracket what real
    # locally-attached HBM would sustain).
    train_e2e_pps = None
    train_e2e_host_pps = None
    try:
        import tempfile

        from posendf_tpu.data.pipeline import TrainingBatcher, prefetch_to_device

        tstep_best = (tstep_f if train_fused_ms is not None
                      and train_fused_ms < train_ms else tstep)
        with tempfile.TemporaryDirectory() as td:
            lab_dir = os.path.join(td, "labeled")
            am_dir = os.path.join(td, "amass")
            rng3 = np.random.default_rng(3)
            rows = 20_000
            for subset in ("ACCAD", "CMU"):
                os.makedirs(os.path.join(lab_dir, subset))
                os.makedirs(os.path.join(am_dir, subset))
                for s in range(8):
                    p = rng3.random((rows, 21, 4)).astype(np.float32)
                    p /= np.linalg.norm(p, axis=-1, keepdims=True)
                    np.savez(os.path.join(lab_dir, subset,
                                          f"seq{s:02d}_000.npz"),
                             pose=p,
                             dist=rng3.random((rows, 5)).astype(np.float32))
                    m = rng3.random((rows, 21, 4)).astype(np.float32)
                    m /= np.linalg.norm(m, axis=-1, keepdims=True)
                    np.savez(os.path.join(am_dir, subset, f"seq{s:02d}.npz"),
                             pose=m)
            batcher = TrainingBatcher(lab_dir, am_dir, batch_size=4,
                                      num_pts=5000, seed=0)

            # host assembly alone (native C++ loader if built), steady
            # state: the first batches over fresh mmaps pay page-cache /
            # minor-fault warmup worth 2-3x the steady rate (measured), and
            # a long training run amortizes that to nothing — warm until
            # the per-batch time stabilizes, then take the best of 3
            # windows (best-of defeats this VM class's CPU-steal noise)
            for _ in range(12):
                batcher.sample_batch()
            n_host = 16
            t_best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_host):
                    b = batcher.sample_batch()
                t_best = min(t_best, time.perf_counter() - t0)
            train_e2e_host_pps = n_host * b["pose"].shape[0] / t_best

            def run_epochs(first_epoch, n_epochs):
                nonlocal tp, ts
                n = 0
                for e in range(first_epoch, first_epoch + n_epochs):
                    for batch in prefetch_to_device(batcher.epoch(e)):
                        tp, ts, _ = step_jit(tp, ts, batch)
                        n += batch["pose"].shape[0]
                # scalar readback = hard sync through the relay
                float(jnp.sum(jax.tree_util.tree_leaves(tp)[0]))
                return n

            step_jit = jax.jit(tstep_best, donate_argnums=(0, 1))
            # fresh buffers: tparams SHARES leaves with `params` (shallow
            # dict copy above) and device_put of an on-device array is a
            # no-op — donating those would invalidate `params` for every
            # later section (this nulled the denoise bench once)
            tp = jax.tree.map(jnp.copy, tparams)
            ts = opt.init(tp)
            run_epochs(0, 1)  # compile + warm
            t0 = time.perf_counter()
            n_poses = run_epochs(1, 2)  # 8 steps of 20k poses
            train_e2e_pps = n_poses / (time.perf_counter() - t0)
    except Exception:
        _section_failed('train_e2e')
        train_e2e_pps = None
        train_e2e_host_pps = None

    # ---------- motion-denoise solve (the reference quality benchmark) ----
    # full 10x50-step annealed-Adam solve of a 60-frame clip (SMPL FK + NDF
    # prior + temporal/data terms per step), one lax.scan on device
    denoise_s = None
    try:
        from posendf_tpu.experiments import MotionDenoiser
        from posendf_tpu.smpl import BodyModel

        den = MotionDenoiser(module, params, BodyModel())
        noisy = jnp.asarray(
            rng.normal(scale=0.1, size=(60, 69)).astype(np.float32))
        out_pose, _ = den.optimize(noisy, iterations=10, steps_per_iter=50)
        jax.block_until_ready(out_pose)  # compile

        def den_run():
            out_pose, _ = den.optimize(noisy, iterations=10, steps_per_iter=50)
            return jnp.sum(out_pose)

        denoise_s = timed(den_run)
    except Exception:
        _section_failed('denoise')
        denoise_s = None

    # same solve through `--specs adaptive` (per-clip noise estimate +
    # runtime-interpolated schedule, r5): the delta vs denoise_s is the
    # sensor's full cost (2 field forwards + a 10-step projection + the
    # temporal estimator + the runtime-scalar aux)
    denoise_adaptive_s = None
    try:
        den_ad = MotionDenoiser(module, params, BodyModel(), specs="adaptive")
        out_pose, _ = den_ad.optimize(noisy, iterations=10, steps_per_iter=50)
        jax.block_until_ready(out_pose)  # compile

        def den_ad_run():
            out_pose, _ = den_ad.optimize(noisy, iterations=10,
                                          steps_per_iter=50)
            return jnp.sum(out_pose)

        denoise_adaptive_s = timed(den_ad_run)
    except Exception:
        _section_failed('denoise_adaptive')
        denoise_adaptive_s = None

    target = 1_000_000.0
    print(json.dumps({
        "metric": "ndf_fwd_evals_per_sec_per_chip",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s/chip",
        "vs_baseline": round(evals_per_sec / target, 3),
        "extra": {
            "env": env_provenance,
            # best available path (the fused kernel wins on TPU; XLA on
            # backends without Mosaic)
            "projection_200step_10k_s":
                round(min(proj_s, proj_fused_s), 4) if proj_fused_s
                else round(proj_s, 4),
            "projection_200step_10k_xla_s": round(proj_s, 4),
            "projection_200step_10k_fused_s":
                round(proj_fused_s, 4) if proj_fused_s else None,
            "projection_target_s": 1.0,
            "device": str(dev),
            "batch": B,
            "fused_encoder": fused_ok,
            "per_fwd_iter_ms": round(per_iter * 1e3, 4),
            "fwd_fused_encoder_evals_per_sec": round(evals_enc, 1),
            "fwd_whole_model_kernel_evals_per_sec":
                round(evals_wm, 1) if evals_wm else None,
            "train_step_20k_ms": round(train_ms, 3) if train_ms else None,
            "train_step_20k_fused_ms":
                round(train_fused_ms, 3) if train_fused_ms else None,
            "train_step_65k_fused_ms":
                round(train_fused_65k_ms, 3) if train_fused_65k_ms else None,
            "bf16_evals_per_sec": round(bf16_evals, 1) if bf16_evals else None,
            "int8_evals_per_sec":
                round(evals_int8, 1) if evals_int8 else None,
            "int8_mae_over_std":
                round(int8_mae_over_std, 4)
                if int8_mae_over_std is not None else None,
            "fused_value_and_grad_per_sec":
                round(vag_fused, 1) if vag_fused else None,
            "projection_50step_131k_fused_s":
                round(proj_big_s, 4) if proj_big_s else None,
            "knn_geodesic_top5_262k_corpus_qps":
                round(knn_qps, 1) if knn_qps else None,
            "knn_fused_qps":
                round(knn_fused_qps, 1) if knn_fused_qps else None,
            "knn_fast_qps":
                round(knn_fast_qps, 1) if knn_fast_qps else None,
            "knn_sharded_qps":
                round(knn_sharded_qps, 1) if knn_sharded_qps else None,
            # travels with the artifact (the docs explain it, but the JSON
            # is read without them): the sharded number sits BELOW the
            # single-chip fused kernel on this harness because per-batch
            # host I/O rides the ~8-10 MB/s relay; the compiled per-chip
            # program is 1/N FLOPs with zero collectives (ARCHITECTURE §3)
            "knn_sharded_qps_note": "relay-I/O-bound on this harness; "
                "not a kernel regression" if knn_sharded_qps else None,
            "knn_fused_1m_corpus_qps":
                round(knn_1m_qps, 1) if knn_1m_qps else None,
            "knn_exact_1m_corpus_qps":
                round(knn_1m_exact_qps, 1) if knn_1m_exact_qps else None,
            "knn_fused_1m_bf16_mxu_qps":
                round(knn_1m_bf16_qps, 1) if knn_1m_bf16_qps else None,
            "train_e2e_poses_per_sec":
                round(train_e2e_pps, 1) if train_e2e_pps else None,
            "train_e2e_host_assembly_poses_per_sec":
                round(train_e2e_host_pps, 1) if train_e2e_host_pps else None,
            # host-assembly rate scales ~linearly with cores (the native
            # gather parallel_fors over rows); record the cores the number
            # was measured WITH — r04 recorded 7.79M against docs written
            # for a 1-vCPU host (3.1-3.3M measured there) and nothing in
            # the artifact explained the gap
            "host_vcpus": os.cpu_count(),
            "denoise_500step_60frame_s":
                round(denoise_s, 4) if denoise_s else None,
            "denoise_adaptive_500step_60frame_s":
                round(denoise_adaptive_s, 4) if denoise_adaptive_s else None,
            # hardware-ceiling view (v5e: 197 TFLOP/s, 819 GB/s)
            "mfu_pct": round(mfu_pct, 1),
            "hbm_util_pct": round(hbm_util_pct, 2),
            "vag_mfu_pct": round(vag_mfu_pct, 1) if vag_mfu_pct else None,
            "train_mfu_pct":
                round(train_mfu_pct, 1) if train_mfu_pct else None,
            "train_autodiff_mfu_pct":
                round(train_autodiff_mfu_pct, 1)
                if train_autodiff_mfu_pct else None,
            "train_fused_mfu_pct":
                round(train_fused_mfu_pct, 1)
                if train_fused_mfu_pct else None,
        },
    }))


if __name__ == "__main__":
    main()
