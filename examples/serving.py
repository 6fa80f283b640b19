"""Serving demo: high-throughput batch pose generation on TPU.

The production inference pattern for the pose prior: take a large batch of
candidate poses (random init here; in practice e.g. network predictions or
retrieval results) and project them all onto the learned manifold with the
single-kernel fused projection path (``ops/fused_grad.py``).

    python examples/serving.py [--batch 131072] [--steps 50] [--ckpt PATH]

On a v5e chip, 131k poses x 50 projection steps complete in ~0.34 s
(~19M pose-steps/s) — 3.5x the already-jitted XLA scan; at tile 1024 the
fused path wins at every batch size, so it is used whenever a TPU backend
is present. With ``--ckpt`` it serves a real trained field (either an
Orbax directory or a reference-format torch ``.tar``); without, an
untrained softplus model demonstrates the mechanics hermetically.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=131072)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--ckpt", default=None,
                    help="Orbax checkpoint dir or reference torch .tar")
    ap.add_argument("--int8", action="store_true",
                    help="also serve the VALUE path through the int8-MXU "
                         "kernel (post-training quantization on a slice of "
                         "the serving batch; ~1.6x the f32 fused forward "
                         "on v5e) and report the int8-vs-f32 agreement")
    ap.add_argument("--quantized", default=None,
                    help="saved QuantizedField file (cli export "
                         "--save-quantized); implies --int8, skips "
                         "calibration")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from posendf_tpu.config import PoseNDFConfig
    from posendf_tpu.projection import project, random_poses

    cfg = PoseNDFConfig()
    if args.ckpt is None:
        # untrained demo model; softplus so field values are non-trivial
        cfg.dfnet.act = "softplus"
        cfg.strenc.act = "softplus"
    module = cfg.make_model()
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    if args.ckpt is not None:
        if args.ckpt.endswith(".tar"):
            from posendf_tpu.training.torch_import import load_torch_checkpoint
            params, epoch = load_torch_checkpoint(args.ckpt)
            print(f"loaded torch checkpoint (epoch {epoch})")
        else:
            from posendf_tpu.training.checkpoints import CheckpointStore
            restored = CheckpointStore(args.ckpt).restore({"params": params})
            if restored is None:
                raise SystemExit(f"no checkpoint found under {args.ckpt}")
            params = restored[0]["params"]
            print(f"loaded Orbax checkpoint (epoch {restored[1]})")

    dev = jax.devices()[0]
    print(f"device: {dev}; batch {args.batch} x {args.steps} steps")
    poses = jax.device_put(random_poses(jax.random.key(1), args.batch), dev)

    # Pallas TPU kernels run only on a TPU backend (not GPU or other PJRT
    # platforms); XLA path everywhere else
    fused = dev.platform == "tpu"

    # keep the timed computation scalar-returning: returning the full
    # (steps, B) history through a remote-TPU relay adds transfer time, and
    # relayed ``block_until_ready`` can return early — a scalar readback is
    # the only hard sync (see bench.py)
    @jax.jit
    def run(p):
        out, hist = project(module, params, p, steps=args.steps, fused=fused)
        return hist[0].mean(), hist[-1].mean(), jnp.sum(out)

    d0, d1, _ = run(poses)          # compile
    float(d1)
    t0 = time.perf_counter()
    d0, d1, _ = run(poses)
    final_mean = float(d1)          # scalar readback = hard sync
    dt = time.perf_counter() - t0

    rate = args.batch * args.steps / dt
    print(f"path: {'fused kernel' if fused else 'XLA scan'}")
    print(f"{dt:.4f} s -> {rate/1e6:.1f}M pose-steps/s")
    print(f"mean field distance: {float(d0):.3e} -> {final_mean:.3e}")

    if args.int8 or args.quantized:
        # ---- int8 value path: the high-throughput batch-scoring serving
        # mode (pose -> distance, no gradients) through the int8-MXU kernel
        from posendf_tpu.field import QuantizedField, make_field

        field = make_field(module, params)
        if args.quantized:
            qf = QuantizedField.load(args.quantized)
            print(f"loaded quantized field from {args.quantized}")
        else:
            # calibrate on a slice of the serving distribution itself
            qf = field.quantize_int8(poses[: min(args.batch, 8192)])
        win = tuple(qf.qparams["window"])
        print(f"int8 window: layers {win[0]}..{win[1] - 1} quantized")

        import functools

        @jax.jit
        def f32_val(p):
            return field.distance_fused(p) if fused else field.distance(p)

        @jax.jit
        def int8_val(p):
            return qf.distance(p) if fused else qf.distance_xla(p)

        # throughput: iterations INSIDE one jitted fori_loop, timed as a
        # two-point iteration diff so the dispatch round-trip cancels — a
        # single 131k forward is ~2 ms of device compute, far below the
        # ~30 ms relay RTT and its jitter (same pattern as bench.py; the
        # acc*0 feedback keeps the loop body from being hoisted)
        def loop(val_fn):
            @functools.partial(jax.jit, static_argnames=("iters",))
            def run(p, iters):
                def body(i, acc):
                    return acc + jnp.sum(val_fn(p + acc * 0))

                return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

            return run

        def rate(val_fn, lo=10, hi=40):
            run = loop(val_fn)
            float(run(poses, lo)), float(run(poses, hi))   # compile both
            t = {}
            for n in (lo, hi):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(run(poses, n))      # scalar readback = hard sync
                    best = min(best, time.perf_counter() - t0)
                t[n] = best
            return args.batch * (hi - lo) / (t[hi] - t[lo])

        r_f32, r_int8 = rate(f32_val), rate(int8_val)
        d_f32, d_int8 = f32_val(poses), int8_val(poses)
        err = jnp.abs(d_int8 - d_f32)
        std = float(jnp.std(d_f32)) or 1.0
        print(f"value path: f32 {r_f32 / 1e6:.1f}M evals/s, "
              f"int8 {r_int8 / 1e6:.1f}M evals/s ({r_int8 / r_f32:.2f}x)")
        print(f"int8 agreement: MAE {float(jnp.mean(err)):.2e} "
              f"({100 * float(jnp.mean(err)) / std:.2f}% of f32 std), "
              f"max {float(jnp.max(err)):.2e}")


if __name__ == "__main__":
    main()
