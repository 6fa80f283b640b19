"""TPU experiment: fused train-gradient kernel vs autodiff, tile sweep.

Run on the real chip (one process at a time, per CLAUDE.md):
    timeout 1500 python scripts/tpu_fused_train_sweep.py

Times one full train step (loss + grads + Adam) at the bench's 20k-pose
batch for the XLA autodiff path and the fused kernel at several batch
tiles, via the Trainer's own ``make_train_step(fused_tile=)`` knob.
Iterations ride one jitted fori_loop with a scalar read back, so the axon
relay's early-return block_until_ready cannot skew the numbers; the diff
spans 50 steps because 10-step diffs (~50 ms at these step times) sit
inside the relay's jitter and have misled tile choices before
(ops/fused_train.py tile history).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from posendf_tpu.models import PoseNDF
from posendf_tpu.training.trainer import make_optimizer, make_train_step

LO, HI = 2, 52  # 50-step diff


def timed(fn):
    fn()
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    B, M = 20000, 20000
    module = PoseNDF(live_head=True)  # dead-head init has all-zero grads
    key = jax.random.key(0)
    params = module.init(key, jnp.zeros((1, 21, 4)))["params"]
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    kq, km, kd = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, 21, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    man = jax.random.normal(km, (M, 21, 4))
    man = man / jnp.linalg.norm(man, axis=-1, keepdims=True)
    batch = {"pose": q, "dist": jnp.abs(jax.random.normal(kd, (B,))),
             "man_poses": man}
    w = {"dist": 1.0, "man_loss": 1.0, "eikonal": 1.0}

    def measure(step, tag):
        @partial(jax.jit, static_argnames=("n",))
        def loop(p, s, b, n):
            def body(i, carry):
                p, s = carry
                p, s, _ = step(p, s, b)
                return (p, s)

            p, s = jax.lax.fori_loop(0, n, body, (p, s))
            return jnp.sum(jax.tree_util.tree_leaves(p)[0])

        float(loop(params, opt_state, batch, LO))
        float(loop(params, opt_state, batch, HI))
        t_lo = timed(lambda: float(loop(params, opt_state, batch, LO)))
        t_hi = timed(lambda: float(loop(params, opt_state, batch, HI)))
        ms = (t_hi - t_lo) / (HI - LO) * 1e3
        print(f"{tag:28s} {ms:8.3f} ms/step", flush=True)
        return ms

    base_step = make_train_step(module, opt, loss_type="l1", weights=w)
    base = measure(base_step, "autodiff")

    # one-step numeric cross-check on the real chip
    _, _, m_ref = jax.jit(base_step)(params, opt_state, batch)
    fused_step0 = make_train_step(module, opt, loss_type="l1", weights=w,
                                  fused=True)
    _, _, m_fused = jax.jit(fused_step0)(params, opt_state, batch)
    for k in ("total", "dist", "man_loss", "eikonal"):
        print(f"  {k}: autodiff {float(m_ref[k]):.6f}  "
              f"fused {float(m_fused[k]):.6f}", flush=True)

    for tile in (512, 1024, 2048, 4096):
        try:
            step = make_train_step(module, opt, loss_type="l1", weights=w,
                                   fused=True, fused_tile=tile)
            ms = measure(step, f"fused tile_b={tile}")
            print(f"  -> {base / ms:.2f}x autodiff", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must survive OOM tiles
            print(f"fused tile_b={tile} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
