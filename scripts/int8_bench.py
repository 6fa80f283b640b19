"""Time the int8 whole-model kernel vs the f32/bf16 fused forward on TPU.

Sweeps the int8 kernel's batch tile and prints evals/s for each, plus the
f32 fused forward measured the same way in the same session (so relay
conditions cancel). bench.py's timing discipline: iterations inside one
jitted fori_loop with acc feedback, lo/hi diff to cancel dispatch RTT.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from posendf_tpu.config import PoseNDFConfig
from posendf_tpu.field import Field
from posendf_tpu.ops.fused_int8 import fused_posendf_forward_int8
from posendf_tpu.ops.fused_model import fused_posendf_forward

B = 1 << 17


def unit_poses(rng, n):
    q = rng.normal(size=(n, 21, 4)).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def measure(step_fn, pose, lo=10, hi=60):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(pose, iters):
        def body(i, acc):
            d = step_fn(pose + acc * 0)
            return acc + jnp.sum(d)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(pose, iters=lo))
    float(loop(pose, iters=hi))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(pose, iters=lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(pose, iters=hi))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (hi - lo))
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    cfg = PoseNDFConfig()
    module = cfg.make_model().clone(live_head=True)
    params = module.init(jax.random.key(0), jnp.zeros((1, 21, 4)))["params"]
    field = Field(module, params)
    rng = np.random.default_rng(0)
    qfield = field.quantize_int8(unit_poses(rng, 4096))
    pose = jax.device_put(unit_poses(rng, B), jax.devices()[0])

    t = measure(lambda p: fused_posendf_forward(
        p, params["enc"], params["dfnet"], parents=module.parents,
        activation=module.activation, beta=module.beta, tile_b=2048), pose)
    print(f"f32 fused tile 2048: {t*1e3:.3f} ms, {B/t/1e6:.1f}M evals/s",
          flush=True)

    for tile in (8192, 16384):
        try:
            t8 = measure(lambda p, tb=tile: fused_posendf_forward_int8(
                p, qfield.qparams, parents=module.parents,
                activation=module.activation, beta=module.beta,
                tile_b=tb), pose)
            print(f"int8 fused tile {tile}: {t8*1e3:.3f} ms, "
                  f"{B/t8/1e6:.1f}M evals/s, {t/t8:.2f}x f32", flush=True)
        except Exception as e:
            print(f"int8 tile {tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
