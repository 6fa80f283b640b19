"""Probe: is an int8 MXU matmul chain actually ~2x bf16 on v5e?

Times two Pallas kernels at DFNet-like shapes (512-wide stack, batch-tiled):
  - bf16: x @ w -> f32 accum -> cast back to bf16 (emulates act boundary)
  - int8: x @ w -> int32 accum -> f32 scale -> requantize to int8

Decision input for an int8 serving path (ops/fused_model.py): only worth
building if the int8 chain is meaningfully faster than bf16 at these shapes.

Timing per CLAUDE.md: iterations inside one jitted lax.fori_loop, >=50 steps,
scalar readback; weights passed as jit args (the relay rejects big embedded
constants).
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 131072
TILE = 1024
W = 512
LAYERS = 8
ITERS = 50


def _bf16_kernel(x_ref, w_ref, o_ref, *, layers):
    x = x_ref[...]
    for l in range(layers):
        y = jnp.dot(x, w_ref[l], preferred_element_type=jnp.float32)
        x = y.astype(jnp.bfloat16)  # act boundary; also defeats folding
    o_ref[...] = x


def _int8_kernel(x_ref, w_ref, s_ref, o_ref, *, layers):
    x = x_ref[...]
    for l in range(layers):
        y = jax.lax.dot_general(
            x, w_ref[l], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        f = y.astype(jnp.float32) * s_ref[0, l]
        # requantize for the next layer (round+clip+cast = the real per-layer
        # cost an int8 serving path pays)
        q = jnp.clip(jnp.round(f), -127.0, 127.0)
        x = q.astype(jnp.int8)
    o_ref[...] = x.astype(jnp.float32)


def run_bf16(x, w):
    grid = (B // TILE,)
    f = pl.pallas_call(
        functools.partial(_bf16_kernel, layers=LAYERS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LAYERS, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return f(x, w)


def run_int8(x, w, s):
    grid = (B // TILE,)
    f = pl.pallas_call(
        functools.partial(_int8_kernel, layers=LAYERS),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LAYERS, W, W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LAYERS), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return f(x, w, s)


def timed(fn, x, *args):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, *a, iters):
        def body(i, acc):
            # acc feedback prevents hoisting the loop-invariant kernel call
            # (bench.py pattern; an invariant body gets CSE'd to 1 call)
            xi = x + (acc * 0).astype(x.dtype)
            out = fn(xi, *a)
            return acc + out[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    lo, hi = 10, 10 + ITERS
    float(loop(x, *args, iters=lo))
    float(loop(x, *args, iters=hi))  # compile both
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x, *args, iters=lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(x, *args, iters=hi))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (hi - lo))
    return best


def main():
    rng = np.random.default_rng(0)
    flops = 2.0 * B * W * W * LAYERS

    xb = jnp.asarray(rng.normal(size=(B, W)), dtype=jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(LAYERS, W, W)) * 0.05,
                     dtype=jnp.bfloat16)
    t = timed(run_bf16, xb, wb)
    print(f"bf16: {t*1e3:.3f} ms/iter, {flops/t/1e12:.1f} TFLOP/s "
          f"({flops/t/197e12*100:.1f}% of bf16 peak)", flush=True)

    xi = jnp.asarray(rng.integers(-127, 128, size=(B, W)), dtype=jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, size=(LAYERS, W, W)),
                     dtype=jnp.int8)
    si = jnp.full((1, LAYERS), 1.0 / 64.0, dtype=jnp.float32)
    t8 = timed(run_int8, xi, wi, si)
    print(f"int8: {t8*1e3:.3f} ms/iter, {flops/t8/1e12:.1f} TOP/s "
          f"({flops/t8/394e12*100:.1f}% of int8 peak), "
          f"speedup vs bf16 {t/t8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
