"""TPU experiment: VPU vs MXU per-joint dots in the fused kNN kernel.

Run on the real chip (one process at a time, per CLAUDE.md):
    timeout 2400 python scripts/tpu_knn_mxu_ab.py

The fused kernel's distance tile historically used 84 VPU broadcast-FMA
passes (exact fp32). `dot_impl="mxu"` issues the 21 per-joint (TQ,4)@(4,TT)
dots on the systolic array at HIGHEST precision (stacked bf16 passes,
~1e-7 of fp32) and `"mxu_bf16"` at single-pass DEFAULT (~1e-3). This
script measures, at 262k and 1M corpora:

  - qps for each impl (and a tile_q=512 variant — the MXU prefers M=512),
  - top-5 neighbor-IDENTITY rate vs the exact VPU kernel,
  - max |distance delta| vs exact.

Timing: single dispatches with scalar readback, best-of-3 (search time
>> relay jitter at these scales).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from posendf_tpu.ops.fused_knn import fused_geodesic_topk

Q, K = 4096, 5


def timed(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    kq, kc = jax.random.split(jax.random.key(11))
    q = jax.random.normal(kq, (Q, 21, 4), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    for N in (1 << 18, 1 << 20):
        c = jax.random.normal(kc, (N, 21, 4), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        print(f"\n=== corpus N = {N} ===", flush=True)

        # exact reference result (VPU kernel) — download once
        dv, iv = fused_geodesic_topk(q, c, K)
        dv_np, iv_np = np.asarray(dv), np.asarray(iv)

        for impl, tq in (("vpu", 256), ("mxu", 256), ("mxu", 512),
                         ("mxu_bf16", 256), ("mxu_bf16", 512)):
            fn = jax.jit(lambda q, c, im=impl, t=tq: (
                lambda di: jnp.sum(di[0]) + di[1][0, 0])(
                fused_geodesic_topk(q, c, K, dot_impl=im, tile_q=t)))
            try:
                float(fn(q, c))  # compile
                s = timed(lambda: fn(q, c))
                d, i = fused_geodesic_topk(q, c, K, dot_impl=impl, tile_q=tq)
                d_np, i_np = np.asarray(d), np.asarray(i)
                # identity as SETS per row (tie order may differ)
                same = np.mean([set(a) == set(b)
                                for a, b in zip(i_np, iv_np)])
                dd = float(np.max(np.abs(d_np - dv_np)))
                print(f"  {impl:9s} tile_q={tq:4d}: {s * 1e3:8.1f} ms "
                      f"{Q / s:9.1f} qps | top-{K} set identity "
                      f"{same * 100:6.2f}% | max|dd| {dd:.2e}", flush=True)
            except Exception as e:
                print(f"  {impl:9s} tile_q={tq:4d}: FAILED "
                      f"{type(e).__name__}: {e}", flush=True)
        del c


if __name__ == "__main__":
    main()
