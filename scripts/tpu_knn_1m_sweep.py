"""TPU experiment: fused-kNN tile sweep at AMASS scale (1M-row corpus).

Run on the real chip (one process at a time, per CLAUDE.md):
    timeout 1500 python scripts/tpu_knn_1m_sweep.py

The shipped tile default (256 x 2048) was swept at a 262k corpus
(ops/fused_knn.py header); VERDICT r2 #4 asks whether the bowl moves at
10^6 rows, where the corpus slab streams through VMEM ~4x longer per
query tile. Corpus is generated ON DEVICE (336 MB through the ~10 MB/s
relay would be ~35 s of meaningless upload).

Timing: each search at this scale runs ~0.3-0.5 s — far above the relay
jitter floor (~150 ms) — so single dispatches with scalar readback and
best-of-3 suffice (no fori_loop needed).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from posendf_tpu.ops.fused_knn import fused_geodesic_topk
from posendf_tpu.ops.knn import geodesic_topk

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

    for N in (1 << 20, 1 << 21):
        c = jax.random.normal(kc, (N, 21, 4), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        print(f"\n=== corpus N = {N} ({N * 84 * 4 / 1e6:.0f} MB) ===",
              flush=True)

        for tile_q, tile_t in ((256, 2048), (256, 4096), (256, 8192),
                               (512, 2048), (512, 4096), (128, 2048)):
            fn = jax.jit(lambda q, c, tq=tile_q, tt=tile_t: (
                lambda di: jnp.sum(di[0]) + di[1][0, 0])(
                fused_geodesic_topk(q, c, K, tile_q=tq, tile_t=tt)))
            try:
                float(fn(q, c))  # compile
                s = timed(lambda: fn(q, c))
                print(f"  fused tile ({tile_q:4d},{tile_t:5d}): "
                      f"{s * 1e3:8.1f} ms  {Q / s:9.1f} qps", flush=True)
            except Exception as e:
                print(f"  fused tile ({tile_q:4d},{tile_t:5d}): FAILED "
                      f"{type(e).__name__}: {e}", flush=True)

        xla = jax.jit(lambda q, c: (
            lambda di: jnp.sum(di[0]) + di[1][0, 0])(
            geodesic_topk(q, c, k=K)))
        float(xla(q, c))
        s = timed(lambda: xla(q, c))
        print(f"  XLA exact             : {s * 1e3:8.1f} ms  {Q / s:9.1f} qps",
              flush=True)
        del c


if __name__ == "__main__":
    main()
