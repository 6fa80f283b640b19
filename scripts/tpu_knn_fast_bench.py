"""TPU experiment: the 'fast' labeling engine vs the fused-kNN baselines.

Run on the real chip (one process at a time, per CLAUDE.md):
    timeout 1500 python scripts/tpu_knn_fast_bench.py

Measures fused_geodesic_topk (dot_impl='vpu' exact and 'mxu_bf16'
approximate) against fused_geodesic_topk_fast (single-MXU-pass
upper-bound prescreen + exact fp32 rerank, ops/fused_knn.py) at 262k and
1M corpora, then checks the fast path's exactness contract ON DEVICE
(compiled, not interpret) over pose-like clusters — the check that caught
the DEFAULT-precision bound reordering near-tie candidates (top-5
identity 95.8% -> fixed by the kernel's 3-pass bf16 split, identity 1.0).

Numbers of record (2026-08-20, v5e, Q=4096, k=5):
    262k: vpu 38.7k qps | mxu_bf16 63.6k | fast 90.5k (shipped 3-pass
          split; the broken single-pass bf16 bound measured 92.8k at
          95.8% identity, HIGHEST 78.9k)
    1M:   vpu 11.9k | mxu_bf16 21.4k | fast 40.4k (43.9k broken bf16,
          35.6k HIGHEST); fast tile sweep: (256,8192) best, (512,2048)
          regresses 1.8x. Shipped split: identity 1.0, dist err 0.0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from posendf_tpu.ops.fused_knn import (fused_geodesic_topk,
                                       fused_geodesic_topk_fast)
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
    print("backend:", jax.default_backend(), jax.devices(), file=sys.stderr)
    q = jax.random.normal(jax.random.key(1), (Q, 21, 4), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    out = {}
    for name, n in (("262k", 1 << 18), ("1m", 1 << 20)):
        c = jax.random.normal(jax.random.key(11), (n, 21, 4), jnp.float32)
        c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
        for impl in ("vpu", "mxu_bf16"):

            @jax.jit
            def once(q, c, impl=impl):
                d, i = fused_geodesic_topk(q, c, K, dot_impl=impl)
                return jnp.sum(d) + i[0, 0]

            float(once(q, c))
            out[f"{name}_{impl}_qps"] = Q / timed(lambda: once(q, c))
            print(name, impl, out[f"{name}_{impl}_qps"], file=sys.stderr)

        @jax.jit
        def fast_once(q, c):
            d, i = fused_geodesic_topk_fast(q, c, K)
            return jnp.sum(d) + i[0, 0]

        float(fast_once(q, c))
        out[f"{name}_fast_qps"] = Q / timed(lambda: fast_once(q, c))
        print(name, "fast", out[f"{name}_fast_qps"], file=sys.stderr)

    # exactness ON DEVICE: pose-like clusters (the labeling workload)
    rng = np.random.default_rng(0)
    axis = rng.normal(size=(256, 21, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    th = rng.uniform(0, 2.0, size=(256, 21, 1)).astype(np.float32)
    base = np.concatenate([np.cos(th / 2), np.sin(th / 2) * axis], -1)
    c_np = np.repeat(base, 32, 0)
    c_np = c_np + 0.05 * rng.normal(size=c_np.shape).astype(np.float32)
    c_np /= np.linalg.norm(c_np, axis=-1, keepdims=True)
    q_np = c_np[::64] + 0.05 * rng.normal(size=(128, 21, 4)).astype(np.float32)
    q_np /= np.linalg.norm(q_np, axis=-1, keepdims=True)
    qs, cs = jnp.asarray(q_np), jnp.asarray(c_np)
    d_ref, i_ref = geodesic_topk(qs, cs, K)
    d, i = fused_geodesic_topk_fast(qs, cs, K)
    out["device_top5_identity"] = float(
        jnp.mean((jnp.sort(i, 1) == jnp.sort(i_ref, 1)).astype(jnp.float32)))
    out["device_dist_max_err"] = float(jnp.abs(d - d_ref).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
