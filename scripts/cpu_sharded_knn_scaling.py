"""Virtual-mesh sharded-kNN scaling evidence (compute-only, compiler-verified).

Context (VERDICT r2 #7): the recorded TPU artifact `knn_sharded_qps` is
end-to-end through the axon relay, where per-batch host I/O dominates and
the sharded path looks SLOWER than the single-chip kernel. This script
isolates the partition itself on an N-device virtual CPU mesh
(``--xla_force_host_platform_device_count``).

THIS HOST HAS 1 PHYSICAL CORE, so wall-clock on the virtual mesh cannot
show parallel speedup (all N virtual devices time-share one core — a
faithful N-chip wall-clock here is physically impossible). What CAN be
established, and is recorded in docs/ARCHITECTURE.md:

  1. per-device FLOPs of the compiled sharded search = total / N exactly
     (XLA's own cost model of the SPMD-partitioned per-device module),
  2. the partitioned HLO contains ZERO collectives (queries sharded over
     'data', corpus replicated -> each chip scans the corpus locally; the
     design of SURVEY §2.2), so scaling has no ICI term at all,
  3. total wall-clock across mesh sizes stays ~flat on the 1-core host
     (the same total work, time-shared) — consistent with (1) + (2):
     on N real chips the same program runs the 1/N per-device module
     concurrently with no communication, i.e. linearly.

Run:  python scripts/cpu_sharded_knn_scaling.py
"""

import os
import sys
import time
from functools import partial

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", ""))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon,cpu

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402

from posendf_tpu.ops.knn import geodesic_topk  # noqa: E402

Q, N, K = 2048, 32768, 5


def build(mesh):
    fn = jax.jit(jax.shard_map(
        partial(geodesic_topk, k=K),
        mesh=mesh, in_specs=(P("data"), P()),
        out_specs=(P("data"), P("data")), check_vma=False))
    return fn


def main():
    devs = jax.devices()
    assert len(devs) >= 8, devs
    rng = np.random.default_rng(0)
    q = rng.standard_normal((Q, 21, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    c = rng.standard_normal((N, 21, 4)).astype(np.float32)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)

    print(f"search: Q={Q} x corpus N={N}, k={K}; host cores: {os.cpu_count()}")
    base_flops = None
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(devs[:n]), ("data",))
        fn = build(mesh)
        lowered = fn.lower(jnp.asarray(q), jnp.asarray(c))
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca["flops"])  # per-device module under SPMD
        if base_flops is None:
            base_flops = flops
        # collectives on the critical path? (design: none — corpus
        # replicated, queries sharded)
        hlo = compiled.as_text()
        colls = sum(hlo.count(op) for op in
                    ("all-reduce", "all-gather", "reduce-scatter",
                     "collective-permute", "all-to-all"))
        d, i = fn(q, c)
        jax.block_until_ready((d, i))
        t0 = time.perf_counter()
        d, i = fn(q, c)
        jax.block_until_ready((d, i))
        dt = time.perf_counter() - t0
        print(f"  mesh={n}: per-device GFLOPs {flops / 1e9:8.3f} "
              f"(= total/{base_flops / flops:.2f}), collectives in HLO: "
              f"{colls}, 1-core wall {dt * 1e3:7.1f} ms")

    # correctness across mesh sizes: identical results
    mesh1 = Mesh(np.array(devs[:1]), ("data",))
    mesh8 = Mesh(np.array(devs[:8]), ("data",))
    d1, i1 = jax.tree.map(np.asarray, build(mesh1)(q, c))
    d8, i8 = jax.tree.map(np.asarray, build(mesh8)(q, c))
    print(f"  1-dev vs 8-dev: max |d| diff {float(np.max(np.abs(d1 - d8))):.2e}, "
          f"idx equal: {bool(np.all(i1 == i8))}")


if __name__ == "__main__":
    main()
