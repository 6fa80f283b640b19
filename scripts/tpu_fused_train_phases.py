"""TPU experiment: per-phase roofline of the fused train-gradient kernel.

Run on the real chip (one process at a time, per CLAUDE.md):
    timeout 1500 python scripts/tpu_fused_train_phases.py

Attributes the fused train step's time at 20k / 65k / 131k pose-pair
batches to its components by timing kernel VARIANTS that drop phases:

  noisy full        A(fwd + inner pullback) + B + C(e-chain x2) + D(bwd x2)
  noisy first-order A(fwd) + B + D          (eikonal=False, normalize kept)
  manifold          A(fwd) + B + D          (no normalize; gt = 0)
  whole step        both branches + tree-add + Adam (the Trainer path)
  autodiff step     jax.value_and_grad + Adam (the XLA baseline)

Phase deltas:  eikonal machinery (inner pullback + eikonal loss + e-chain)
= noisy_full - noisy_first_order;  step overhead (launches, grad tree add,
Adam, loss scalars) = whole_step - noisy_full - manifold.

MFU accounting: the numerator is the MODEL's required FLOPs for the exact
objective gradient — taken from XLA's own cost model of the autodiff step
(identical math; chain of custody in ops/fused_train.py) — so autodiff and
fused MFU are directly comparable "useful FLOPs / peak" numbers.

Timing discipline per CLAUDE.md: 50-step diffs inside one jitted
fori_loop, scalar read back (the axon relay's block_until_ready returns
early and sub-150 ms windows sit inside relay jitter).
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
from posendf_tpu.ops.fused_train import _branch_core, _num_layers, _pad_rows
from posendf_tpu.training.trainer import make_optimizer, make_train_step

LO, HI = 2, 52
PEAK_FLOPS = 197e12  # v5e MXU (fp32 operands at the one-pass bf16 rate)
TILE = 2048


def timed(fn):
    fn()
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def loop_time_ms(make_call):
    """make_call(n) -> jitted scalar running the op n times; 50-step diff."""
    float(make_call(LO))
    float(make_call(HI))
    t_lo = timed(lambda: float(make_call(LO)))
    t_hi = timed(lambda: float(make_call(HI)))
    return (t_hi - t_lo) / (HI - LO) * 1e3


def branch_ms(params, q, gt, parents, *, normalize_input, eikonal, batch):
    """Time one _branch_core launch (loss-scalar readback keeps it live)."""
    qp = _pad_rows(q, TILE)
    gtp = _pad_rows(gt.reshape(-1, 1), TILE)

    @partial(jax.jit, static_argnames=("n",))
    def run(params, qp, gtp, n):
        def body(i, acc):
            # acc-dependent input defeats loop hoisting; 0-scaled so every
            # iteration computes on identical values
            outs = _branch_core(
                qp + 0.0 * acc, gtp, params["enc"], params["dfnet"],
                parents, activation="lrelu", beta=100.0, loss_type="l1",
                batch=batch, weight_loss=1.0, weight_eikonal=1.0,
                normalize_input=normalize_input, eikonal=eikonal,
                tile_b=TILE, compute_dtype="float32")
            return acc + outs[-1][0, 0]

        return jax.lax.fori_loop(0, n, body, 0.0)

    return loop_time_ms(lambda n: run(params, qp, gtp, n))


def step_ms(step, params, opt_state, batch):
    @partial(jax.jit, static_argnames=("n",))
    def loop(p, s, b, n):
        def body(i, carry):
            p, s = carry
            p, s, _ = step(p, s, b)
            return (p, s)

        p, s = jax.lax.fori_loop(0, n, body, (p, s))
        return jnp.sum(jax.tree_util.tree_leaves(p)[0])

    return loop_time_ms(lambda n: loop(params, opt_state, batch, n))


def main():
    module = PoseNDF(live_head=True)
    key = jax.random.key(0)
    params = module.init(key, jnp.zeros((1, 21, 4)))["params"]
    parents = tuple(module.parents)
    L = _num_layers(params["dfnet"])
    del L
    opt = make_optimizer(1e-4)
    opt_state = opt.init(params)
    w = {"dist": 1.0, "man_loss": 1.0, "eikonal": 1.0}
    auto_step = make_train_step(module, opt, loss_type="l1", weights=w)
    fused_step = make_train_step(module, opt, loss_type="l1", weights=w,
                                 fused=True, fused_tile=TILE)

    batches = (tuple(int(a) for a in sys.argv[1:])
               or (20_000, 65_536, 131_072))
    for B in batches:
        kq, km, kd = jax.random.split(jax.random.key(B), 3)
        q = jax.random.normal(kq, (B, 21, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        man = jax.random.normal(km, (B, 21, 4))
        man = man / jnp.linalg.norm(man, axis=-1, keepdims=True)
        gt = jnp.abs(jax.random.normal(kd, (B,)))
        batch = {"pose": q, "dist": gt, "man_poses": man}

        # model FLOPs for the full objective gradient, from XLA's cost model
        ca = jax.jit(auto_step).lower(params, opt_state, batch) \
            .compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca["flops"])

        noisy_full = branch_ms(params, q, gt, parents,
                               normalize_input=True, eikonal=True, batch=B)
        noisy_fo = branch_ms(params, q, gt, parents,
                             normalize_input=True, eikonal=False, batch=B)
        manifold = branch_ms(params, man, jnp.zeros((B,)), parents,
                             normalize_input=False, eikonal=False, batch=B)
        whole = step_ms(fused_step, params, opt_state, batch)
        auto = step_ms(auto_step, params, opt_state, batch)

        eik_cost = noisy_full - noisy_fo
        overhead = whole - noisy_full - manifold
        mfu_fused = flops / (whole * 1e-3) / PEAK_FLOPS * 100
        mfu_auto = flops / (auto * 1e-3) / PEAK_FLOPS * 100
        print(f"\n=== B = M = {B} (tile {TILE}) — objective-grad FLOPs "
              f"{flops / 1e9:.1f} GF ===", flush=True)
        print(f"  noisy full (A+B+C+D)     {noisy_full:8.3f} ms")
        print(f"  noisy first-order (A+B+D){noisy_fo:8.3f} ms")
        print(f"    -> eikonal machinery   {eik_cost:8.3f} ms "
              f"({eik_cost / noisy_full * 100:.0f}% of the noisy branch)")
        print(f"  manifold (A+D)           {manifold:8.3f} ms")
        print(f"  whole fused step         {whole:8.3f} ms "
              f"(overhead {overhead:+.3f} ms) -> {mfu_fused:.1f}% MFU")
        print(f"  autodiff step            {auto:8.3f} ms "
              f"-> {mfu_auto:.1f}% MFU ({auto / whole:.2f}x slower)",
              flush=True)


if __name__ == "__main__":
    main()
