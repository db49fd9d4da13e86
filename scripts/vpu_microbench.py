"""Reconcile the VPU-utilisation receipts with measured kernel costs.

VERDICT r2 weak #2: ``bench.py`` estimated ~55% of the VPU issue limit from
an analytic op model (3 vector ops per median-pass element + 20 misc), while
RESULTS.md claimed ~80% from a trace — both cannot hold.  This script
measures, on the real TPU:

  C. a pure-VPU reference kernel — EIGHT independent multiply chains per
     element (a single chain is latency-bound, ILP=1, and measures pipeline
     depth, not throughput) -> the empirically achievable vector-op/s
     ceiling;
  D. a kernel running ONLY the radix-median loop at two pass counts -> the
     isolated marginal cost of one pass per element, in measured
     add-equivalents (calibrated against C);
  A/B. the full fused posterior kernel at two pass counts -> the median's
     share of a real eval and the end-to-end evals/s.

Timings use min-of-3 repeated means (robust to host-side contention; the
axon tunnel has a ~1 ms dispatch floor, so per-call device work is kept at
several ms).  Run on an otherwise QUIET machine:

    nohup python scripts/vpu_microbench.py > /tmp/vpu_micro.log 2>&1 &
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk

NW = 32768
BLOCK = 256
PEAK_VPU_OPS = 4 * 8 * 128 * 0.94e9  # v5e: 4 ALUs x (8,128) lanes x 940 MHz


def _time(fn, *args, n=20, warmup=3, reps=3):
    """min over ``reps`` of the mean time of ``n`` calls (contention-robust)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


# --- C: pure-VPU ceiling (8 independent chains -> ILP-limited, not latency) --

def _mulchains_kernel(x_ref, o_ref, *, k, lanes=8):
    x = x_ref[:]
    cs = [jnp.float32(1.0 + 1e-7 * (j + 1)) for j in range(lanes)]
    ys = [x * cs[j] for j in range(lanes)]
    for _ in range(k - 1):
        ys = [ys[j] * cs[j] for j in range(lanes)]
    acc = ys[0]
    for j in range(1, lanes):
        acc = acc + ys[j]
    o_ref[:] = acc


def vpu_ceiling(k=24, lanes=4, nd=1792):
    x = jnp.ones((NW, nd), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_mulchains_kernel, k=k, lanes=lanes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NW // BLOCK,),
            in_specs=[pl.BlockSpec((BLOCK, nd), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((BLOCK, nd), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NW, nd), jnp.float32),
    )(x))
    dt = _time(f, x)
    ops = NW * nd * (k * lanes + lanes)  # lanes mults per elem per iter + sum
    return ops / dt, dt


# --- D: median-only kernel --------------------------------------------------

def _median_kernel(x_ref, o_ref, *, iters):
    o_ref[:] = pk._row_median_nonneg(x_ref[:], iters=iters)


def median_only(iters, x):
    nd = x.shape[1]
    f = jax.jit(lambda x: pl.pallas_call(
        functools.partial(_median_kernel, iters=iters),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NW // BLOCK,),
            in_specs=[pl.BlockSpec((BLOCK, nd), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NW, 1), jnp.float32),
    )(x))
    return _time(f, x)


# --- A/B: full fused posterior at two pass counts ---------------------------

def fused_eval_time(tgt, coords, iters):
    import dataclasses

    t = dataclasses.replace(tgt, median_iters=iters)
    f = jax.jit(lambda p: pk.log_posterior_fused(p, t))
    return _time(f, coords)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    nd = tgt.D.shape[2]
    coords = init_walker_batch(tgt, truth, NW, jnp.float32)
    elems = NW * nd

    ceil, dt_c = vpu_ceiling(nd=nd)
    print(f"[C] pure-VPU 8-chain multiply: {ceil/1e12:.2f} T ops/s "
          f"({100*ceil/PEAK_VPU_OPS:.0f}% of the 4-ALU issue-limit model; "
          f"{dt_c*1e3:.2f} ms/call)", flush=True)

    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (NW, nd), jnp.float32))
    t31 = median_only(31, x)
    t15 = median_only(15, x)
    per_pass = (t31 - t15) / 16
    print(f"[D] median-only: iters=31 {t31*1e3:.2f} ms, iters=15 {t15*1e3:.2f} ms")
    print(f"    marginal per-pass: {per_pass*1e3:.3f} ms = "
          f"{elems/per_pass/1e12:.2f} T elem/s = "
          f"{ceil*per_pass/elems:.2f} measured mult-equivalents per element "
          f"(analytic model said 3)", flush=True)

    f31 = fused_eval_time(tgt, coords, 31)
    f20 = fused_eval_time(tgt, coords, 20)
    fpp = (f31 - f20) / 11
    print(f"[A] fused posterior eval (NW=32768): iters=31 {f31*1e3:.2f} ms "
          f"({NW/f31/1e6:.1f}M evals/s), iters=20 {f20*1e3:.2f} ms "
          f"({NW/f20/1e6:.1f}M evals/s)")
    print(f"[B] fused marginal per-pass {fpp*1e3:.3f} ms "
          f"(median-only said {per_pass*1e3:.3f} ms)")
    print(f"    median-loop share of the fused eval: "
          f"{100*31*fpp/f31:.0f}% (31 x marginal)")
    rest = f31 - 31 * fpp
    print(f"    non-median remainder: {rest*1e3:.2f} ms = "
          f"{ceil*rest/elems:.1f} mult-equivalents per element")
    print(f"    per-pass cost {ceil*per_pass/elems:.2f} vs analytic 3 ops -> "
          f"the round-2 op model under-counted by "
          f"{ceil*per_pass/elems/3:.2f}x; bench.py receipts updated with the "
          f"measured equivalents")

    # --- E: overdetermine the 2-parameter model (VERDICT r3 next #5) --------
    # f(k) = rest + k*per_pass was calibrated on exactly two points (k=31,20),
    # which a 2-parameter model always "reproduces".  Falsifiable test: the
    # SAME parameters must predict (i) additional pass counts at the same
    # shape with no refit, and (ii) a different data width after pure
    # per-element scaling (residual there measures the non-nd-scaling share
    # of `rest`: per-block overhead + photometry/prior matmuls).
    print("\n[E] overdetermination (no refit):", flush=True)
    for k in (16, 12):
        fk = fused_eval_time(tgt, coords, k)
        pred = rest + k * fpp
        print(f"    fused k={k} nd={nd}: measured {fk*1e3:.2f} ms, "
              f"model {pred*1e3:.2f} ms, residual "
              f"{100*(fk-pred)/fk:+.1f}%", flush=True)
    nd2 = 896
    tgt2, truth2 = build_bench_target(jnp.float32, nd=nd2)
    coords2 = init_walker_batch(tgt2, truth2, NW, jnp.float32)
    for k in (31, 16):
        fk = fused_eval_time(tgt2, coords2, k)
        pred = (rest + k * fpp) * (nd2 / nd)
        print(f"    fused k={k} nd={nd2}: measured {fk*1e3:.2f} ms, "
              f"per-element-scaled model {pred*1e3:.2f} ms, residual "
              f"{100*(fk-pred)/fk:+.1f}% (the non-nd-scaling share of rest)",
              flush=True)


if __name__ == "__main__":
    main()
