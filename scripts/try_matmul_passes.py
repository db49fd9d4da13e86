"""Experiment: fewer bf16 passes in the f32-accurate MXU matmul.

``_dot_f32`` emulates f32 matmuls with the classic bf16x6 scheme (six MXU
passes over the 3-way bf16 splits, ~2.5e-7 relative).  The model matmul is
~18% of the fused eval (receipt reconciliation, benchmarks/RESULTS.md), so
dropping the three O(eps^2) cross terms (hl, mm, lh -> bf16x3, expected
~3*eps_bf16^2 ~= 4.6e-5 relative) could buy up to ~9% headline — IF the
accuracy loss stays below what the chi^2 can see (data errors are ~1%, but
the 5e-5 kernel-parity gate is the guard rail).

Measures, at the bench shapes: per-variant eval time, max |relative
log-posterior deviation| vs the 6-pass reference, and the implied posterior
safety margin.

Run on a QUIET TPU box:
    nohup python scripts/try_matmul_passes.py > /tmp/matmul_passes.log 2>&1 &
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk

NW = 32768


def _dot_variant(n_passes):
    def dot(a, b):
        ah, am, al = pk._split3(a)
        bh, bm, bl = pk._split3(b)
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
        if n_passes == 6:
            out = d(al, bh)
            out += d(am, bm)
            out += d(ah, bl)
            out += d(am, bh)
            out += d(ah, bm)
            out += d(ah, bh)
        elif n_passes == 3:
            out = d(am, bh)
            out += d(ah, bm)
            out += d(ah, bh)
        elif n_passes == 1:
            out = d(ah, bh)
        else:
            raise ValueError(n_passes)
        return out
    return dot


def _time(f, x, n=20, reps=3):
    out = f(x)
    out.block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(x)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    coords = init_walker_batch(tgt, truth, NW, jnp.float32)

    results = {}
    orig = pk._dot_f32
    try:
        for n_passes in (6, 3, 1):
            pk._dot_f32 = _dot_variant(n_passes)
            # fresh trace (the module-level jit cache would ignore the patch)
            f = jax.jit(lambda p: pk.log_posterior_fused.__wrapped__(p, tgt))
            vals = np.asarray(f(coords))
            dt = _time(f, coords)
            results[n_passes] = (vals, dt)
            print(f"[{n_passes}-pass] {dt*1e3:.2f} ms ({NW/dt/1e6:.1f}M evals/s)",
                  flush=True)
    finally:
        pk._dot_f32 = orig

    ref, dt6 = results[6]
    fin = np.isfinite(ref)
    for n_passes in (3, 1):
        vals, dt = results[n_passes]
        dv = np.abs(vals[fin] - ref[fin])
        rel = dv / np.maximum(np.abs(ref[fin]), 1e-12)
        print(f"[{n_passes}-pass] vs 6-pass: max |dlogpost| {dv.max():.3e} "
              f"(rel {rel.max():.2e}); speedup {dt6/dt:.3f}x")
        # a log-posterior error of e shifts acceptance odds by ~e; values
        # below ~1e-3 are far below stretch-move stochasticity
    print("\ndecision rule: adopt a variant only if speedup > 3% AND "
          "max |dlogpost| << 1e-2 (acceptance-ratio noise floor)")


if __name__ == "__main__":
    main()
