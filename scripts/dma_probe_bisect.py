"""Bisect the fused kernel's 2.2 ms floor (round 4, follow-up).

`ablate_fused_sections.py` (hardened): an EMPTY body behind the fused
call's full signature costs 2.225 ms — identical to the full kernel.
`dma_probe.py` (hardened): a trivial kernel with 6 broadcast [56, nd]
tables costs ~1 us — constant-index blocks are copied once (the revisit
optimization works) and p/out streaming is throughput-bound.  So the floor
lives in something the fused signature has and the trivial probe lacks.
Candidates, added one at a time to the trivial kernel:

  base      — trivial: p block + 6 bcast [NO, nd] tables (the probe shape)
  smem      — + a (1, 3) SMEM-space scalar input, read in the body
  prefetch  — same as base but via PrefetchScalarGridSpec(0)
  many      — + 12 extra small bcast tables (19 inputs total)
  width6    — p with 6 columns instead of 8 (the fused ndim)
  body      — + the empty-variant's actual [B, 1]/[B, NO] op chain (~25 ops)
  all       — every ingredient together (should reproduce ~2.2 ms)

Run on TPU:  nohup python scripts/dma_probe_bisect.py > /tmp/r4/bisect.log 2>&1 &
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

NW = 32768
NO = 56
ND = 1792
BLOCK = 256


def timed(fn, args, n_iter=20):
    """Direct pipelined dispatch — the scan harness is untrustworthy (XLA
    hoists the pallas_call even behind a loop-carried perturbation)."""
    jfn = jax.jit(fn)
    jfn(*args).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = jfn(*args)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1e3


def build(use_smem=False, use_prefetch=False, n_small=0, pw=8, body_ops=False):
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(NW, pw), jnp.float32)
    big = [jnp.asarray(rng.randn(NO, ND), jnp.float32) for _ in range(6)]
    small = [jnp.asarray(rng.randn(4, NO), jnp.float32) for _ in range(n_small)]
    smem_in = [jnp.asarray(rng.rand(1, 3), jnp.float32)] if use_smem else []

    def kern(*refs):
        i = 0
        if use_smem:
            scal = refs[0]
            i = 1
        p_ref = refs[i]
        t0 = refs[i + 1]
        out_ref = refs[-1]
        x = p_ref[:]
        if body_ops:
            # the empty-variant's residual op chain: a few [B, 1] scalar
            # chains, a [B, NO]-shaped stub, a lane reduction, select chains
            r1 = x[:, 1:2]
            plx = x[:, 2:3] if pw > 2 else r1
            base = (r1 * 6.957e10 * plx / 3.086e18) ** 2
            Wk = x[:, 0:1] * jnp.full((1, NO), 1e-4, jnp.float32)
            Wc = base * Wk + Wk
            s = jnp.sum(Wc, axis=1, keepdims=True) + t0[0, 0]
            if use_smem:
                s = s + scal[0, 2]
            ll = jnp.where(jnp.isnan(s), -jnp.inf, -0.5 * s)
            lp = jnp.zeros_like(s)
            out_ref[:] = jnp.where(jnp.isfinite(lp), lp + ll, -jnp.inf)
        else:
            extra = scal[0, 0] if use_smem else 0.0
            out_ref[:] = (jnp.sum(x, axis=1, keepdims=True)
                          + t0[0, 0] + extra)

    in_specs = []
    if use_smem:
        in_specs.append(pl.BlockSpec((1, 3), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
    in_specs.append(pl.BlockSpec((BLOCK, pw), lambda i: (i, 0)))
    in_specs += [pl.BlockSpec((NO, ND), lambda i: (0, 0))] * 6
    in_specs += [pl.BlockSpec((4, NO), lambda i: (0, 0))] * n_small

    out_spec = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0))
    out_shape = jax.ShapeDtypeStruct((NW, 1), jnp.float32)
    if use_prefetch:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(NW // BLOCK,),
            in_specs=in_specs, out_specs=out_spec)
        call = pl.pallas_call(kern, grid_spec=grid_spec, out_shape=out_shape)
    else:
        call = pl.pallas_call(kern, grid=(NW // BLOCK,), in_specs=in_specs,
                              out_specs=out_spec, out_shape=out_shape)

    # timed() perturbs the FIRST arg (p) for the loop-carry dependency;
    # fn reorders to the call's true operand order
    def fn(pp, *rest):
        if use_smem:
            return call(rest[0], pp, *rest[1:])
        return call(pp, *rest)

    return fn, [p] + smem_in + big + small


def run(name, **kw):
    fn, args = build(**kw)
    ms = timed(fn, args)
    print(f"  {name:>9}: {ms:.3f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    run("base")
    run("smem", use_smem=True)
    run("prefetch", use_prefetch=True)
    run("many", n_small=12)
    run("width6", pw=6)
    run("body", body_ops=True)
    run("all", use_smem=True, use_prefetch=True, n_small=12, pw=6,
        body_ops=True)


if __name__ == "__main__":
    main()
