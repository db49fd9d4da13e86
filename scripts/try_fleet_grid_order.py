"""Fleet kernel grid-order experiment (VERDICT r3 next #6).

Round 3 recorded the fleet path at ~14.2M evals/s/chip vs 16.7M single-target
and hypothesized (untested) that per-target table DMAs repeat per walker
block in ``spectrum_chi2_fleet``'s flat 1-D grid (ntgt*bpt,) where D's block
index is ``i // bpt``.  Pallas skips a DMA when a block's index map returns
the same index on consecutive grid steps, so the flat order *should* already
hoist D within a target — this script measures whether an EXPLICIT 2-D grid
(ntgt, bpt) with D indexed by the slow target axis only (the restructure
RESULTS.md never priced) buys anything:

  A. spectrum_chi2_fleet as shipped (flat grid, i//bpt indexing)
  B. 2-D grid (ntgt, bpt): D/data/V tables keyed on t alone, walker blocks
     iterate within a target on the fast axis
  C. the same comparison for the fully-fused fleet kernel
  D. context: single-target fused rate at the same total walker count

Run on TPU:  nohup python scripts/try_fleet_grid_order.py > /tmp/fleet_order.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference import batched
from mcmc_spec_tpu.inference.fleet import log_posterior_fleet, stack_targets
from mcmc_spec_tpu.ops import pallas_kernels as pk

NTGT = 9
NW = 4096
BLOCK = 256


def _time(fn, *args, n=20, warmup=3, reps=3):
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


def spectrum_chi2_fleet_2d(Wcomb, av, D, ext_k_data, data_flux, data_err,
                           V, Vpinv, med_data, n_data_true,
                           block=BLOCK, iters=14, mm_passes=3, recip=2):
    """2-D grid (ntgt, bpt) variant: per-target tables keyed on t alone."""
    ntgt, nw, NO = Wcomb.shape
    nd = D.shape[2]
    assert nw % block == 0
    bpt = nw // block
    f32 = jnp.float32

    n_true = n_data_true.astype(jnp.int32)
    r1 = (n_true + 1) // 2
    r2 = n_true // 2 + 1
    ranks = jnp.broadcast_to(
        jnp.stack([r1, r2], axis=-1)[:, None, :], (ntgt, nw, 2)
    ).reshape(ntgt * nw, 2)
    meta_f = jnp.broadcast_to(
        jnp.stack([med_data.astype(f32), 1.0 / n_true.astype(f32)], axis=-1)[:, None, :],
        (ntgt, nw, 2),
    ).reshape(ntgt * nw, 2)

    out = pl.pallas_call(
        functools.partial(pk._spectrum_chi2_fleet_kernel, iters=iters,
                          mm_passes=mm_passes, recip=recip),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(ntgt, bpt),
            in_specs=[
                pl.BlockSpec((block, NO), lambda t, b: (t * bpt + b, 0)),
                pl.BlockSpec((block, 1), lambda t, b: (t * bpt + b, 0)),
                pl.BlockSpec((block, 2), lambda t, b: (t * bpt + b, 0)),
                pl.BlockSpec((block, 2), lambda t, b: (t * bpt + b, 0)),
                pl.BlockSpec((1, NO, nd), lambda t, b: (t, 0, 0)),
                pl.BlockSpec((1, 1, nd), lambda t, b: (t, 0, 0)),
                pl.BlockSpec((1, 1, nd), lambda t, b: (t, 0, 0)),
                pl.BlockSpec((1, 1, nd), lambda t, b: (t, 0, 0)),
                pl.BlockSpec((1, 3, nd), lambda t, b: (t, 0, 0)),
                pl.BlockSpec((1, 3, nd), lambda t, b: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block, 1), lambda t, b: (t * bpt + b, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((ntgt * nw, 1), f32),
    )(
        Wcomb.astype(f32).reshape(ntgt * nw, NO),
        av.astype(f32).reshape(ntgt * nw, 1),
        meta_f,
        ranks,
        D.astype(f32),
        ext_k_data.astype(f32).reshape(ntgt, 1, nd),
        data_flux.astype(f32).reshape(ntgt, 1, nd),
        (1.0 / data_err.astype(f32)).reshape(ntgt, 1, nd),
        Vpinv.astype(f32),
        jnp.swapaxes(V.astype(f32), 1, 2),
    )
    return out.reshape(ntgt, nw)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    singles = []
    for s in range(NTGT):
        t, truth = build_bench_target(jnp.float32, seed=s)
        singles.append(dataclasses.replace(t, median_iters=14, matmul_passes=3,
                                           recip_newton=2))
    fleet = stack_targets(singles)
    ntgt, nT, nG, nd = fleet.D.shape
    NO = nT * nG
    P = jnp.stack([init_walker_batch(fleet, truth, NW, jnp.float32, seed=s)
                   for s in range(NTGT)])
    _, _, _, _, Wcomb = jax.vmap(batched._forward_small)(P, fleet)
    av = P[..., fleet.nspec]
    Dr = fleet.D.reshape(ntgt, NO, nd)
    args = (Wcomb, av, Dr, fleet.ext_k_data, fleet.data_flux, fleet.data_err,
            fleet.V, fleet.Vpinv, fleet.med_data, fleet.n_data_true)

    fA = jax.jit(lambda *a: pk.spectrum_chi2_fleet(
        *a, block=BLOCK, iters=14, mm_passes=3, recip=2))
    tA = _time(fA, *args)
    print(f"[A] flat grid (shipped):   {tA*1e3:.2f} ms "
          f"({NTGT*NW/tA/1e6:.1f}M walker-evals/s)", flush=True)

    fB = jax.jit(lambda *a: spectrum_chi2_fleet_2d(*a))
    outB = fB(*args)
    outA = fA(*args)
    err = float(jnp.max(jnp.abs(outA - outB)))
    tB = _time(fB, *args)
    print(f"[B] 2-D grid (t, b):       {tB*1e3:.2f} ms "
          f"({NTGT*NW/tB/1e6:.1f}M walker-evals/s), |A-B|max={err:.3g}",
          flush=True)

    # C: full posterior through the composed fleet path (production)
    fC = jax.jit(lambda p: log_posterior_fleet(p, fleet))
    tC = _time(fC, P)
    print(f"[C] composed fleet posterior: {tC*1e3:.2f} ms "
          f"({NTGT*NW/tC/1e6:.1f}M evals/s)", flush=True)

    # D: single-target fused at the same total walker count, for context
    tgt1 = singles[0]
    P1 = init_walker_batch(tgt1, truth, NTGT * NW, jnp.float32)
    fD = jax.jit(lambda p: pk.log_posterior_fused(p, tgt1))
    tD = _time(fD, P1)
    print(f"[D] single-target fused @ {NTGT*NW}: {tD*1e3:.2f} ms "
          f"({NTGT*NW/tD/1e6:.1f}M evals/s)", flush=True)


if __name__ == "__main__":
    main()
