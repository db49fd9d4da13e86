"""Experiment: 16-bit coarse passes for the radix-select median (VERDICT r2
item 4, second untried idea).

The exact median runs 31 count-compare passes over the int32 bit patterns.
The first 16 passes only ever examine the HIGH 16 bits, so they can run on an
``int16`` array of the truncated high halves (non-negative f32 -> high half
fits 15 bits): if Mosaic issues int16 compare+accumulate at 2x the f32/int32
rate (16-bit registers pack two lanes), passes 1-16 halve in cost and the
total becomes ~16/2 + 16 = 24 pass-equivalents instead of 31+2 (~28%).
The low-16 refinement then searches inside the found high-half bucket.

Exactness: the int16 search finds the smallest high-half value v with
count(high16 <= v) >= rank, which equals count(mi <= (v<<16 | 0xFFFF)) >=
rank, so the 32-bit continuation over [v<<16, v<<16|0xFFFF] (16 passes)
lands on exactly the same order statistic.

Also re-examines the "fuse the r1/r2 rank searches" idea (first untried
idea): the exact path already refines the upper-middle with ONE masked-min
pass, not a second 31-pass search, so a fused dual-rank loop has at most ~2
of ~33 passes to save — and the two searches share compares only until
their intervals diverge (data-dependent), which static control flow cannot
exploit.  Recorded as not worth building.

Run on a QUIET TPU box:
    nohup python scripts/try_packed_median.py > /tmp/packed_median.log 2>&1 &
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

from mcmc_spec_tpu.ops import pallas_kernels as pk

NW = 32768
BLOCK = 256
ND = 1792


def _row_median_nonneg_16(model, sum_dtype=jnp.float32):
    """Exact np.median via 16 bf16 coarse passes + 16 int32 fine passes.

    Mosaic packs two 16-bit lanes per 32-bit VPU lane but rejects int16
    ORDERING compares (``arith.cmpi sle`` on vector<...x2xi16> — measured);
    bf16 float compares are native.  The high 16 bits of a non-negative
    f32's pattern ARE a valid bf16 pattern (truncation), monotone in value
    and NaN-free below +inf (0x7F80), so the coarse search runs in the bf16
    float domain with exact bucket semantics.
    """
    nd = model.shape[1]
    r1 = (nd + 1) // 2
    mi = jax.lax.bitcast_convert_type(model, jnp.int32)
    hb = jax.lax.bitcast_convert_type((mi >> 16).astype(jnp.int16),
                                      jnp.bfloat16)  # one-time conversion
    B = model.shape[0]

    def search(rank):
        lo = jnp.zeros((B, 1), jnp.int32)
        hi = jnp.full((B, 1), 0x7F80, jnp.int32)

        def coarse(_, carry):
            # Mosaic (v5e) rejects ORDERED compares on packed 16-bit lanes
            # (arith.cmpi sle / arith.cmpf ole on vector<8x128x2x{i16,bf16}>
            # — both measured); equality compares, subtract, and minimum DO
            # lower, so the count uses sign-of-difference arithmetic:
            #   hb > midb  <=>  minimum(midb - hb, 0) != 0
            # (exact: a bf16 subtraction of distinct finite values never
            # rounds to zero, and equal values give +-0 which == 0).
            lo, hi = carry
            mid = lo + ((hi - lo) >> 1)
            midb = jax.lax.bitcast_convert_type(mid.astype(jnp.int16),
                                                jnp.bfloat16)
            d = midb - hb
            m = jnp.minimum(d, jnp.bfloat16(0))
            gt = jnp.where(m != jnp.bfloat16(0), jnp.bfloat16(1),
                           jnp.bfloat16(0))
            cnt_gt = jnp.sum(gt.astype(jnp.float32), axis=1,
                             keepdims=True).astype(jnp.int32)
            ge = (nd - cnt_gt) >= rank
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        lo, hi = jax.lax.fori_loop(0, 16, coarse, (lo, hi))
        lo32 = hi << 16
        hi32 = (hi << 16) | 0xFFFF

        def fine(_, carry):
            lo, hi = carry
            mid = lo + ((hi - lo) >> 1)
            cnt = jnp.sum((mi <= mid).astype(jnp.int32), axis=1, keepdims=True)
            ge = cnt >= rank
            return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

        lo32, hi32 = jax.lax.fori_loop(0, 16, fine, (lo32, hi32))
        return hi32

    v1 = search(r1)
    x1 = jax.lax.bitcast_convert_type(v1, jnp.float32)
    if nd % 2 == 1:
        return x1
    cnt1 = jnp.sum((mi <= v1).astype(jnp.int32), axis=1, keepdims=True)
    bigger = jnp.where(mi > v1, model, jnp.inf)
    x2 = jnp.min(bigger, axis=1, keepdims=True)
    x2 = jnp.where(cnt1 >= r1 + 1, x1, x2)
    return 0.5 * (x1 + x2)


def _median_kernel(x_ref, o_ref, *, impl):
    o_ref[:] = impl(x_ref[:])


def run_kernel(impl, x):
    nd = x.shape[1]
    return jax.jit(lambda x: pl.pallas_call(
        functools.partial(_median_kernel, impl=impl),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(x.shape[0] // BLOCK,),
            in_specs=[pl.BlockSpec((BLOCK, nd), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
    )(x))


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
    x = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (NW, ND), jnp.float32)) * 1e-14

    base = run_kernel(lambda m: pk._row_median_nonneg(m, iters=31), x)
    pack32 = run_kernel(_row_median_nonneg_16, x)

    ref = np.median(np.asarray(x), axis=1)
    for name, f in [("base31", base), ("bf16-coarse 16+16", pack32)]:
        got = np.asarray(f(x))[:, 0]
        ok = np.array_equal(got, ref)
        print(f"[exact] {name}: np.median-identical = {ok}")
        if not ok:
            bad = np.flatnonzero(got != ref)
            print(f"        first mismatches {bad[:5]}: got {got[bad[:5]]} "
                  f"want {ref[bad[:5]]}")

    t_base = _time(base, x)
    t_p32 = _time(pack32, x)
    print(f"[time] base 31-pass:       {t_base*1e3:.3f} ms")
    print(f"[time] bf16-coarse 16+16:  {t_p32*1e3:.3f} ms  ({t_base/t_p32:.2f}x)")


if __name__ == "__main__":
    main()
