#!/usr/bin/env python
"""Prototype: adaptive (while_loop) exact radix median inside a Mosaic kernel.

Checks (a) that lax.while_loop with vector carries lowers on TPU Mosaic,
(b) exactness vs np.median, (c) speed vs the fixed-31-pass version.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_INF_BITS = 0x7F800000
B, ND = 512, 1792


def _median_fixed(model, iters):
    nd = model.shape[1]
    r1 = (nd + 1) // 2
    mi = jax.lax.bitcast_convert_type(model, jnp.int32)
    lo = jnp.zeros((model.shape[0], 1), jnp.int32)
    hi = jnp.full((model.shape[0], 1), _F32_INF_BITS, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = lo + ((hi - lo) >> 1)
        cnt = jnp.sum((mi <= mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= r1
        return jnp.where(ge, lo, mid + 1), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    v1 = hi
    x1 = jax.lax.bitcast_convert_type(v1, jnp.float32)
    cnt1 = jnp.sum((mi <= v1).astype(jnp.int32), axis=1, keepdims=True)
    bigger = jnp.where(mi > v1, model, jnp.inf)
    x2 = jnp.min(bigger, axis=1, keepdims=True)
    x2 = jnp.where(cnt1 >= r1 + 1, x1, x2)
    return 0.5 * (x1 + x2) if nd % 2 == 0 else x1


def _median_adaptive(model):
    """Exact median, early-exit binary search + masked-min/max finisher.

    Invariant: count(mi <= lo) < r1 <= count(mi <= hi), so the r1-th order
    statistic lies in (lo, hi].  Exit when for every row the interval holds
    exactly one distinct value (min of elements > lo == max of elements <= hi);
    that value is the order statistic.
    """
    nd = model.shape[1]
    r1 = (nd + 1) // 2
    mi = jax.lax.bitcast_convert_type(model, jnp.int32)
    nrow = model.shape[0]
    lo = jnp.zeros((nrow, 1), jnp.int32)
    hi = jnp.full((nrow, 1), _F32_INF_BITS, jnp.int32)

    def one_distinct(lo, hi):
        # invariant: count(< lo) < r1 <= count(<= hi)  =>  x_r in [lo, hi];
        # if the smallest element >= lo is >= hi, it IS x_r (all candidates tie)
        inlo = jnp.where(mi >= lo, mi, _F32_INF_BITS)
        vmin = jnp.min(inlo, axis=1, keepdims=True)
        return jnp.all(vmin >= hi), vmin

    def cond(carry):
        k, lo, hi, done = carry
        return jnp.logical_and(k < 31, jnp.logical_not(done))

    def body(carry):
        k, lo, hi, _ = carry
        mid = lo + ((hi - lo) >> 1)
        cnt = jnp.sum((mi <= mid).astype(jnp.int32), axis=1, keepdims=True)
        ge = cnt >= r1
        lo = jnp.where(ge, lo, mid + 1)
        hi = jnp.where(ge, mid, hi)
        # convergence check every 3rd pass once past the break-even point
        check = jnp.logical_and(k >= 14, (k % 3) == 2)
        conv = jax.lax.cond(
            check, lambda: one_distinct(lo, hi)[0], lambda: jnp.zeros((), jnp.bool_)
        )
        return k + 1, lo, hi, conv

    _, lo, hi, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), lo, hi, jnp.zeros((), jnp.bool_))
    )
    _, vmin = one_distinct(lo, hi)
    # conv exit: vmin >= hi  =>  x_r = vmin.  Exhaustion exit (width <= 1):
    # x_r = vmin iff count(<= vmin) >= r1, else x_r = hi.  One repair pass.
    cntv = jnp.sum((mi <= vmin).astype(jnp.int32), axis=1, keepdims=True)
    v1 = jnp.where(cntv >= r1, vmin, hi)
    x1 = jax.lax.bitcast_convert_type(v1, jnp.float32)
    cnt1 = jnp.sum((mi <= v1).astype(jnp.int32), axis=1, keepdims=True)
    bigger = jnp.where(mi > v1, model, jnp.inf)
    x2 = jnp.min(bigger, axis=1, keepdims=True)
    x2 = jnp.where(cnt1 >= r1 + 1, x1, x2)
    return 0.5 * (x1 + x2) if nd % 2 == 0 else x1


def kernel_fixed(m_ref, o_ref):
    o_ref[:] = _median_fixed(m_ref[:], 31)


def kernel_adaptive(m_ref, o_ref):
    o_ref[:] = _median_adaptive(m_ref[:])


def run(kern, x, nblocks):
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec((B, ND), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((B, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B * nblocks, 1), jnp.float32),
    )(x)


def main():
    nblocks = 16
    rng = np.random.RandomState(0)
    base = np.abs(rng.lognormal(0.0, 1.0, size=ND)).astype(np.float32)
    scales = rng.uniform(0.5, 2.0, size=(B * nblocks, 1)).astype(np.float32)
    x = jnp.asarray(scales * base[None, :] * (1 + 0.01 * rng.randn(B * nblocks, ND)).astype(np.float32))
    x = jnp.abs(x)

    ref = np.median(np.asarray(x), axis=1)

    for name, kern in [("fixed31", kernel_fixed), ("adaptive", kernel_adaptive)]:
        try:
            f = jax.jit(lambda q: run(kern, q, nblocks))
            out = np.asarray(f(x))[:, 0]
            err = np.max(np.abs(out - ref) / np.abs(ref))
            exact = np.array_equal(out, ref.astype(np.float32))
            # device-loop timing
            @jax.jit
            def loop(q):
                def body(i, acc):
                    return acc + jnp.sum(run(kern, q + 1e-12 * i, nblocks))
                return jax.lax.fori_loop(0, 200, body, jnp.zeros((), jnp.float32))
            loop(x).block_until_ready()
            t0 = time.perf_counter()
            loop(x).block_until_ready()
            dt = (time.perf_counter() - t0) / 200
            print(f"{name}: exact={exact} maxrelerr={err:.2e} time={dt*1e3:.3f} ms",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:500]}", flush=True)


if __name__ == "__main__":
    main()
