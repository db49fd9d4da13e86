"""Experiment: bit-trick + Newton reciprocal for the two hot [B, nd]
divides in the spectrum continuum renorm (TODO.md "approximate-reciprocal
dial", the last unmeasured kernel idea).

The renorm path (`_spectrum_block`, renorm=True) divides twice per element:
``frac = data / model`` and ``data_renorm = data / fitted``.  The round-3
cost model books the pair at roughly 14 of ~50 multiply-equivalents.  JAX
exposes no low-precision reciprocal primitive on TPU, but the classic
integer-magic seed IS constructible from ops Mosaic already lowers for the
radix median (``bitcast_convert_type`` + integer subtract):

    r0 = bitcast_f32(0x7EF311C3 - bitcast_i32(x))   # ~4% max rel error
    r  = r * (2 - x * r)                            # Newton: squares the error

Two Newton steps give ~1e-5 relative error (far below the bf16x3 matmul
default's 3e-4); one step gives ~2e-3.  Cost: 1 int sub + 3 ops per Newton
step + 1 multiply by the numerator = ~8 (recip2) / ~5 (recip1) equivalents
per divide replaced.  Whether that beats Mosaic's `arith.divf` lowering is
a pure measurement question — if the hardware divide is itself a seeded
Newton chain of similar length, this is a wash.

Method: the full spectrum-chi2 kernel (matmul + extinction + median +
renorm + chi^2) at the bench shape [32768 x 56 x 1792], block 256, with
ONLY the two divides swapped — so the delta is measured in-context, not on
an isolated divide loop.  Numerics are checked against the divide baseline.

Run on a QUIET TPU box:
    nohup python scripts/try_fast_recip.py > /tmp/fast_recip.log 2>&1 &
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
NO = 56
ND = 1792
BLOCK = 256
MAGIC = np.int32(0x7EF311C3)


def _fast_recip(x, newton: int):
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    r = jax.lax.bitcast_convert_type(MAGIC - xi, jnp.float32)
    for _ in range(newton):
        r = r * (2.0 - x * r)
    return r


def _spectrum_block_recip(Wcomb, av, D, kd, data, inv_err, VpinvT, VT,
                          med_data, iters, mm_passes, recip, noexp=False):
    """pk._spectrum_block with the two renorm divides parameterized.

    recip=0 -> exact divide (must match pk._spectrum_block bit-for-bit);
    recip=N -> magic-seed reciprocal with N Newton steps.
    noexp=True replaces the extinction exp with a same-shape linear term
    (wrong numerics, same op count minus the exp) to price the hardware
    exp's marginal cost in-context.
    """
    model = pk._dot_f32(Wcomb, D, mm_passes)
    if noexp:
        trans = jnp.where(av > 0, 1.0 + pk.LN10_04 * av * kd, 1.0)
    else:
        trans = jnp.where(av > 0, jnp.exp(pk.LN10_04 * av * kd), 1.0)
    model = model * trans
    med = pk._row_median_nonneg(model, iters=iters)
    model = model * (med_data / med)

    if recip == 0:
        frac = data / model
    else:
        frac = data * _fast_recip(model, recip)
    c0 = jnp.sum(frac * VpinvT[0][None, :], axis=1, keepdims=True)
    c1 = jnp.sum(frac * VpinvT[1][None, :], axis=1, keepdims=True)
    c2 = jnp.sum(frac * VpinvT[2][None, :], axis=1, keepdims=True)
    fitted = c0 * VT[0][None, :] + c1 * VT[1][None, :] + c2 * VT[2][None, :]
    if recip == 0:
        data_renorm = data / fitted
    else:
        data_renorm = data * _fast_recip(fitted, recip)
    resid = (model - data_renorm) * inv_err
    return jnp.mean(resid * resid, axis=1, keepdims=True)


def _kernel(medd_ref, Wc_ref, av_ref, D_ref, kd_ref, data_ref, ie_ref,
            Vp_ref, VT_ref, out_ref, *, recip, noexp):
    out_ref[:] = _spectrum_block_recip(
        Wc_ref[:], av_ref[:], D_ref[:], kd_ref[:], data_ref[:], ie_ref[:],
        Vp_ref[:], VT_ref[:], medd_ref[0, 0], iters=16, mm_passes=3,
        recip=recip, noexp=noexp)


@functools.partial(jax.jit, static_argnames=("recip", "noexp"))
def run(medd, Wc, av, D, kd, data, ie, Vp, VT, recip, noexp=False):
    grid = (NW // BLOCK,)
    return pl.pallas_call(
        functools.partial(_kernel, recip=recip, noexp=noexp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLOCK, NO), lambda i: (i, 0)),
                pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
                pl.BlockSpec((NO, ND), lambda i: (0, 0)),
                pl.BlockSpec((1, ND), lambda i: (0, 0)),
                pl.BlockSpec((1, ND), lambda i: (0, 0)),
                pl.BlockSpec((1, ND), lambda i: (0, 0)),
                pl.BlockSpec((3, ND), lambda i: (0, 0)),
                pl.BlockSpec((3, ND), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((NW, 1), jnp.float32),
    )(medd, Wc, av, D, kd, data, ie, Vp, VT)


def _time(f, args, n=20, reps=3):
    out = f(*args)
    out.block_until_ready()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    print(f"[env] devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    f32 = jnp.float32
    Wc = jnp.asarray(rng.dirichlet(np.ones(NO), NW) * 2.0, f32)
    av = jnp.asarray(rng.uniform(0.0, 0.5, NW), f32).reshape(NW, 1)
    D = jnp.asarray(rng.uniform(0.5, 2.0, (NO, ND)), f32)
    kd = jnp.asarray(rng.uniform(0.3, 1.2, ND), f32).reshape(1, ND)
    data = jnp.asarray(rng.uniform(0.5, 2.0, ND), f32).reshape(1, ND)
    ie = jnp.asarray(1.0 / rng.uniform(0.005, 0.02, ND), f32).reshape(1, ND)
    # deg-2 Vandermonde on a scaled domain, like target packing
    xs = np.linspace(-1.0, 1.0, ND)
    V = np.stack([np.ones(ND), xs, xs * xs], axis=1)
    Vp = jnp.asarray(np.linalg.pinv(V), f32)  # [3, nd]
    VT = jnp.asarray(V.T, f32)  # [3, nd]
    medd = jnp.asarray(np.median(np.asarray(data)), f32).reshape(1, 1)
    args = (medd, Wc, av, D, kd, data, ie, Vp, VT)

    base = lambda *a: run(*a, recip=0)
    r2 = lambda *a: run(*a, recip=2)
    r1 = lambda *a: run(*a, recip=1)

    o0 = np.asarray(base(*args))[:, 0]
    o2 = np.asarray(r2(*args))[:, 0]
    o1 = np.asarray(r1(*args))[:, 0]
    # chi^2 values are O(1e2..1e4); compare relatively
    rel2 = np.max(np.abs(o2 - o0) / np.maximum(np.abs(o0), 1e-12))
    rel1 = np.max(np.abs(o1 - o0) / np.maximum(np.abs(o0), 1e-12))
    print(f"[num] recip2 max rel chi2 err: {rel2:.3e}")
    print(f"[num] recip1 max rel chi2 err: {rel1:.3e}")

    noexp = lambda *a: run(*a, recip=0, noexp=True)
    t0 = _time(base, args)
    t2 = _time(r2, args)
    t1 = _time(r1, args)
    tx = _time(noexp, args)
    print(f"[time] divide baseline: {t0*1e3:.3f} ms")
    print(f"[time] recip 2-Newton:  {t2*1e3:.3f} ms  ({t0/t2:.3f}x)")
    print(f"[time] recip 1-Newton:  {t1*1e3:.3f} ms  ({t0/t1:.3f}x)")
    print(f"[time] exp->linear:     {tx*1e3:.3f} ms  (exp marginal "
          f"{(t0-tx)*1e3:+.3f} ms, {(t0-tx)/t0*100:.1f}% of kernel)")
    evals = NW / t0
    print(f"[info] baseline kernel evals/s: {evals/1e6:.2f}M (spectrum-only)")


if __name__ == "__main__":
    main()
