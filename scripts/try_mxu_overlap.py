"""Experiment: can MXU matmul passes overlap VPU median/renorm work?

TODO.md's last perf lever is "MXU/VPU overlap": the bf16x3 spectrum matmul
prices at ~9% of the fused kernel (the bf16x6->bf16x3 delta measured ~9%
for 3 passes), and the VPU op model accounts for ~100% of kernel time —
so if Mosaic serializes the MXU passes against the VPU chain, up to ~9%
is recoverable by exposing independent MXU/VPU work to its scheduler.

Three kernel structures at the bench shape [32768 x 56 x 1792], block 256,
production dials (16-pass midpoint median, bf16x3, recip2):

  baseline  - current _spectrum_block: dot -> vpu chain, one 256-row block.
  nomxu     - the dot replaced by one same-shape VPU broadcast multiply
              (wrong numerics, same downstream ops): prices the matmul's
              NON-OVERLAPPED marginal cost in-context.  If ~0, the MXU is
              already hidden and there is nothing to recover.
  stagger2  - the 256-row block split into two 128-row halves computed as
              dot(a); dot(b); vpu(a); vpu(b) — the b-half matmul has no
              dependency on the a-half VPU chain, so a scheduler that can
              dual-issue MXU/VPU may overlap them.
  stagger4  - software-pipeline shape: dot(0); then for k in 0..2:
              {dot(k+1); vpu(k)}; vpu(3) on 64-row quarters.

Numerics of the stagger variants must be bit-identical to baseline (same
ops per row, different program order).

Run on a QUIET TPU box:
    nohup python scripts/try_mxu_overlap.py > /tmp/mxu_overlap.log 2>&1 &
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
ITERS = 16
MM = 3
RECIP = 2


def _vpu_tail(model, av, kd, data, inv_err, VpinvT, VT, med_data):
    """Everything after the matmul (extinction .. chi^2), production dials."""
    trans = jnp.where(av > 0, jnp.exp(pk.LN10_04 * av * kd), 1.0)
    model = model * trans
    med = pk._row_median_nonneg(model, iters=ITERS)
    model = model * (med_data / med)
    frac = pk._div(data, model, RECIP)
    c0 = jnp.sum(frac * VpinvT[0][None, :], axis=1, keepdims=True)
    c1 = jnp.sum(frac * VpinvT[1][None, :], axis=1, keepdims=True)
    c2 = jnp.sum(frac * VpinvT[2][None, :], axis=1, keepdims=True)
    fitted = c0 * VT[0][None, :] + c1 * VT[1][None, :] + c2 * VT[2][None, :]
    data_renorm = pk._div(data, fitted, RECIP)
    resid = (model - data_renorm) * inv_err
    return jnp.mean(resid * resid, axis=1, keepdims=True)


def _kernel(medd_ref, Wc_ref, av_ref, D_ref, kd_ref, data_ref, ie_ref,
            Vp_ref, VT_ref, out_ref, *, mode):
    med_data = medd_ref[0, 0]
    D = D_ref[:]
    kd, data, ie = kd_ref[:], data_ref[:], ie_ref[:]
    Vp, VT = Vp_ref[:], VT_ref[:]
    if mode == "baseline":
        model = pk._dot_f32(Wc_ref[:], D, MM)
        out_ref[:] = _vpu_tail(model, av_ref[:], kd, data, ie, Vp, VT, med_data)
    elif mode == "nomxu":
        # same-shape stand-in: one VPU broadcast multiply, no MXU issue
        model = Wc_ref[:, :1] * D[:1]
        out_ref[:] = _vpu_tail(model, av_ref[:], kd, data, ie, Vp, VT, med_data)
    elif mode == "stagger2":
        h = BLOCK // 2
        ma = pk._dot_f32(Wc_ref[:h], D, MM)
        mb = pk._dot_f32(Wc_ref[h:], D, MM)
        out_ref[:h] = _vpu_tail(ma, av_ref[:h], kd, data, ie, Vp, VT, med_data)
        out_ref[h:] = _vpu_tail(mb, av_ref[h:], kd, data, ie, Vp, VT, med_data)
    elif mode == "stagger4":
        q = BLOCK // 4
        model_next = pk._dot_f32(Wc_ref[:q], D, MM)
        for k in range(4):
            model_k = model_next
            if k < 3:
                s = (k + 1) * q
                model_next = pk._dot_f32(Wc_ref[s:s + q], D, MM)
            s = k * q
            out_ref[s:s + q] = _vpu_tail(
                model_k, av_ref[s:s + q], kd, data, ie, Vp, VT, med_data)
    else:
        raise ValueError(mode)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(medd, Wc, av, D, kd, data, ie, Vp, VT, mode):
    grid = (NW // BLOCK,)
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
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
    xs = np.linspace(-1.0, 1.0, ND)
    V = np.stack([np.ones(ND), xs, xs * xs], axis=1)
    Vp = jnp.asarray(np.linalg.pinv(V), f32)
    VT = jnp.asarray(V.T, f32)
    medd = jnp.asarray(np.median(np.asarray(data)), f32).reshape(1, 1)
    args = (medd, Wc, av, D, kd, data, ie, Vp, VT)

    fns = {m: (lambda *a, _m=m: run(*a, mode=_m))
           for m in ("baseline", "nomxu", "stagger2", "stagger4")}

    o_base = np.asarray(fns["baseline"](*args))[:, 0]
    for m in ("stagger2", "stagger4"):
        om = np.asarray(fns[m](*args))[:, 0]
        same = np.array_equal(om, o_base)
        print(f"[num] {m} bit-identical to baseline: {same}")

    t = {m: _time(f, args) for m, f in fns.items()}
    for m in fns:
        print(f"[time] {m:9s}: {t[m]*1e3:.3f} ms  ({t['baseline']/t[m]:.3f}x)")
    marg = t["baseline"] - t["nomxu"]
    print(f"[info] matmul non-overlapped marginal: {marg*1e3:+.3f} ms "
          f"({marg/t['baseline']*100:.1f}% of kernel)")


if __name__ == "__main__":
    main()
