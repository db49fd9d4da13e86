"""Walker-lanes-major epilogue experiment (round 4).

The corrected section ablation + nd-resolved traces put the fused kernel
at ~1.7 ms/call (32k walkers, production dials) with ~0.75 ms
nd-INDEPENDENT, of which phot ≈ 0.06, priors ≈ 0.14, plus the residual
[B, 1] scalar chains.  Hypothesis: those sections run on [B, 1]/[B, k]
arrays — 32 vregs per op for 256 useful lanes (≤1/16 lane utilization).
This experiment rebuilds the epilogue in TRANSPOSED layout: per-walker
quantities live as [1, B] rows (walkers across lanes, 2 vregs per op):

  * p is additionally passed transposed ([ndim, B], blocked (ndim, block))
  * the W/spectrum path stays row-major (it feeds the MXU/[B, nd] block)
  * tent weights are built a second time transposed ([NO, B], [nm, B] —
    outer-product broadcasting; the row-major tents cost ~0.04 ms total,
    so doubling them is cheap)
  * contrast/photometry fluxes come from transposed matmuls
    (Fc^T [nc, NO] @ sWk^T [NO, B]) — no in-kernel transposes of matmul
    outputs needed
  * the ONLY layout crossing is chi_spec [B, 1] -> [1, B], done with a
    jnp.transpose of one [block, 1] array per grid step
  * the output is written transposed ((1, NW) out_shape) and reshaped for
    free in XLA

Scope: fit_plx=True, nspec=2, rad_prior=False (the bench/production
koi2298 shape); productionization would cover the other branches.

Parity gate: identical -inf support, ≤5e-5 relative on finite values
(reduction orders over ≤6-term sums differ; per-walker arithmetic is
otherwise unchanged).

Run on TPU:  nohup python scripts/try_transposed_epilogue.py > /tmp/r4/transposed.log 2>&1 &
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
from mcmc_spec_tpu.ops import pallas_kernels as pk

NWALK = 32768


def _tent_w_T(tcT, q):
    """Transposed tent weights: tcT [n, 4] node constants, q [1, B] query
    -> [n, B].  Same arithmetic as pk._tent_w with the broadcast flipped."""
    left = (q - tcT[:, 0:1]) * tcT[:, 1:2]
    right = (tcT[:, 2:3] - q) * tcT[:, 3:4]
    return jnp.clip(jnp.minimum(left, right), 0.0, 1.0)


def _posterior_kernel_T(
    scal_ref,      # [1, 3] SMEM
    p_ref,         # [B, ndim]
    pT_ref,        # [ndim, B]  (transposed walker params)
    D_ref, kd_ref, data_ref, inv_err_ref, VpinvT_ref, VT_ref,
    tentT_ref, tentG_ref,          # [4, NO] row-major tents (W path)
    ttT_ref, tgT_ref,              # [NO, 4] transposed tents
    mist_tent_ref, mist_vals_ref,  # row-major mist (unused here)
    mistT_ref,                     # [nm, 6]: 4 tent cols + logg + lum
    avT_ref,                       # [nav, 6]: 4 tent cols + mu + sig
    FcT_ref,                       # [nc, NO]
    FpT_ref,                       # [npf, NO]
    cobs_ref, pobs_ref,            # [2, nc], [4, npf]
    priorT_ref,                    # [ndim, 2]: mu, sig columns
    out_ref,       # [1, B]
    *, nspec, spectrum_weight, median_iters, mm_passes, recip,
):
    n = nspec
    f32 = jnp.float32
    tmin = scal_ref[0, 0]
    tmax = scal_ref[0, 1]
    med_data = scal_ref[0, 2]
    tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)
    p = p_ref[:]

    # ---- row-major W path (unchanged; feeds the [B, nd] spectrum block)
    teffs = [p[:, s:s + 1] for s in range(n)]
    av = p[:, n:n + 1]
    r1 = p[:, n + 1:n + 2]
    ratios = [p[:, n + 1 + s:n + 2 + s] for s in range(1, n)]
    plx = p[:, 2 * n + 1:2 * n + 2]
    base = (r1 * pk._RSUN_CM * plx / pk._PC_CM) ** 2
    scales = [base] + [base * r ** 2 for r in ratios]

    mist_tc = mist_tent_ref[:]
    logg_nodes = mist_vals_ref[0][None, :]
    tT = tentT_ref[:]
    tG = tentG_ref[:]
    Wcomb = None
    for s in range(n):
        wm = pk._tent_w(mist_tc, teffs[s])
        logg_s = jnp.sum(wm * logg_nodes, axis=1, keepdims=True)
        Wk = pk._tent_w(tT, teffs[s]) * pk._tent_w(tG, logg_s)
        sWk = scales[s] * Wk
        Wcomb = sWk if Wcomb is None else Wcomb + sWk

    chi_spec = pk._spectrum_block(
        Wcomb, av, D_ref[:], kd_ref[:], data_ref[:], inv_err_ref[:],
        VpinvT_ref[:], VT_ref[:], med_data, median_iters, mm_passes,
        recip=recip,
    )
    chi_specT = jnp.transpose(chi_spec)  # [1, B] — the one layout crossing

    # ---- transposed epilogue: walkers across lanes
    pT = pT_ref[:]
    teffsT = [pT[s:s + 1, :] for s in range(n)]
    avT = pT[n:n + 1, :]
    r1T = pT[n + 1:n + 2, :]
    ratiosT = [pT[n + 1 + s:n + 2 + s, :] for s in range(1, n)]
    plxT = pT[2 * n + 1:2 * n + 2, :]
    baseT = (r1T * pk._RSUN_CM * plxT / pk._PC_CM) ** 2
    scalesT = [baseT] + [baseT * r ** 2 for r in ratiosT]

    mistT = mistT_ref[:]
    logg_colT = mistT[:, 4:5]
    cmagsT = []
    WcombT = None
    for s in range(n):
        wmT = _tent_w_T(mistT, teffsT[s])                      # [nm, B]
        loggT = jnp.sum(wmT * logg_colT, axis=0, keepdims=True)  # [1, B]
        WkT = _tent_w_T(ttT_ref[:], teffsT[s]) * _tent_w_T(tgT_ref[:], loggT)
        sWkT = scalesT[s] * WkT                                # [NO, B]
        WcombT = sWkT if WcombT is None else WcombT + sWkT
        cfluxT = pk._dot_f32(FcT_ref[:], sWkT, mm_passes)      # [nc, B]
        cmagsT.append(-2.5 / pk.LN10 * jnp.log(jnp.maximum(cfluxT, tiny)))

    contrastsT = cmagsT[1] - cmagsT[0]                         # [nc, B]
    pfluxT = pk._dot_f32(FpT_ref[:], WcombT, mm_passes)        # [npf, B]
    pmag_obsT = pobs_ref[0][:, None]
    perrT = pobs_ref[1][:, None]
    zpT = pobs_ref[2][:, None]
    kcwlT = pobs_ref[3][:, None]
    photT = -2.5 / pk.LN10 * jnp.log(jnp.maximum(pfluxT / zpT, tiny))
    photT = jnp.where(avT > 0, photT + avT * kcwlT, photT)

    cmag_obsT = cobs_ref[0][:, None]
    cerrT = cobs_ref[1][:, None]
    chi_cT = jnp.sum(((contrastsT - cmag_obsT) / cerrT) ** 2, axis=0,
                     keepdims=True)
    chi_pT = jnp.sum(((photT - pmag_obsT) / perrT) ** 2, axis=0,
                     keepdims=True)

    nc = FcT_ref.shape[0]
    npf = FpT_ref.shape[0]
    weight = float(nc + npf)
    csT = spectrum_weight * weight * chi_specT + chi_cT + chi_pT
    llT = jnp.where(jnp.isnan(csT), -jnp.inf, -0.5 * csT)

    # priors (transposed)
    lpT = jnp.zeros_like(avT)
    distT = 1.0 / jnp.maximum(plxT, 1e-12)
    logdT = jnp.log(jnp.maximum(distT, 1e-3))
    wavT = _tent_w_T(avT_ref[:], logdT)                        # [nav, B]
    muT = jnp.sum(wavT * avT_ref[:, 4:5], axis=0, keepdims=True)
    sigT = jnp.sum(wavT * avT_ref[:, 5:6], axis=0, keepdims=True)
    lpT += -0.5 * ((avT - muT) / sigT) ** 2
    pmuT = priorT_ref[:, 0:1]
    psigT = priorT_ref[:, 1:2]
    lpT += jnp.sum(
        jnp.where(pmuT != 0, -0.5 * ((pT - pmuT) / psigT) ** 2, 0.0),
        axis=0, keepdims=True,
    )

    ok = (avT >= 0)
    for t in teffsT:
        ok = jnp.logical_and(ok, jnp.logical_and(t <= tmax, t >= tmin))
    for r in ratiosT:
        ok = jnp.logical_and(ok, r >= 0.05)
    ok = jnp.logical_and(ok, r1T >= 0.05)
    ok = jnp.logical_and(ok, r1T <= 1.5)
    ok = jnp.logical_and(ok, plxT >= 1.0 / 3000.0)
    ok = jnp.logical_and(ok, plxT <= 0.25)
    lpT = jnp.where(ok, lpT, -jnp.inf)

    out_ref[:] = jnp.where(jnp.isfinite(lpT), lpT + llT, -jnp.inf)


def log_posterior_fused_T(p, tgt, block=256, interpret=False):
    """Wrapper mirroring log_posterior_fused with the transposed extras."""
    NW = p.shape[0]
    ndim = tgt.ndim
    nT, nG, nd = tgt.D.shape
    NO = nT * nG
    f32 = jnp.float32
    assert NW % block == 0

    tT = jnp.repeat(pk._tent_consts(tgt.temps), nG, axis=1)
    tG = jnp.tile(pk._tent_consts(tgt.loggs), (1, nT))
    med_iters, mm_passes, recip = pk.resolve_dials(tgt)
    kern = functools.partial(
        _posterior_kernel_T,
        nspec=tgt.nspec,
        spectrum_weight=tgt.spectrum_weight,
        median_iters=med_iters,
        mm_passes=mm_passes,
        recip=recip,
    )
    nc, npf = tgt.cmag.shape[0], tgt.pmag.shape[0]
    nm = tgt.mist_teff_nodes.shape[0]
    nav = tgt.av_logd_nodes.shape[0]

    mistT = jnp.concatenate([
        pk._tent_consts(tgt.mist_teff_nodes).T,
        jnp.stack([tgt.mist_logg_nodes, tgt.mist_lum_nodes]).astype(f32).T,
    ], axis=1)  # [nm, 6]
    avT = jnp.concatenate([
        pk._tent_consts(tgt.av_logd_nodes).T,
        jnp.stack([tgt.av_mu_nodes, tgt.av_sig_nodes]).astype(f32).T,
    ], axis=1)  # [nav, 6]

    bcast = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(NW // block,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((block, ndim), lambda i: (i, 0)),
                pl.BlockSpec((ndim, block), lambda i: (0, i)),
                bcast((NO, nd)),
                bcast((1, nd)),
                bcast((1, nd)),
                bcast((1, nd)),
                bcast((3, nd)),
                bcast((3, nd)),
                bcast((4, NO)),
                bcast((4, NO)),
                bcast((NO, 4)),
                bcast((NO, 4)),
                bcast((4, nm)),
                bcast((2, nm)),
                bcast((nm, 6)),
                bcast((nav, 6)),
                bcast((nc, NO)),
                bcast((npf, NO)),
                bcast((2, nc)),
                bcast((4, npf)),
                bcast((ndim, 2)),
            ],
            out_specs=pl.BlockSpec((1, block), lambda i: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, NW), f32),
        interpret=interpret,
    )(
        jnp.stack([tgt.tmin, tgt.tmax, tgt.med_data]).astype(f32).reshape(1, 3),
        p.astype(f32),
        p.astype(f32).T,
        tgt.D.astype(f32).reshape(NO, nd),
        tgt.ext_k_data.astype(f32).reshape(1, nd),
        tgt.data_flux.astype(f32).reshape(1, nd),
        (1.0 / tgt.data_err.astype(f32)).reshape(1, nd),
        tgt.Vpinv.astype(f32),
        tgt.V.T.astype(f32),
        tT,
        tG,
        tT.T,
        tG.T,
        pk._tent_consts(tgt.mist_teff_nodes),
        jnp.stack([tgt.mist_logg_nodes, tgt.mist_lum_nodes]).astype(f32),
        mistT,
        avT,
        tgt.Fc.astype(f32).reshape(NO, nc).T,
        tgt.Fp.astype(f32).reshape(NO, npf).T,
        jnp.stack([tgt.cmag, tgt.cerr]).astype(f32),
        jnp.stack([tgt.pmag, tgt.perr, tgt.phot_zp, tgt.ext_k_cwl]).astype(f32),
        jnp.stack([tgt.prior_mu, tgt.prior_sig]).astype(f32).T,
        )
    return out[0]


def timed(fn, coords, n_iter=20):
    jfn = jax.jit(fn)
    jfn(coords).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = jfn(coords)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    tgt = dataclasses.replace(tgt, eval_block=256, median_iters=14,
                              matmul_passes=3, recip_newton=2)
    coords = init_walker_batch(tgt, truth, NWALK, jnp.float32)

    ref = np.asarray(jax.jit(
        lambda p: pk.log_posterior_fused.__wrapped__(p, tgt))(coords[:512]))
    got = np.asarray(jax.jit(
        lambda p: log_posterior_fused_T(p, tgt))(coords[:512]))
    fin = np.isfinite(ref)
    assert np.array_equal(fin, np.isfinite(got)), "support mismatch"
    rel = np.max(np.abs(got[fin] - ref[fin]) / np.maximum(np.abs(ref[fin]), 1e-9))
    print(f"parity vs production kernel: max rel {rel:.2e} "
          f"({fin.sum()}/{fin.size} finite)", flush=True)
    assert rel < 5e-5, rel

    t_row = timed(lambda p: pk.log_posterior_fused.__wrapped__(p, tgt), coords)
    t_tra = timed(lambda p: log_posterior_fused_T(p, tgt), coords)
    print(f"row-major epilogue:   {t_row:.3f} ms/call "
          f"({NWALK/t_row*1e3/1e6:.1f}M evals/s)", flush=True)
    print(f"transposed epilogue:  {t_tra:.3f} ms/call "
          f"({NWALK/t_tra*1e3/1e6:.1f}M evals/s)", flush=True)
    print(f"delta: {t_row - t_tra:+.3f} ms "
          f"({100*(t_row-t_tra)/t_row:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
