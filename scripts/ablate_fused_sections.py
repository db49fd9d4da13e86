"""Per-section cost ablation of the fused posterior kernel (round 4).

`try_block_size.py` measured the production fused call as t = a + b*nd with
a ≈ 1.2-1.3 ms — 55-59% of the nd=1792 call is nd-INDEPENDENT, and block
512 vs 256 tied, so it is per-WALKER work, not per-block overhead.  This
script attributes `a` by compiling kernel variants with sections stubbed:

  full        — the real kernel (sanity: matches log_posterior_fused)
  no_phot     — contrast/photometry matmuls + mag chains skipped
  no_priors   — prior + Av(d) + bounds section skipped
  no_epilogue — both of the above skipped (W construction + spectrum only)
  no_spectrum — spectrum block skipped (epilogue cost in isolation)

Each variant is timed scan-amortized at the production shape (32k walkers,
nd=1792, block 256, 14/3/2 dials).  The candidate fix this prices: the
per-walker scalar chains run on [B, 1]-shaped arrays = 32 vregs per op for
256 useful lanes (1/128 lane utilization); a walker-lanes-major layout
([1, B] rows) would cut them ~16x.

Run on TPU:  nohup python scripts/ablate_fused_sections.py > /tmp/r4/ablate.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk

NWALK = 32768
DIALS = dict(median_iters=14, matmul_passes=3, recip_newton=2)


def variant_kernel(do_phot, do_priors, do_spectrum, do_w=True):
    """A _posterior_kernel clone with sections gated by static flags.

    Mirrors ops/pallas_kernels._posterior_kernel (kept in sync by the
    `full` sanity check below); stubbed sections are replaced by zeros of
    the right shape so the data flow and output layout stay identical.
    """

    def kern(scal_ref, p_ref, D_ref, kd_ref, data_ref, inv_err_ref,
             VpinvT_ref, VT_ref, tentT_ref, tentG_ref, mist_tent_ref,
             mist_vals_ref, av_tent_ref, av_vals_ref, Fc_ref, Fp_ref,
             cobs_ref, pobs_ref, prior_ref, out_ref, *, nspec, fit_plx,
             dist_fit, rad_prior, spectrum_weight, median_iters, rad_sigma,
             mm_passes, recip):
        p = p_ref[:]
        n = nspec
        f32 = jnp.float32
        tmin = scal_ref[0, 0]
        tmax = scal_ref[0, 1]
        med_data = scal_ref[0, 2]
        tiny = jnp.asarray(jnp.finfo(f32).tiny, f32)

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
        cmags = []
        for s in range(n):
            if do_w:
                wm = pk._tent_w(mist_tc, teffs[s])
                logg_s = jnp.sum(wm * logg_nodes, axis=1, keepdims=True)
                Wk = pk._tent_w(tT, teffs[s]) * pk._tent_w(tG, logg_s)
            else:
                # cost stub: Wcomb becomes a 2-op broadcast, same shape
                Wk = teffs[s] * jnp.full((1, tT.shape[1]), 1e-4, f32)
            sWk = scales[s] * Wk
            Wcomb = sWk if Wcomb is None else Wcomb + sWk
            if do_phot:
                cflux = pk._dot_f32(sWk, Fc_ref[:], mm_passes)
                cmags.append(-2.5 / pk.LN10 * jnp.log(jnp.maximum(cflux, tiny)))

        nc = Fc_ref.shape[1]
        if do_phot:
            contrasts = cmags[1] - cmags[0]
            pflux = pk._dot_f32(Wcomb, Fp_ref[:], mm_passes)
            pmag_obs = pobs_ref[0][None, :]
            perr = pobs_ref[1][None, :]
            zp = pobs_ref[2][None, :]
            kcwl = pobs_ref[3][None, :]
            phot = -2.5 / pk.LN10 * jnp.log(jnp.maximum(pflux / zp, tiny))
            phot = jnp.where(av > 0, phot + av * kcwl, phot)
            cmag_obs = cobs_ref[0][None, :]
            cerr = cobs_ref[1][None, :]
            chi_c = jnp.sum(((contrasts - cmag_obs) / cerr) ** 2, axis=1,
                            keepdims=True)
            chi_p = jnp.sum(((phot - pmag_obs) / perr) ** 2, axis=1,
                            keepdims=True)
        else:
            chi_c = jnp.zeros_like(av)
            chi_p = jnp.zeros_like(av)

        if do_spectrum:
            chi_spec = pk._spectrum_block(
                Wcomb, av, D_ref[:], kd_ref[:], data_ref[:], inv_err_ref[:],
                VpinvT_ref[:], VT_ref[:], med_data, median_iters, mm_passes,
                recip=recip,
            )
        else:
            chi_spec = jnp.zeros_like(chi_c) + jnp.sum(Wcomb, axis=1,
                                                       keepdims=True)

        npf = Fp_ref.shape[1]
        weight = float(nc + npf)
        cs = spectrum_weight * weight * chi_spec + chi_c + chi_p
        ll = jnp.where(jnp.isnan(cs), -jnp.inf, -0.5 * cs)

        if do_priors:
            lp = jnp.zeros_like(av)
            dist_pc = 1.0 / jnp.maximum(plx, 1e-12)
            logd = jnp.log(jnp.maximum(dist_pc, 1e-3))
            wav = pk._tent_w(av_tent_ref[:], logd)
            mu = jnp.sum(wav * av_vals_ref[0][None, :], axis=1, keepdims=True)
            sig = jnp.sum(wav * av_vals_ref[1][None, :], axis=1, keepdims=True)
            lp += -0.5 * ((av - mu) / sig) ** 2
            pmu = prior_ref[0][None, :]
            psig = prior_ref[1][None, :]
            lp += jnp.sum(
                jnp.where(pmu != 0, -0.5 * ((p - pmu) / psig) ** 2, 0.0),
                axis=1, keepdims=True,
            )
            ok = (av >= 0)
            for t in teffs:
                ok = jnp.logical_and(ok, jnp.logical_and(t <= tmax, t >= tmin))
            for r in ratios:
                ok = jnp.logical_and(ok, r >= 0.05)
            ok = jnp.logical_and(ok, r1 >= 0.05)
            ok = jnp.logical_and(ok, r1 <= 1.5)
            ok = jnp.logical_and(ok, plx >= 1.0 / 3000.0)
            ok = jnp.logical_and(ok, plx <= 0.25)
            lp = jnp.where(ok, lp, -jnp.inf)
        else:
            lp = jnp.zeros_like(av)

        out_ref[:] = jnp.where(jnp.isfinite(lp), lp + ll, -jnp.inf)

    return kern


def timed_call(tgt, coords, n_iter=20):
    """Direct pipelined dispatch: the scan harness is untrustworthy here
    (XLA can hoist the pallas_call out of the scan even behind a
    loop-carried perturbation — measured: a 101-iteration scan costing the
    same as 1 iteration).  Queued dispatches pipeline through the tunnel,
    so per-call cost = wall / n with only the first call paying latency."""
    # __wrapped__: log_posterior_fused is module-level jitted, and its trace
    # cache is keyed on (avals, statics) ONLY — a monkeypatched
    # _posterior_kernel is invisible to it, so calling the jitted wrapper
    # silently reruns the production kernel (this bit: the first two
    # ablation passes produced identical-fingerprint executables for every
    # variant).  Tracing the unjitted function inside a fresh jit per
    # variant picks up the patch.
    fused = jax.jit(lambda p: pk.log_posterior_fused.__wrapped__(p, tgt))
    fused(coords).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fused(coords)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    tgt = dataclasses.replace(tgt, eval_block=256, **DIALS)
    coords = init_walker_batch(tgt, truth, NWALK, jnp.float32)

    # reference via the same __wrapped__/fresh-jit path the variants use —
    # the module-jitted wrapper compiles in a different jit context and
    # differs at ~1e-4 rel (bf16x3 sensitivity to XLA's constant-fold
    # placement), which is not what this sanity check is for
    real = np.asarray(jax.jit(
        lambda p: pk.log_posterior_fused.__wrapped__(p, tgt))(coords[:512]))

    orig = pk._posterior_kernel
    variants = [
        ("full", dict(do_phot=True, do_priors=True, do_spectrum=True)),
        ("no_phot", dict(do_phot=False, do_priors=True, do_spectrum=True)),
        ("no_priors", dict(do_phot=True, do_priors=False, do_spectrum=True)),
        ("no_epilogue", dict(do_phot=False, do_priors=False, do_spectrum=True)),
        ("no_spectrum", dict(do_phot=True, do_priors=True, do_spectrum=False)),
        # spectrum block alone, W stubbed to a 2-op broadcast
        ("spec_only", dict(do_phot=False, do_priors=False, do_spectrum=True,
                           do_w=False)),
        # near-empty body, FULL input signature: the DMA + launch floor
        ("empty", dict(do_phot=False, do_priors=False, do_spectrum=False,
                       do_w=False)),
    ]
    results = {}
    try:
        for name, flags in variants:
            pk._posterior_kernel = variant_kernel(**flags)
            # a FRESH lambda per variant: pjit's global trace cache is
            # keyed on the function object, so reusing one lambda serves
            # the previous variant's jaxpr and the patch is ignored
            # (caught by the difference assertion below)
            got = np.asarray(jax.jit(
                lambda p: pk.log_posterior_fused.__wrapped__(p, tgt)
            )(coords[:512]))
            if name == "full":
                fin = np.isfinite(real)
                assert np.array_equal(fin, np.isfinite(got))
                err = np.max(np.abs(got[fin] - real[fin])
                             / np.maximum(np.abs(real[fin]), 1e-9))
                print(f"full-variant sanity vs production kernel: "
                      f"max rel {err:.2e}", flush=True)
                assert err < 1e-6, err
            else:
                # the patch must actually change the program — the jitted
                # wrapper's trace cache silently ignored it twice
                assert not np.allclose(got, real[:512], equal_nan=True), name
            ms = timed_call(tgt, coords)
            results[name] = ms
            print(f"  {name:>12}: {ms:.3f} ms/call "
                  f"({NWALK/ms*1e3/1e6:.1f}M evals/s)", flush=True)
    finally:
        pk._posterior_kernel = orig

    f = results["full"]
    print("\nattribution (vs full):")
    for name in results:
        if name != "full":
            print(f"  {name:>12}: saves {f - results[name]:+.3f} ms "
                  f"({100 * (f - results[name]) / f:+.1f}%)")


if __name__ == "__main__":
    main()
