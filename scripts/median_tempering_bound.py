"""Structural posterior bound for the fast-median dial (VERDICT r3 next #1).

The alpha^2 factorization (pinned bit-for-bit by
tests/test_batched.py::TestAlphaSquaredFactorization) says a relative median
error eps is EXACTLY a (1+eps)^-2 multiplicative reweighting of the spectrum
chi^2 — a tempering of the spectrum term, never a per-point bias.  The
log-posterior perturbation is therefore

    dL(theta) = -0.5 * w * chi_spec(theta) * ((1+eps)^-2 - 1)
              ~  w * chi_spec(theta) * eps(theta),   |eps| <= ln2 * 2^(7-k)

(k = pass count, midpoint mode; w = n_contrast + n_phot), and first-order
perturbation theory bounds any posterior-mean shift by Cauchy-Schwarz:

    |d<g>| = |Cov(g, dL)| <= sigma_g * std(dL)   =>   shift[sigma] <= std(dL).

This script MEASURES the dL distribution over an equilibrated production
ensemble (the quantity the bound needs), per pass count, plus the sampler
throughput at each — the two numbers the default-pass-count decision rests
on.  Run on TPU:

    nohup python scripts/median_tempering_bound.py > /tmp/med_bound.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.batched import log_posterior_batch
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble

NWALK = 4096
NBURN = 4000


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tgt, truth = build_bench_target(jnp.float32)

    # equilibrate with EXACT dials
    exact = dataclasses.replace(tgt, median_iters=31, matmul_passes=6,
                                recip_newton=0)
    logp_exact = lambda b: log_posterior_batch(b, exact)
    coords = init_walker_batch(exact, truth, NWALK, jnp.float32)
    state = init_ensemble(coords, logp_exact, jax.random.PRNGKey(7))
    state, _, _ = run_ensemble(state, logp_exact, n_steps=NBURN, thin=NBURN)
    eq = state.coords
    L31 = np.asarray(jax.jit(logp_exact)(eq), np.float64)
    fin = np.isfinite(L31)
    print(f"equilibrated: {fin.sum()}/{NWALK} finite logp", flush=True)

    # dL distribution per pass count (median dial ISOLATED: mm/recip exact)
    out = {}
    for k in (20, 16, 14, 12, 10):
        t = dataclasses.replace(tgt, median_iters=k, matmul_passes=6,
                                recip_newton=0)
        Lk = np.asarray(jax.jit(lambda b: log_posterior_batch(b, t))(eq),
                        np.float64)
        dL = Lk[fin] - L31[fin]
        out[k] = dict(
            eps_bound=float(np.log(2) * 2.0 ** (7 - k)),
            dL_max=float(np.max(np.abs(dL))),
            dL_std=float(np.std(dL)),
            dL_mean=float(np.mean(dL)),
        )
        print(f"iters={k}: |dL|max={out[k]['dL_max']:.4g} "
              f"std={out[k]['dL_std']:.4g} mean={out[k]['dL_mean']:+.4g} "
              f"(shift bound = std = {out[k]['dL_std']:.4g} sigma)", flush=True)

    # throughput at PRODUCTION dials (mm=3, recip=2), per pass count
    print("\nthroughput (production mm=3/recip=2):", flush=True)
    rates = {}
    for k in (31, 20, 16, 14, 12):
        t = dataclasses.replace(tgt, median_iters=k, matmul_passes=3,
                                recip_newton=2)
        logp = lambda b: log_posterior_batch(b, t)
        st2 = init_ensemble(eq, logp, jax.random.PRNGKey(11))
        # warm with the SAME static args (n_steps/thin retrace; CLAUDE.md)
        st2, _, _ = run_ensemble(st2, logp, n_steps=512, thin=512)
        jax.block_until_ready(st2.coords)
        t0 = time.perf_counter()
        st3, _, _ = run_ensemble(st2, logp, n_steps=512, thin=512)
        jax.block_until_ready(st3.coords)
        dt = time.perf_counter() - t0
        rates[k] = NWALK * 512 / dt / 1e6
        print(f"  iters={k}: {rates[k]:.2f}M evals/s", flush=True)

    print("\n" + json.dumps(dict(dL=out, rate_Mevals=rates)))


if __name__ == "__main__":
    main()
