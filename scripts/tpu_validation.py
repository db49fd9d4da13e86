#!/usr/bin/env python
"""On-hardware validation: production path (f32 + Pallas kernel) recovers truth.

The test suite validates semantics on CPU/float64; this script runs the full
two-stage fit on the real chip in production precision and checks that every
truth parameter lies inside the central posterior interval.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from mcmc_spec_tpu.bench_target import build_bench_target
from mcmc_spec_tpu.inference.anneal import init_walkers, run_anneal
from mcmc_spec_tpu.inference.batched import log_posterior_batch
from mcmc_spec_tpu.inference.stretch import acceptance_fraction, init_ensemble, run_ensemble
from mcmc_spec_tpu.utils.flags import use_pallas_spectrum
from mcmc_spec_tpu.utils.health import check_ensemble_health


def main():
    dtype = jnp.float32
    print(f"backend={jax.default_backend()} pallas_kernel={use_pallas_spectrum(dtype)}")
    tgt, truth = build_bench_target(dtype)
    names = ["T1", "T2", "Av", "R1", "R2/R1", "plx"]

    t0 = time.perf_counter()
    p0 = init_walkers(tgt, 150, truth[-1], 0.05e-3, jax.random.PRNGKey(0))
    params, chi, _ = run_anneal(tgt, p0, jax.random.PRNGKey(1), steps=400)
    chi = np.asarray(chi)
    print(f"anneal: {time.perf_counter()-t0:.1f}s best chi2 {chi.min():.2f}")

    order = np.argsort(chi)
    seeds = np.asarray(params)[order[:50]]
    seeds = seeds * (1 + 1e-5 * np.random.RandomState(0).randn(*seeds.shape))
    logp = lambda b: log_posterior_batch(b, tgt)
    state = init_ensemble(jnp.asarray(seeds, dtype), logp, jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    state, chain, logps = run_ensemble(state, logp, n_steps=4000, thin=4)
    chain = np.asarray(chain)
    print(f"mcmc: {time.perf_counter()-t0:.1f}s "
          f"accept={float(acceptance_fraction(state, 4000)):.3f}")

    samples = chain[250:].reshape(-1, 6)
    health = check_ensemble_health(chain, np.asarray(logps),
                                   float(acceptance_fraction(state, 4000)))
    print("health:", "OK" if health["ok"] else health["warnings"])

    ok = True
    for i, name in enumerate(names):
        q2, q16, q50, q84, q98 = np.percentile(samples[:, i], [2.5, 16, 50, 84, 97.5])
        inside = q2 <= truth[i] <= q98
        ok &= inside
        print(f"{name:6s} truth={truth[i]:.5g} median={q50:.5g} "
              f"68%=[{q16:.5g},{q84:.5g}] in95%={inside}")
    print("VALIDATION", "PASSED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
