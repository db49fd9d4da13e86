#!/usr/bin/env python
"""Benchmark: fused log-posterior evaluations/sec through the ensemble sampler.

Runs the koi2298-scale workload (BASELINE.md config 2 shapes: ~1.8k data
wavelengths, 2 contrasts, 6 photometric bands, 14x4 grid) with 8192
stretch-move walkers entirely on device, and reports sustained log-posterior
evaluations per second.  Baseline (BASELINE.json north star): 100,000
evals/sec/chip.

Prints ONE json line:
    {"metric": "logpost_evals_per_sec", "value": N, "unit": "evals/s",
     "vs_baseline": N/1e5}
"""
import json
import time

import jax
import jax.numpy as jnp

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.batched import log_posterior_batch
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble

NWALK = 8192
NSTEPS = 512
BASELINE = 1.0e5  # evals/sec north star (BASELINE.md)


def main():
    dtype = jnp.float32
    tgt, truth = build_bench_target(dtype)
    logp = lambda batch: log_posterior_batch(batch, tgt)

    coords = init_walker_batch(tgt, truth, NWALK, dtype)
    state = init_ensemble(coords, logp, jax.random.PRNGKey(0))

    # compile + warmup
    st, chain, _ = run_ensemble(state, logp, n_steps=NSTEPS, thin=NSTEPS)
    chain.block_until_ready()

    # timed: each stretch step evaluates every walker's log-posterior once
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        st, chain, _ = run_ensemble(st, logp, n_steps=NSTEPS, thin=NSTEPS)
        chain.block_until_ready()
    dt = time.perf_counter() - t0

    evals = n_rep * NSTEPS * NWALK
    rate = evals / dt
    print(json.dumps({
        "metric": "logpost_evals_per_sec",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / BASELINE, 3),
    }))


if __name__ == "__main__":
    main()
