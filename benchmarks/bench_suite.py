#!/usr/bin/env python
"""Extended benchmark suite (beyond the driver's single-metric bench.py).

Covers the BASELINE.md workload configs on real hardware:

* ``chain``  — config 2 shape: the full koi2298-style MCMC chain
  (50 walkers x 15,302 steps, the reference's nburn+nsteps) wall-clock.
* ``fleet``  — config 5: 9 targets x 4096 walkers in one program,
  aggregate evals/sec.
* ``anneal`` — stage 1: 150 walkers x 50*400 annealing schedule wall-clock
  (the reference runs this on a 15-process pool for hours).
* ``evals``  — same metric as bench.py (headline).

Usage: python benchmarks/bench_suite.py [chain|fleet|anneal|evals|all]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.anneal import init_walkers, run_anneal
from mcmc_spec_tpu.inference.batched import log_posterior_batch
from mcmc_spec_tpu.inference.fleet import (
    init_fleet_ensemble,
    run_fleet_ensemble,
    stack_targets,
)
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble

DTYPE = jnp.float32


def bench_chain(tgt, truth):
    """Reference koi2298 chain: 50 walkers, 301 burn + 15001 steps."""
    nw, nburn, nsteps = 50, 301, 15001
    logp = lambda b: log_posterior_batch(b, tgt)
    coords = init_walker_batch(tgt, truth, nw, DTYPE)
    state = init_ensemble(coords, logp, jax.random.PRNGKey(0))
    # compile both stage shapes first (n_steps/thin are static)
    s, c, _ = run_ensemble(state, logp, n_steps=nburn, thin=nburn)
    jax.block_until_ready(c)
    s, c, _ = run_ensemble(state, logp, n_steps=nsteps, thin=100)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    state, chain, _ = run_ensemble(state, logp, n_steps=nburn, thin=nburn)
    jax.block_until_ready(chain)
    t_burn = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, chain, logps = run_ensemble(state, logp, n_steps=nsteps, thin=100)
    jax.block_until_ready(chain)
    t_sample = time.perf_counter() - t0
    return {
        "metric": "koi2298_chain_wall_clock",
        "value": round(t_burn + t_sample, 3),
        "unit": "s (301 burn + 15001 steps, 50 walkers)",
        "steps_per_sec": round(nsteps / t_sample, 1),
    }


def bench_fleet(tgt, truth):
    """Config 5: 9 targets x 4096 walkers."""
    ntgt, nw, nsteps = 9, 4096, 64
    fleet = stack_targets([tgt] * ntgt)
    coords = jnp.stack([init_walker_batch(tgt, truth, nw, DTYPE, seed=i)
                        for i in range(ntgt)])
    state = init_fleet_ensemble(coords, fleet, jax.random.PRNGKey(0))
    state, chain, _ = run_fleet_ensemble(state, fleet, n_steps=nsteps, thin=nsteps)
    jax.block_until_ready(chain)
    t0 = time.perf_counter()
    state, chain, _ = run_fleet_ensemble(state, fleet, n_steps=nsteps, thin=nsteps)
    jax.block_until_ready(chain)
    dt = time.perf_counter() - t0
    rate = ntgt * nw * nsteps / dt
    return {
        "metric": "fleet_evals_per_sec",
        "value": round(rate, 1),
        "unit": "evals/s (9 targets x 4096 walkers)",
    }


def bench_anneal(tgt, truth):
    """Stage 1: the reference's nwalk=150, nstep=400 schedule."""
    p0 = init_walkers(tgt, 150, truth[-1], 0.05e-3, jax.random.PRNGKey(0))
    # compile with the same static schedule
    run_anneal(tgt, p0, jax.random.PRNGKey(1), steps=400)[1].block_until_ready()
    t0 = time.perf_counter()
    params, chi, _ = run_anneal(tgt, p0, jax.random.PRNGKey(1), steps=400)
    chi.block_until_ready()
    dt = time.perf_counter() - t0
    return {
        "metric": "anneal_stage_wall_clock",
        "value": round(dt, 3),
        "unit": "s (150 walkers x 50*400 schedule)",
    }


def bench_evals(tgt, truth):
    nw, nsteps = 4096, 512
    logp = lambda b: log_posterior_batch(b, tgt)
    coords = init_walker_batch(tgt, truth, nw, DTYPE)
    state = init_ensemble(coords, logp, jax.random.PRNGKey(0))
    s, c, _ = run_ensemble(state, logp, n_steps=nsteps, thin=nsteps)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(3):
        s, c, _ = run_ensemble(s, logp, n_steps=nsteps, thin=nsteps)
    jax.block_until_ready(c)
    dt = time.perf_counter() - t0
    return {
        "metric": "logpost_evals_per_sec",
        "value": round(3 * nsteps * nw / dt, 1),
        "unit": "evals/s",
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    tgt, truth = build_bench_target(DTYPE)
    benches = {"chain": bench_chain, "fleet": bench_fleet,
               "anneal": bench_anneal, "evals": bench_evals}
    names = benches if which == "all" else {which: benches[which]}
    for name, fn in names.items():
        print(json.dumps(fn(tgt, truth)), flush=True)


if __name__ == "__main__":
    main()
