"""End-to-end posterior impact of the bf16x3 matmul variant.

``try_matmul_passes.py`` measured bf16x3 at 1.09x the fused-eval rate
(dispatch-corrected) with max |dlogpost| 1.6e-2 vs bf16x6 — right at the
acceptance-noise boundary, so the adopt/reject decision needs the same
treatment as the fast-median dial: identical-RNG chains, diffed marginals.

Run on TPU:
    nohup python scripts/matmul_passes_impact.py > /tmp/mm_impact.log 2>&1 &
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble
from mcmc_spec_tpu.ops import pallas_kernels as pk
from scripts.try_matmul_passes import _dot_variant

NWALK = 2048
NBURN = 3000
NSTEPS = 6000
LABELS = ["T1", "T2", "Av", "R1", "R2/R1", "plx"]


def run_chain(tgt, truth, n_passes):
    orig = pk._dot_f32
    pk._dot_f32 = _dot_variant(n_passes)
    try:
        logp = jax.jit(lambda b: pk.log_posterior_fused.__wrapped__(b, tgt))
        coords = init_walker_batch(tgt, truth, NWALK, jnp.float32)
        state = init_ensemble(coords, logp, jax.random.PRNGKey(7))
        t0 = time.perf_counter()
        state, _, _ = run_ensemble(state, logp, n_steps=NBURN, thin=NBURN)
        _, chain, _ = run_ensemble(state, logp, n_steps=NSTEPS, thin=8)
        chain = np.asarray(chain).reshape(-1, len(LABELS))
        print(f"  passes={n_passes}: "
              f"{NWALK*(NBURN+NSTEPS)/(time.perf_counter()-t0)/1e6:.1f}M evals/s "
              f"(incl. compile)", flush=True)
        return chain
    finally:
        pk._dot_f32 = orig


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    chains = {n: run_chain(tgt, truth, n) for n in (6, 3)}

    base = chains[6]
    med0, sig0 = np.median(base, axis=0), base.std(axis=0)
    print(f"\n6-pass medians: {np.array2string(med0, precision=4)}")
    print(f"6-pass sigmas:  {np.array2string(sig0, precision=4)}")
    med = np.median(chains[3], axis=0)
    sig = chains[3].std(axis=0)
    shift = (med - med0) / sig0
    print("\nbf16x3:")
    for i, lab in enumerate(LABELS):
        print(f"  {lab:>6}: median shift {shift[i]:+.3f} sigma, "
              f"sigma ratio {sig[i]/sig0[i]:.3f}")
    print(f"  max |shift| = {np.max(np.abs(shift)):.3f} sigma")


if __name__ == "__main__":
    main()
