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


def _walker_cloud(tgt, truth, nw, seed=11):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        np.asarray(truth)[None, :] * (1 + 0.02 * rng.randn(nw, len(truth))),
        jnp.float32)


def kernel_shape_sweep():
    """Compile AND run all four kernel wrappers ON DEVICE at the
    Mosaic-adversarial shapes the interpret-mode tests cover
    (tests/test_pallas_kernel.py::TestVMEMBlockSafety /
    TestFleetWalkerPadding) plus a deliberately VMEM-heavy width: compile-time
    rejections and scoped-VMEM overflows (the round-2 advisor's bug class)
    cannot show up in CPU interpret runs (VERDICT r3 next #9).  Every result
    is checked against the XLA fallback at 5e-5 — same bound as the tests."""
    import dataclasses

    from mcmc_spec_tpu.inference import batched
    from mcmc_spec_tpu.inference.fleet import stack_targets
    from mcmc_spec_tpu.ops.pallas_kernels import (
        log_posterior_fleet_fused,
        log_posterior_fused,
        resolve_dials,
        spectrum_chi2,
        spectrum_chi2_fleet,
    )

    failures = []

    def check(label, got, ref, rtol=5e-5):
        got, ref = np.asarray(got), np.asarray(ref)
        fin = np.isfinite(ref)
        ok = (np.array_equal(np.isfinite(got), fin) and fin.any()
              and np.allclose(got[fin], ref[fin], rtol=rtol,
                              atol=1e-4 * np.abs(ref[fin]).max()))
        print(f"  {label}: {'ok' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures.append(label)

    # --- single-target wrappers: 600 (> cap, not a multiple), 520 (8-mult,
    # not block-mult), 256 (single whole block); nd=1792 and a VMEM-heavy
    # nd=3584 (exercises the 256-cap branch on device)
    for nd in (1792, 3584):
        tgt, truth = build_bench_target(jnp.float32, nd=nd)
        exact = dataclasses.replace(tgt, median_iters=31, matmul_passes=6,
                                    recip_newton=0)
        it, mm, rn = resolve_dials(exact)
        nT, nG, _ = exact.D.shape
        for nw in (600, 520, 256):
            P = _walker_cloud(exact, truth, nw)
            _, _, _, _, Wcomb = batched._forward_small(P, exact)
            got = spectrum_chi2(
                Wcomb, P[:, 2], exact.D.reshape(nT * nG, nd), exact.ext_k_data,
                exact.data_flux, exact.data_err, exact.V, exact.Vpinv,
                exact.med_data, iters=it, mm_passes=mm, recip=rn)
            ref = batched._spec_chi2_xla(Wcomb, P[:, 2], exact)
            check(f"spectrum_chi2 nd={nd} nw={nw}", got, ref)
            got = log_posterior_fused(P, exact)
            # spectrum_backend="xla" forces the full XLA composition path
            ref = batched.log_posterior_batch(
                P, dataclasses.replace(exact, spectrum_backend="xla"))
            check(f"log_posterior_fused nd={nd} nw={nw}", got, ref)

    # --- fleet wrappers: padded targets (nd 1700 -> 1792, nc 1 -> 2),
    # odd walker counts 12 (not 8-mult) and 520
    singles = [
        build_bench_target(jnp.float32, nd=1700, seed=1,
                           pad_nd=1792)[0],
        build_bench_target(jnp.float32, nd=1792, seed=2)[0],
    ]
    singles = [dataclasses.replace(s, median_iters=31, matmul_passes=6,
                                   recip_newton=0) for s in singles]
    fleet = stack_targets(singles)
    it, mm, rn = resolve_dials(fleet)
    _, truth = build_bench_target(jnp.float32, nd=256, grid_step=8.0)
    ntgt, nT, nG, nd = fleet.D.shape
    for nw in (12, 520):
        P = jnp.stack([_walker_cloud(fleet, truth, nw, seed=s)
                       for s in (3, 4)])
        _, _, _, _, Wcomb = jax.vmap(batched._forward_small)(P, fleet)
        got = spectrum_chi2_fleet(
            Wcomb, P[..., fleet.nspec], fleet.D.reshape(ntgt, nT * nG, nd),
            fleet.ext_k_data, fleet.data_flux, fleet.data_err, fleet.V,
            fleet.Vpinv, fleet.med_data, fleet.n_data_true,
            iters=it, mm_passes=mm, recip=rn)
        ref = jax.vmap(batched._spec_chi2_xla)(Wcomb, P[..., fleet.nspec], fleet)
        check(f"spectrum_chi2_fleet nw={nw}", got, ref)
        got = log_posterior_fleet_fused(P, fleet)
        ref = jax.vmap(batched.log_posterior_batch)(P, fleet)
        check(f"log_posterior_fleet_fused nw={nw}", got, ref)

    if failures:
        print(f"SHAPE SWEEP FAILED: {failures}")
        return False
    print("SHAPE SWEEP PASSED")
    return True


def main():
    dtype = jnp.float32
    print(f"backend={jax.default_backend()} pallas_kernel={use_pallas_spectrum(dtype)}")
    print("--- kernel shape sweep (Mosaic-adversarial shapes on device) ---")
    shapes_ok = kernel_shape_sweep()
    if "--shapes-only" in sys.argv:
        print("VALIDATION", "PASSED" if shapes_ok else "FAILED")
        return 0 if shapes_ok else 1
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

    ok = shapes_ok
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
