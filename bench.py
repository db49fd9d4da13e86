#!/usr/bin/env python
"""Benchmark: fused log-posterior evaluations/sec through the ensemble sampler.

Runs the koi2298-scale workload (BASELINE.md config 2 shapes: ~1.8k data
wavelengths, 2 contrasts, 6 photometric bands, 14x4 grid) with 32k
stretch-move walkers entirely on device, and reports sustained log-posterior
evaluations per second.  Baseline (BASELINE.json north star): 100,000
evals/sec/chip.

Prints ONE json line:
    {"metric": "logpost_evals_per_sec", "value": N, "unit": "evals/s",
     "vs_baseline": N/1e5, ...efficiency receipts...}

The extra keys are the efficiency accounting (VERDICT r1 item 7): achieved
FLOP/s and utilisation against the chip's two compute units.  This workload
is *VPU-heavy*, not MXU-bound — the spectrum matmul is tiny (K=56) while the
radix median + continuum renorm are elementwise/reduction work — so "MFU"
(matmul FLOPs vs MXU peak) is structurally low.  ``vpu_util_est`` is a
REGRESSION INDICATOR calibrated at the production shape (1.00 = round-3
state), NOT a utilisation proof: the round-4 section ablation +
device-trace attribution (benchmarks/RESULTS.md §section attribution)
showed ~44%% of the kernel is nd-independent, of which ~0.7 ms is a
nonlinear Mosaic scheduling residue no single section owns — the honest
statement is 19.4M evals/s in-kernel at the production dials with the
per-section cost table in RESULTS.md, and the kernel measured within ~5%%
of its practical floor for this program shape (the walker-lanes-major
epilogue experiment bought only +3%% and was not adopted).  The measured
VPU ceiling (~1.42 T ops/s, scripts/vpu_microbench.py — 37%% of the
scaling-book 4-ALU model, which is unachievable) remains the right
denominator for the indicator.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.batched import log_posterior_batch
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble

NWALK = 32768  # throughput saturates ~32k walkers (benchmarks/RESULTS.md sweep)
NSTEPS = 512
BASELINE = 1.0e5  # evals/sec north star (BASELINE.md)

# v5e per-chip peaks (jax-ml.github.io/scaling-book): 197 TFLOP/s bf16 MXU;
# VPU issue limit 4 ALUs x (8 sublanes x 128 lanes) x 940 MHz vector ops.
PEAK_MXU_BF16 = 197e12
PEAK_VPU_OPS = 4 * 8 * 128 * 0.94e9  # scaling-book 4-ALU model: NOT achievable
# Measured on this chip (scripts/vpu_microbench.py, round 3): the highest
# vector throughput any kernel we could construct reaches is ~1.42 T ops/s
# (independent multiply chains) — 37% of the 4-ALU paper model, which is why
# the round-2 receipts (55% est. vs 80% claimed) disagreed: both divided by
# an unachievable denominator with a guessed op model.  Against the measured
# ceiling the fused kernel runs at ~100% (silicon-bound): one median pass
# costs 1.37 ns/eval marginal = ~1.1 multiply-equivalents per element.
MEASURED_VPU_CEILING = 1.42e12
# Calibrated from the round-3 sampler rates against the measured ceiling
# (15.7M evals/s @ 16 passes, 14.3M @ 20, both at the bf16x3 matmul
# default): one median pass = 1.21 mult-equivalents/element.  The non-median
# remainder was 31.1 at the divide-based renorm; the 2-Newton reciprocal
# default (16.56M evals/s measured) shaved it to 28.5 — the ~2.6
# equivalents/element saved match the 4.5-8% divide share measured by
# scripts/try_fast_recip.py.  With these constants ``vpu_util_est`` reads
# 1.00 at the round-3 final state, so it acts as a regression indicator:
# < 1 means the kernel lost ground, > 1 means it genuinely beat the round-3
# silicon state.
MEASURED_PASS_EQUIV = 1.21  # one radix-median count-compare pass
MEASURED_REST_EQUIV = 28.5  # everything else (bf16x3 + recip2 default state)


def _flop_accounting(tgt, iters=20):
    """Analytic per-eval op counts for the bench shapes (receipts, not timers).

    The VPU model was re-calibrated against measured kernel costs in round 3
    (scripts/vpu_microbench.py): the per-element cost of one radix-median
    pass and of the non-median remainder are expressed in measured
    multiply-equivalents against a pure-VPU ceiling kernel, replacing the
    round-2 guess of "3 ops/pass element" whose receipts disagreed with the
    trace-derived claim (VERDICT r2 weak #2); see benchmarks/RESULTS.md.
    """
    nT, nG, nd = tgt.D.shape
    NO = nT * nG
    nc, npf = tgt.cmag.shape[0], tgt.pmag.shape[0]
    nspec = tgt.nspec
    # MXU: spectrum matmul runs as 6 bf16 passes (ops/pallas_kernels._dot_f32)
    # with K=56 padded to 128 by the hardware tile; small photometry matmuls.
    mxu_logical = 2 * NO * nd + 2 * NO * (nc * nspec + npf)
    passes = 3  # bf16x3 default (MCMC_SPEC_MATMUL_PASSES)
    mxu_executed = passes * 2 * 128 * nd + passes * 2 * 128 * (nc * nspec + npf)
    # VPU (per eval): measured mult-equivalents per element -- one median
    # pass costs MEASURED_PASS_EQUIV, the rest of the kernel (extinction,
    # median refinement, renorm, chi^2) MEASURED_REST_EQUIV.
    vpu_ops = iters * MEASURED_PASS_EQUIV * nd + MEASURED_REST_EQUIV * nd
    return mxu_logical, mxu_executed, vpu_ops


def _measure(tgt, truth, dtype):
    logp = lambda batch: log_posterior_batch(batch, tgt)
    coords = init_walker_batch(tgt, truth, NWALK, dtype)
    state = init_ensemble(coords, logp, jax.random.PRNGKey(0))

    # compile + warmup — end with a real host fetch: on the axon tunnel,
    # block_until_ready after the FIRST execution of a fresh program can
    # return early (RESULTS.md round-5 harness trap #4)
    st, chain, _ = run_ensemble(state, logp, n_steps=NSTEPS, thin=NSTEPS)
    np.asarray(chain).ravel()[:1]

    # timed: each stretch step evaluates every walker's log-posterior once
    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        st, chain, _ = run_ensemble(st, logp, n_steps=NSTEPS, thin=NSTEPS)
        chain.block_until_ready()
    dt = time.perf_counter() - t0
    return n_rep * NSTEPS * NWALK / dt


def main():
    import dataclasses

    dtype = jnp.float32
    tgt, truth = build_bench_target(dtype)
    # headline: the production defaults (14-pass midpoint median + bf16x3
    # matmul + 2-Newton renorm reciprocal, each with a measured accuracy
    # receipt -- the round-4 structural tempering bound
    # [scripts/median_tempering_bound_cpu.py: shift bound 0.027 sigma @ 14]
    # plus scripts/fast_median_impact.py, matmul_passes_impact.py,
    # try_fast_recip.py); the fully-exact mode is reported alongside for
    # continuity with the round-1/2 headlines.
    tgt_fast = dataclasses.replace(tgt, median_iters=14, matmul_passes=3,
                                   recip_newton=2)
    tgt_exact = dataclasses.replace(tgt, median_iters=31, matmul_passes=6,
                                    recip_newton=0)
    rate = _measure(tgt_fast, truth, dtype)
    rate_exact = _measure(tgt_exact, truth, dtype)

    mxu_logical, mxu_executed, vpu_ops = _flop_accounting(tgt, iters=14)
    mfu = rate * mxu_executed / PEAK_MXU_BF16
    vpu_util = rate * vpu_ops / MEASURED_VPU_CEILING
    print(
        f"[receipts] {rate/1e6:.2f}M evals/s (14-pass default; exact "
        f"{rate_exact/1e6:.2f}M) | "
        f"MXU: {rate*mxu_logical/1e12:.3f} TFLOP/s logical, "
        f"{rate*mxu_executed/1e12:.2f} TFLOP/s executed (bf16x3, K padded to 128) "
        f"= {100*mfu:.1f}% of bf16 peak | "
        f"VPU: ~{rate*vpu_ops/1e12:.2f} T mult-equivalents/s "
        f"~= {100*vpu_util:.0f}% of the measured 1.42 T ops/s vector ceiling "
        f"(a production-shape REGRESSION INDICATOR, not a utilisation proof "
        f"— RESULTS.md round-4 section attribution)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "logpost_evals_per_sec",
        "value": round(rate, 1),
        "unit": "evals/s",
        "vs_baseline": round(rate / BASELINE, 3),
        "exact_evals_per_sec": round(rate_exact, 1),
        "mfu_mxu": round(mfu, 4),
        "vpu_util_est": round(vpu_util, 3),
        "useful_tflops": round(rate * mxu_logical / 1e12, 3),
    }))


if __name__ == "__main__":
    main()
