"""Fused-eval block-size + nd-scaling probe at the round-4 dials.

Motivation (round 4, `vpu_microbench.py` §[E]): the fused kernel's
non-median remainder barely shrinks when nd halves (2.26 ms @ nd=896 vs
~2.4 ms @ nd=1792 at k=16), i.e. a large share of the call is
nd-INDEPENDENT.  Two hypotheses, distinguished here:

  * per-BLOCK fixed cost (DMA/setup/MXU pipeline latency): fewer, larger
    walker blocks would amortize it -> block 512 should beat 256 now that
    14 passes shrank the nd-scaled share (the "256 beats 512" note in
    `log_posterior_fused` predates the fast-median defaults);
  * per-WALKER nd-independent VPU work (photometry/priors/tent weights):
    block size changes nothing (total walkers constant).

[A] sampler-rate sweep over eval_block in {128, 256, 512} at the
    production dials (run_ensemble-amortized, same harness as bench.py).
[B] direct fused-call nd sweep {896, 1792, 3584} at block 256, k=14,
    scan-amortized, to size the nd-independent share cleanly.

Run on TPU:  nohup python scripts/try_block_size.py > /tmp/r4/block.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.batched import log_posterior_batch
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble

NWALK = 32768
NSTEPS = 512


def sampler_rate(tgt, truth):
    logp = lambda batch: log_posterior_batch(batch, tgt)
    coords = init_walker_batch(tgt, truth, NWALK, jnp.float32)
    state = init_ensemble(coords, logp, jax.random.PRNGKey(0))
    st, chain, _ = run_ensemble(state, logp, n_steps=NSTEPS, thin=NSTEPS)
    chain.block_until_ready()
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        st, chain, _ = run_ensemble(st, logp, n_steps=NSTEPS, thin=NSTEPS)
        chain.block_until_ready()
        best = max(best, NSTEPS * NWALK / (time.perf_counter() - t0))
    return best


def fused_call_ms(tgt, truth, n_iter=50):
    """Scan-amortized wall per fused call (dodges the ~1 ms dispatch floor)."""
    from mcmc_spec_tpu.ops.pallas_kernels import log_posterior_fused

    coords = init_walker_batch(tgt, truth, NWALK, jnp.float32)

    @jax.jit
    def loop(p):
        def body(c, _):
            out = log_posterior_fused(p, tgt)
            return c + out[0], None
        acc, _ = jax.lax.scan(body, 0.0, None, length=n_iter)
        return acc

    loop(coords).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loop(coords).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    dials = dict(median_iters=14, matmul_passes=3, recip_newton=2)

    print("[A] sampler rate vs eval_block (production dials):", flush=True)
    for blk in (128, 256, 512):
        t = dataclasses.replace(tgt, eval_block=blk, **dials)
        r = sampler_rate(t, truth)
        print(f"    block={blk}: {r/1e6:.2f}M evals/s", flush=True)

    print("[B] fused call vs nd (block 256, k=14):", flush=True)
    base = None
    for nd in (896, 1792, 3584):
        tgt_nd, truth_nd = build_bench_target(jnp.float32, nd=nd)
        t = dataclasses.replace(tgt_nd, eval_block=256, **dials)
        ms = fused_call_ms(t, truth_nd)
        if nd == 1792:
            base = ms
        print(f"    nd={nd}: {ms:.3f} ms/call ({NWALK/ms*1e3/1e6:.1f}M evals/s)",
              flush=True)
    if base is not None:
        print(f"    (pure nd-scaling from 1792 would predict "
              f"{base/2:.3f} ms @ 896 and {base*2:.3f} ms @ 3584)", flush=True)


if __name__ == "__main__":
    main()
