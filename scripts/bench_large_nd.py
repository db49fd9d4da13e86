"""Large-nd spectrum-path benchmark (round 5, VERDICT r4 weak #1).

The spectral-sharding module exists for the native-resolution regime
(nd ~ 1e5-1e6) — where, until round 5, NO lane had ever been measured,
and the only single-chip implementations were the VMEM-resident fused
kernel (cannot fit a [*, nd] row -> Mosaic OOM) and the XLA fallback
(whose median is an XLA SORT — O(nd log^2 nd) bitonic).  This script
measures, on the real chip:

  1. single-chip XLA backend (sort median) at HiRes-like nd,
  2. the round-5 SEGMENTED lane (nd-tiled Pallas matmul+extinction,
     k-ary count median, nd-tiled partial-stat kernels),
  3. sp-mode at S=1 through make_spec_logpost on a (1, 1) mesh — the
     sharding overhead floor (shard_map + psum structure, no second chip),

using the honest 20-queued-dispatch pipeline harness (the axon tunnel's
~1 ms dispatch cost is latency, not throughput — CLAUDE.md).

Run on TPU:  nohup python scripts/bench_large_nd.py > /tmp/r5/large_nd.log 2>&1 &
Optional argv: nd values to sweep (default 65536 131072), e.g.
  python scripts/bench_large_nd.py 262144 524288     # 1e5-1e6 upper end
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.batched import log_posterior_batch

B = 1024  # walker batch


def timed(fn, coords, reps):
    # compile + warm — end with a real host fetch: on the axon tunnel,
    # block_until_ready after the FIRST execution of a fresh program can
    # return early (RESULTS.md round-5 harness trap #4)
    np.asarray(fn(coords)).ravel()[:1]
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(coords)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    nds = tuple(int(a) for a in sys.argv[1:]) or (65536, 131072)
    for nd in nds:
        tgt, truth = build_bench_target(jnp.float32, nd=nd, grid_step=8.0)
        coords = init_walker_batch(tgt, truth, B, jnp.float32)
        rows = {}

        # --- segmented lane (the default dispatch at nd > 4096 on TPU/f32)
        seg = jax.jit(lambda c: log_posterior_batch(c, tgt))
        rows["segmented"] = timed(seg, coords, 20)

        # --- XLA backend (sort median); reps drop with nd — the bitonic
        # sort is the known O(nd log^2 nd) wall at this scale.  The sort's
        # [B, nd] temporaries can OOM HBM at the 1e5-1e6 upper end; keep
        # the segmented row even when the comparison lane can't run.
        a = np.asarray(seg(coords))
        rel = float("nan")
        try:
            tgt_x = dataclasses.replace(tgt, spectrum_backend="xla")
            xla = jax.jit(lambda c: log_posterior_batch(c, tgt_x))
            rows["xla"] = timed(xla, coords, 5 if nd <= 131072 else 2)
            b = np.asarray(xla(coords))
            finite = np.isfinite(a) & np.isfinite(b)
            rel = (np.max(np.abs(a[finite] - b[finite])
                          / np.maximum(np.abs(b[finite]), 1e-6))
                   if finite.any() else float("nan"))
        except Exception as e:  # XLA lane OOM — report and continue
            print(json.dumps({"metric": "largend_xla_failed", "nd": nd,
                              "error": str(e)[:200]}), flush=True)
        finite = np.isfinite(a)

        # --- sp-mode S=1 (single real chip): shard_map + psum structure
        from jax.sharding import Mesh
        from mcmc_spec_tpu.parallel.spec_shard import (
            make_spec_logpost, shard_target_over_spec)

        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                    ("walkers", "spec"))
        tgt_sp = shard_target_over_spec(tgt, mesh)
        fsp = make_spec_logpost(tgt_sp, mesh)
        sp = lambda c: fsp(c, tgt_sp)
        rows["sp_S1"] = timed(sp, coords, 20)
        c = np.asarray(sp(coords))
        rel_sp = np.max(np.abs(a[finite] - c[finite])
                        / np.maximum(np.abs(a[finite]), 1e-6))

        for lane, dt in rows.items():
            print(json.dumps({
                "metric": f"largend_{lane}", "nd": nd, "walkers": B,
                "ms_per_eval_batch": round(dt * 1e3, 3),
                "evals_per_sec": round(B / dt, 1),
            }), flush=True)
        print(json.dumps({"metric": "largend_parity", "nd": nd,
                          "seg_vs_xla_rel": float(rel),
                          "sp1_vs_seg_rel": float(rel_sp)}), flush=True)


if __name__ == "__main__":
    main()
