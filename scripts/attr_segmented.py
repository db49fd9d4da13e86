"""Stage attribution of the large-nd segmented lane (round 5).

The lane's cost model (ops/spec_segmented.py docstring) predicts it is
HBM-streaming-bound: 1 write + ~20 reads of the [NW, nd] model (16 k-ary
median rounds + 2 even-rank refinement scans + renorm + resid).  Nobody
has MEASURED the stage split, and spectrum_chi2_segmented's docstring
asserts "the median is not the bottleneck knob" without a receipt.  This
script times the composition prefix-wise on the real chip (20-queued
dispatches, warmup ends in a host fetch — trap #4) so each stage's
marginal cost is on record before any fast-median work is attempted.

Run on TPU:  nohup python scripts/attr_segmented.py > /tmp/r5/attr_seg.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.batched import _forward_small
from mcmc_spec_tpu.ops import spec_segmented as seg

B = 1024


def timed(fn, arg, reps=20):
    np.asarray(fn(arg)).ravel()[:1]  # compile + warm, real host fetch
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(arg)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    for nd in (65536,):
        tgt, truth = build_bench_target(jnp.float32, nd=nd, grid_step=8.0)
        coords = init_walker_batch(tgt, truth, B, jnp.float32)
        nT, nG, _ = tgt.D.shape
        D_flat = tgt.D.reshape(nT * nG, nd)
        print(f"nd={nd} NW={B} NO={nT * nG} "
              f"model bytes={B * nd * 4 / 1e6:.0f} MB", flush=True)

        _, _, _, _, Wcomb = _forward_small(coords, tgt)
        av = coords[:, tgt.nspec]
        Wcomb, av = jax.device_put(Wcomb), jax.device_put(av)
        # model passed as an ARGUMENT, never a closure: a closed-over 268 MB
        # array is baked into the program as a constant and the remote
        # compile upload dies with HTTP 413
        model = seg.model_extinct(Wcomb, av, D_flat, tgt.ext_k_data, 3)
        ones = jnp.ones((B,), jnp.float32)
        ones3 = jnp.ones((B, 3), jnp.float32)

        stages = {
            "model_extinct": (lambda a: seg.model_extinct(
                Wcomb, a, D_flat, tgt.ext_k_data, 3), av),
            "median_only(premat)": (lambda m: seg.median_nonneg_xla(
                m, tgt.n_data_true), model),
            "renorm_only(premat)": (lambda m: seg.renorm_partials(
                m, ones, tgt.data_flux, tgt.Vpinv, 2), model),
            "resid_only(premat)": (lambda m: seg.resid_chi2(
                m, ones, ones3, tgt.data_flux, tgt.data_err,
                tgt.V, 2, renorm=True), model),
            "full_chi2": (lambda a: seg.spectrum_chi2_segmented(
                Wcomb, a, D_flat, tgt.ext_k_data,
                tgt.data_flux, tgt.data_err, tgt.V, tgt.Vpinv, tgt.med_data,
                tgt.n_data_true, iters=14, mm_passes=3, recip=2), av),
        }
        rows = {}
        for name, (fn, arg) in stages.items():
            f = jax.jit(fn)
            dt = timed(f, arg)
            rows[name] = dt * 1e3
            print(json.dumps({"stage": name, "ms_per_call": round(dt * 1e3, 3)}),
                  flush=True)
        acct = (rows["model_extinct"] + rows["median_only(premat)"]
                + rows["renorm_only(premat)"] + rows["resid_only(premat)"])
        print(f"sum of stages {acct:.3f} ms vs full {rows['full_chi2']:.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
