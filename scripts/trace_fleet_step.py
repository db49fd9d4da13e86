"""Fleet-step attribution (round 5, VERDICT r4 weak #2).

The fleet path (9 targets x 4096 walkers, BASELINE config 5) runs at
14.61M aggregate evals/s vs 17.72M single-target (-17.5% per chip), and
round 4's only hypothesis (per-target grid reordering) was refuted at
1.4%.  This script points the round-4 attribution toolkit at the fleet
step itself:

1. **Device trace** of 20 pipelined dispatches of (a) the fleet per-eval
   program ``log_posterior_fleet`` and (b) a 20-step
   ``run_fleet_ensemble`` scan, with per-op device durations — splits the
   step into {fleet spectrum kernel, XLA epilogue fusions, sampler
   mechanics} the way round 4 did for the single-target step.
2. **Fixed section ablation** of ``spectrum_chi2_fleet`` — fresh
   ``jax.jit(spectrum_chi2_fleet.__wrapped__)`` per variant with the
   kernel body monkeypatched BEFORE tracing (the module-jitted wrapper
   ignores patches — round-4 trap #2), every variant's output asserted
   to differ from production.

Run on TPU:  nohup python scripts/trace_fleet_step.py > /tmp/r5/fleet_trace.log 2>&1 &
"""
import functools
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.fleet import (
    init_fleet_ensemble,
    log_posterior_fleet,
    run_fleet_ensemble,
    stack_targets,
)
from mcmc_spec_tpu.ops import pallas_kernels as pk

NTGT, NWALK = 9, 4096


def op_table(logdir, top=14):
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    pids = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    totals, counts = {}, {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            totals[name] = totals.get(name, 0.0) + e.get("dur", 0) / 1e3
            counts[name] = counts.get(name, 0) + 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top]
    tot = sum(totals.values())
    print(f"    total device op time: {tot:.2f} ms")
    for name, ms in rows:
        print(f"    {ms:8.2f} ms  x{counts[name]:<5d}  {name[:90]}")
    return tot


def trace_one(tag, fn, warm_and_run, logdir):
    warm_and_run(fn)  # compile + warm
    jax.profiler.start_trace(logdir)
    warm_and_run(fn)
    jax.profiler.stop_trace()
    print(f"[{tag}]:", flush=True)
    tot = op_table(logdir)
    return tot


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    fleet = stack_targets([tgt] * NTGT)
    coords = jnp.stack([init_walker_batch(tgt, truth, NWALK, jnp.float32, seed=i)
                        for i in range(NTGT)])

    # ---- 1a. per-eval program, 20 pipelined dispatches
    logp = jax.jit(lambda c: log_posterior_fleet(c, fleet))

    def run20(fn):
        out = None
        for _ in range(20):
            out = fn(coords)
        out.block_until_ready()

    tot = trace_one("fleet log_posterior x20", logp, run20, "/tmp/xprof_fleet_eval")
    print(f"    => {tot/20:.3f} ms/eval-batch device "
          f"({NTGT*NWALK*20/ (tot/1e3):,.0f} evals/s in-eval)\n", flush=True)

    # ---- 1b. the sampler step (one 20-step scan dispatch)
    state = init_fleet_ensemble(coords, fleet, jax.random.PRNGKey(0))

    def run_scan(fn):
        s, chain, _ = fn()
        jax.block_until_ready(chain)

    step_fn = lambda: run_fleet_ensemble(state, fleet, n_steps=20, thin=20)
    tot = trace_one("fleet 20-step scan", step_fn, run_scan, "/tmp/xprof_fleet_step")
    print(f"    => {tot/20:.3f} ms/step device "
          f"({NTGT*NWALK*20/(tot/1e3):,.0f} evals/s in-step)\n", flush=True)

    # ---- 2. fixed section ablation of spectrum_chi2_fleet
    ntgt, nT, nG, nd = fleet.D.shape
    Df = fleet.D.reshape(ntgt, nT * nG, nd)
    from mcmc_spec_tpu.inference import batched

    _, _, _, _, Wcomb = jax.vmap(batched._forward_small)(coords, fleet)
    av = coords[..., fleet.nspec]
    it, mm, rn = pk.resolve_dials(fleet)

    prod_kernel = pk._spectrum_chi2_fleet_kernel

    def variant_kernel(mode):
        def kern(Wc_ref, av_ref, meta_f_ref, rank_ref, D_ref, kd_ref,
                 data_ref, inv_err_ref, VpinvT_ref, VT_ref, out_ref, *,
                 iters, mm_passes, recip):
            if mode == "empty":
                out_ref[:] = Wc_ref[:, 0][:, None] * 0.0 + av_ref[:]
                return
            if mode == "no_matmul":
                model = (Wc_ref[:, 0][:, None]
                         + jnp.zeros_like(kd_ref[0]))  # [B, nd] broadcast
            else:
                model = pk._dot_f32(Wc_ref[:], D_ref[0], mm_passes)
            av_ = av_ref[:]
            if mode != "no_extinct":
                model = model * jnp.where(
                    av_ > 0, jnp.exp(pk.LN10_04 * av_ * kd_ref[0]), 1.0)
            if mode != "no_median":
                mi = jax.lax.bitcast_convert_type(model, jnp.int32)
                r1 = rank_ref[:, 0][:, None]
                v1 = pk._row_order_stat_bits(mi, r1, iters, midpoint=iters < 31)
                med = jax.lax.bitcast_convert_type(v1, jnp.float32)
                model = model * (meta_f_ref[:, 0][:, None] / med)
            if mode != "no_renorm":
                frac = pk._div(data_ref[0], model, recip)
                Vp = VpinvT_ref[0]
                c0 = jnp.sum(frac * Vp[0][None, :], axis=1, keepdims=True)
                c1 = jnp.sum(frac * Vp[1][None, :], axis=1, keepdims=True)
                c2 = jnp.sum(frac * Vp[2][None, :], axis=1, keepdims=True)
                VT = VT_ref[0]
                fitted = (c0 * VT[0][None, :] + c1 * VT[1][None, :]
                          + c2 * VT[2][None, :])
                data_renorm = pk._div(data_ref[0], fitted, recip)
            else:
                data_renorm = data_ref[0]
            resid = (model - data_renorm) * inv_err_ref[0]
            out_ref[:] = (jnp.sum(resid * resid, axis=1, keepdims=True)
                          * meta_f_ref[:, 1][:, None])
        return kern

    args = (Wcomb, av, Df, fleet.ext_k_data, fleet.data_flux, fleet.data_err,
            fleet.V, fleet.Vpinv, fleet.med_data, fleet.n_data_true)

    def timed(fn):
        fn(*args).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for _ in range(20):
            out = fn(*args)
        out.block_until_ready()
        return (time.perf_counter() - t0) / 20, np.asarray(out)

    results = {}
    base_out = None
    for mode in ("full", "no_matmul", "no_extinct", "no_median",
                 "no_renorm", "empty"):
        if mode == "full":
            pk._spectrum_chi2_fleet_kernel = prod_kernel
        else:
            pk._spectrum_chi2_fleet_kernel = variant_kernel(mode)
        try:
            fn = jax.jit(
                functools.partial(pk.spectrum_chi2_fleet.__wrapped__,
                                  iters=it, mm_passes=mm, recip=rn))
            dt, out = timed(fn)
        finally:
            pk._spectrum_chi2_fleet_kernel = prod_kernel
        results[mode] = dt
        if mode == "full":
            base_out = out
        else:
            assert not np.allclose(out, base_out), f"{mode}: output identical!"
        print(json.dumps({"variant": mode, "ms_per_call": round(dt * 1e3, 3),
                          "delta_vs_full_ms":
                          round((results['full'] - dt) * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
