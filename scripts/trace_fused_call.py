"""Device trace of standalone fused-eval dispatches (round 4).

The section ablation measured empty-body ≈ full kernel (~2.9-3.0 ms via
direct dispatch; ~2.2 via a scan harness), while a structurally similar
hand-built trivial kernel runs in ~0.03 ms — so either the fused call's
Mosaic kernel itself has a ~2 ms floor, or the standalone harnesses carry
~2 ms of non-kernel overhead (wrapper prep ops, dispatch) that the
in-sampler path amortizes.  An xprof trace settles it: per-op device
durations for 20 back-to-back dispatches of (a) the production kernel and
(b) the empty-body variant behind the same signature.

Run on TPU:  nohup python scripts/trace_fused_call.py > /tmp/r4/trace_fused.log 2>&1 &
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk

NWALK = 32768


def op_table(logdir):
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
    totals = {}
    counts = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            totals[name] = totals.get(name, 0.0) + e.get("dur", 0) / 1e3
            counts[name] = counts.get(name, 0) + 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:15]
    tot = sum(totals.values())
    print(f"    total device op time: {tot:.2f} ms")
    for name, ms in rows:
        print(f"    {ms:8.2f} ms  x{counts[name]:<4d}  {name[:90]}")
    return tot


def trace_one(tag, fn, coords, logdir):
    fn(coords).block_until_ready()
    jax.profiler.start_trace(logdir)
    out = None
    for _ in range(20):
        out = fn(coords)
    out.block_until_ready()
    jax.profiler.stop_trace()
    print(f"[{tag}] 20 dispatches:", flush=True)
    tot = op_table(logdir)
    print(f"    => {tot/20:.3f} ms/call device time", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    dials = dict(eval_block=256, median_iters=14, matmul_passes=3,
                 recip_newton=2)

    # kernel device time vs nd — the definitive version of the
    # try_block_size.py §[B] sweep (that one used the scan harness)
    for nd in (896, 1792, 3584):
        tgt, truth = build_bench_target(jnp.float32, nd=nd)
        tgt = dataclasses.replace(tgt, **dials)
        coords = init_walker_batch(tgt, truth, NWALK, jnp.float32)
        fused = jax.jit(lambda p, t=tgt: pk.log_posterior_fused(p, t))
        trace_one(f"full nd={nd}", fused, coords, f"/tmp/xprof_fused_{nd}")

    # NOTE: monkeypatched variants must go through __wrapped__ in a fresh
    # jit (the module-jitted wrapper's trace cache ignores the patch —
    # caught by identical program fingerprints in the first run of this
    # script); the section ablation lives in ablate_fused_sections.py.


if __name__ == "__main__":
    main()
