#!/usr/bin/env python
"""Capture a device trace of the bench stretch loop and print the op table."""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference.batched import log_posterior_batch
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble

NWALK = 8192


def main():
    dtype = jnp.float32
    tgt, truth = build_bench_target(dtype)
    logp = lambda batch: log_posterior_batch(batch, tgt)
    coords = init_walker_batch(tgt, truth, NWALK, dtype)
    state = init_ensemble(coords, logp, jax.random.PRNGKey(0))

    st, chain, _ = run_ensemble(state, logp, n_steps=64, thin=64)
    chain.block_until_ready()

    logdir = "/tmp/xprof_stretch"
    jax.profiler.start_trace(logdir)
    st, chain, _ = run_ensemble(st, logp, n_steps=64, thin=64)
    chain.block_until_ready()
    jax.profiler.stop_trace()

    # parse the trace: sum device-stream op durations by name
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = [e for e in tr.get("traceEvents", []) if e.get("ph") == "X"]
    # keep device-lane events (TensorCore); heuristics: pid names
    pids = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n.lower()}
    totals = {}
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        totals[name] = totals.get(name, 0.0) + e.get("dur", 0.0)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(totals.values())
    print(f"pids: { {p: pids.get(p) for p in dev_pids} }")
    print(f"total device op time: {tot/1e3:.3f} ms over 64 steps")
    for name, dur in top:
        print(f"{dur/1e3:9.3f} ms  {100*dur/tot:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
