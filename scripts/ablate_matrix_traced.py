"""Device-traced 2^4 section-ablation matrix (round 5, VERDICT r4 #3).

The wall-clock matrix (`ablate_matrix.py`) showed the direct-dispatch
harness constant wanders +-0.3 ms between runs on this tunnel — larger
than most section costs, so wall deltas cannot resolve the residue.
This version times every variant by its Mosaic custom-call DEVICE
duration from an xprof trace (20 pipelined dispatches per variant),
which round 4 established is stable to ~0.01 ms.  Output: a 16-row
device-time table over the four gates (phot, priors, spectrum, W) plus
the per-section marginal-cost-by-context table — the data behind any
claim about super-additive scheduling residue.

Run on TPU:  nohup python scripts/ablate_matrix_traced.py > /tmp/r5/ablate_traced.log 2>&1 &
"""
import dataclasses
import glob
import gzip
import itertools
import json
import os
import shutil
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

from ablate_fused_sections import DIALS, NWALK, variant_kernel
from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk

GATES = ("do_phot", "do_priors", "do_spectrum", "do_w")
LOGDIR = "/tmp/xprof_matrix"


def kernel_device_ms(logdir):
    """Total device time of the Mosaic custom-call(s), per dispatch."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    pids = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    kern_ms, prog_ms, n_kern = 0.0, 0.0, 0
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = e.get("dur", 0) / 1e3
            if ("posterior" in name or "custom-call" in name
                    or name.startswith("kern")):
                kern_ms += dur
                n_kern += 1
            elif name.startswith("jit_"):
                prog_ms += dur
    return kern_ms, prog_ms, n_kern


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    tgt = dataclasses.replace(tgt, eval_block=256, **DIALS)
    coords = init_walker_batch(tgt, truth, NWALK, jnp.float32)

    real = np.asarray(jax.jit(
        lambda p: pk.log_posterior_fused.__wrapped__(p, tgt))(coords[:512]))

    orig = pk._posterior_kernel
    rows = []
    try:
        for bits in itertools.product((True, False), repeat=4):
            flags = dict(zip(GATES, bits))
            name = "".join("1" if b else "0" for b in bits)
            pk._posterior_kernel = (orig if all(bits)
                                    else variant_kernel(**flags))
            fused = jax.jit(
                lambda p: pk.log_posterior_fused.__wrapped__(p, tgt))
            got = np.asarray(fused(coords[:512]))
            if all(bits):
                fin = np.isfinite(real)
                err = np.max(np.abs(got[fin] - real[fin])
                             / np.maximum(np.abs(real[fin]), 1e-9))
                assert err < 1e-6, err
            else:
                assert not np.allclose(got, real, equal_nan=True), name
            # warm, then trace 20 pipelined dispatches
            out = None
            for _ in range(3):
                out = fused(coords)
            out.block_until_ready()
            shutil.rmtree(LOGDIR, ignore_errors=True)
            jax.profiler.start_trace(LOGDIR)
            for _ in range(20):
                out = fused(coords)
            out.block_until_ready()
            jax.profiler.stop_trace()
            kern_ms, prog_ms, n_kern = kernel_device_ms(LOGDIR)
            # The Mosaic custom-call's event name varies by trace version
            # (kernel_calls may be 0); the jit_* program span on the device
            # pid is the robust stat and the fused program IS one kernel
            # plus a trivial epilogue, so attribute by program span.
            rows.append((bits, prog_ms / 20))
            print(json.dumps({
                "mask(PRSW)": name,
                "kernel_ms_device": round(kern_ms / 20, 4),
                "program_ms_device": round(prog_ms / 20, 4),
                "kernel_calls": n_kern,
            }), flush=True)
    finally:
        pk._posterior_kernel = orig

    t = {bits: ms for bits, ms in rows}
    base = t[(False,) * 4]
    full = t[(True,) * 4]
    print(f"\nempty-body device floor: {base:.4f} ms; "
          f"full kernel: {full:.4f} ms", flush=True)
    marg_sum = sum(full - t[tuple(b if j != i else False
                                  for j, b in enumerate((True,) * 4))]
                   for i in range(4))
    print(f"sum of in-context marginals: {marg_sum:.4f} ms "
          f"(vs full-empty {full - base:.4f} ms)", flush=True)
    for i, g in enumerate(GATES):
        print(f"\nmarginal device cost of {g} by context:")
        for bits, ms in rows:
            if not bits[i]:
                continue
            off = tuple(b if j != i else False for j, b in enumerate(bits))
            ctx = "".join("1" if b else "0" for j, b in enumerate(bits)
                          if j != i)
            print(f"  ctx={ctx}: {ms - t[off]:+.4f} ms", flush=True)


if __name__ == "__main__":
    main()
