"""Full 2^4 section-ablation matrix of the fused kernel (round 5, VERDICT r4 #3).

Round 4's single-section ablation summed to ~1.0 ms against a 1.69 ms
kernel and concluded "~0.7 ms only disappears when several sections are
removed together" — without tabulating WHICH combinations are
super-additive.  This script measures every combination of the four
gates (phot, priors, spectrum, W-construction) with the fixed harness
(__wrapped__ + fresh jit per variant, per-variant output assertions,
direct pipelined dispatch), then fits the inclusion-exclusion structure:

    t(mask) = base + sum_i c_i + sum_{i<j} c_ij + ...

If the pairwise terms explain the residue, the mechanism is real
(shared-schedule overlap: removing one section lets Mosaic hide another's
latency).  If even the full matrix leaves a large unexplained base above
the empty-body floor, the floor claim gets its evidence.

Run on TPU:  nohup python scripts/ablate_matrix.py > /tmp/r5/ablate_matrix.log 2>&1 &
"""
import dataclasses
import itertools
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

from ablate_fused_sections import DIALS, NWALK, timed_call, variant_kernel
from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk

GATES = ("do_phot", "do_priors", "do_spectrum", "do_w")


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
            pk._posterior_kernel = variant_kernel(**flags)
            got = np.asarray(jax.jit(
                lambda p: pk.log_posterior_fused.__wrapped__(p, tgt)
            )(coords[:512]))
            if all(bits):
                fin = np.isfinite(real)
                err = np.max(np.abs(got[fin] - real[fin])
                             / np.maximum(np.abs(real[fin]), 1e-9))
                assert err < 1e-6, err
            else:
                assert not np.allclose(got, real, equal_nan=True), name
            ms = timed_call(tgt, coords)
            rows.append((bits, ms))
            print(json.dumps({"mask(PRSW)": name, "ms": round(ms, 3)}),
                  flush=True)
    finally:
        pk._posterior_kernel = orig

    # inclusion-exclusion fit: full Moebius transform over the 4-bit lattice
    t = {bits: ms for bits, ms in rows}
    base = t[(False,) * 4]
    print(f"\nempty-body base: {base:.3f} ms", flush=True)
    # marginal cost of each section conditioned on every context
    for i, g in enumerate(GATES):
        print(f"\nmarginal cost of {g} by context (other sections present):")
        for bits, ms in rows:
            if not bits[i]:
                continue
            off = tuple(b if j != i else False for j, b in enumerate(bits))
            ctx = "".join("1" if b else "0" for j, b in enumerate(bits)
                          if j != i)
            print(f"  ctx={ctx}: {ms - t[off]:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
