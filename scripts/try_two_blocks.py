"""Two-walker-blocks-per-program experiment (round 5, VERDICT r4 #3).

Hypothesis for the ~0.7 ms nd-independent scheduling residue: a fixed
per-PROGRAM cost (prologue DMA scheduling of the shared [NO, nd] tables,
pipeline ramp) paid once per 256-row grid step.  If so, processing TWO
256-row half-blocks sequentially inside one 512-row program halves the
number of programs while keeping peak [rows, nd] temporaries at 256 —
distinguishable from plain block=512 (which doubles the temporaries and
measured a tie vs 256 in round 4).

Variants (all parity-asserted against production):
  prod_256   — production kernel, eval_block=256 (baseline)
  prod_512   — production kernel, eval_block=512 (control: big temporaries)
  twohalf_512 — patched kernel: one 512-row program running the production
                body twice on 256-row ref views (``ref.at[slice]``)

Run on TPU:  nohup python scripts/try_two_blocks.py > /tmp/r5/two_blocks.log 2>&1 &
"""
import dataclasses
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp
import numpy as np

from ablate_fused_sections import DIALS, NWALK, timed_call, variant_kernel
from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk

HALF = 256


def two_half_kernel(*refs, **statics):
    *in_refs, out_ref = refs
    prod = pk._POSTERIOR_KERNEL_BODY  # stashed production body (see main)
    scal_ref, p_ref = in_refs[0], in_refs[1]
    shared = in_refs[2:]
    n_rows = out_ref.shape[0]
    for h in range(n_rows // HALF):
        sl = slice(h * HALF, (h + 1) * HALF)
        prod(scal_ref, p_ref.at[sl], *shared, out_ref.at[sl], **statics)


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    tgt256 = dataclasses.replace(tgt, eval_block=256, **DIALS)
    tgt512 = dataclasses.replace(tgt, eval_block=512, **DIALS)
    coords = init_walker_batch(tgt256, truth, NWALK, jnp.float32)

    real = np.asarray(jax.jit(
        lambda p: pk.log_posterior_fused.__wrapped__(p, tgt256))(coords[:512]))

    orig = pk._posterior_kernel
    pk._POSTERIOR_KERNEL_BODY = orig
    results = {}
    try:
        for name, t, kern in (
            ("prod_256", tgt256, orig),
            ("prod_512", tgt512, orig),
            ("twohalf_512", tgt512, two_half_kernel),
        ):
            pk._posterior_kernel = kern
            got = np.asarray(jax.jit(
                lambda p, tt=t: pk.log_posterior_fused.__wrapped__(p, tt)
            )(coords[:512]))
            fin = np.isfinite(real)
            assert np.array_equal(fin, np.isfinite(got)), name
            err = np.max(np.abs(got[fin] - real[fin])
                         / np.maximum(np.abs(real[fin]), 1e-9))
            print(f"{name}: parity max rel {err:.2e}", flush=True)
            assert err < 1e-5, (name, err)
            ms = timed_call(t, coords)
            results[name] = ms
            print(f"  {name:>12}: {ms:.3f} ms/call "
                  f"({NWALK/ms*1e3/1e6:.2f}M evals/s)", flush=True)
    finally:
        pk._posterior_kernel = orig

    base = results["prod_256"]
    for name, ms in results.items():
        if name != "prod_256":
            print(f"{name}: {ms - base:+.3f} ms vs prod_256 "
                  f"({100*(ms-base)/base:+.1f}%)")


if __name__ == "__main__":
    main()
