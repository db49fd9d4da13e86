"""Fleet spectrum-kernel block-size + median-cost experiment (round 5).

trace_fleet_step.py attributed the fleet kernel (1.50 ms device per
36864-eval batch) as: median 0.888 ms (63%!), renorm 0.316, matmul ~0
(removing it even SLOWS the kernel — the [B, nd] broadcast stub is worse
than the MXU matmul), extinction ~0.  Two follow-ups:

1. the fleet wrapper auto-picks block=512 at nd=1792 (cap logic); the
   single-target kernel defaults to 256 and round 4 measured 512 as a tie
   there.  Sweep the fleet kernel at block 128/256/512.
2. the fleet median runs `_row_order_stat_bits` against PER-ROW rank
   vectors ([B, 1] int32) where the single-target kernel compares against
   a static scalar rank — price that difference directly by timing a
   variant with the ranks frozen to a compile-time scalar (all bench
   targets share n_data, so the output must stay bit-identical).

Run on TPU (quiet box):  nohup python scripts/try_fleet_block.py > /tmp/r5/fleet_block.log 2>&1 &
"""
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.inference import batched
from mcmc_spec_tpu.inference.fleet import stack_targets
from mcmc_spec_tpu.ops import pallas_kernels as pk

NTGT, NWALK = 9, 4096


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, truth = build_bench_target(jnp.float32)
    fleet = stack_targets([tgt] * NTGT)
    coords = jnp.stack([init_walker_batch(tgt, truth, NWALK, jnp.float32, seed=i)
                        for i in range(NTGT)])
    ntgt, nT, nG, nd = fleet.D.shape
    Df = fleet.D.reshape(ntgt, nT * nG, nd)
    _, _, _, _, Wcomb = jax.vmap(batched._forward_small)(coords, fleet)
    av = coords[..., fleet.nspec]
    it, mm, rn = pk.resolve_dials(fleet)

    args = (Wcomb, av, Df, fleet.ext_k_data, fleet.data_flux, fleet.data_err,
            fleet.V, fleet.Vpinv, fleet.med_data, fleet.n_data_true)

    def timed(fn):
        fn(*args).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(20):
                out = fn(*args)
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 20)
        return best * 1e3, np.asarray(out)

    base_out = None
    for block in (128, 256, 512):
        fn = jax.jit(functools.partial(
            pk.spectrum_chi2_fleet.__wrapped__, block=block,
            iters=it, mm_passes=mm, recip=rn))
        ms, out = timed(fn)
        if base_out is None:
            base_out = out
        else:
            np.testing.assert_array_equal(out, base_out)
        print(json.dumps({"variant": f"block_{block}",
                          "ms_per_call": round(ms, 3),
                          "evals_per_sec_M":
                          round(NTGT * NWALK / ms * 1e3 / 1e6, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
