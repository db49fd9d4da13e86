"""Isolate the fused kernel's DMA floor (round 4).

`ablate_fused_sections.py` found the production fused call is ~2.2 ms no
matter which compute section is removed — including the ENTIRE spectrum
block — while pass count and nd do move the time.  Pallas copies every
input block per grid step whether or not the body reads it, so the
hypothesis is a DMA floor from re-fetching the broadcast (constant-index)
tables on every grid step.  This probe measures a TRIVIAL kernel (sum of
the walker block) while varying exactly the things compute cannot explain:

  [A] #bcast inputs x table width (nd): DMA bytes scale, compute fixed
  [B] grid steps (block size) at fixed total walkers: re-fetch count scales
  [C] the same shapes with the tables as (1, ...) blocks indexed by a map
      returning the SAME index each step (what the fused kernel uses)

If time tracks (#steps x table bytes), the fused kernel's floor is
redundant bcast traffic and the fix is copy-once (scratch + explicit
first-step DMA, or input_output_aliasing/ANY memory space).

Run on TPU:  nohup python scripts/dma_probe.py > /tmp/r4/dma_probe.log 2>&1 &
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

NW = 32768
NO = 56


def trivial_call(nd, block, n_tables, nw=NW):
    """pallas_call: out[b] = sum(p[b]) + tab0[0,0]; tables are bcast blocks."""
    p = jnp.asarray(np.random.RandomState(0).randn(nw, 8), jnp.float32)
    tables = [jnp.asarray(np.random.RandomState(i + 1).randn(NO, nd),
                          jnp.float32) for i in range(n_tables)]

    def kern(p_ref, *refs):
        out_ref = refs[-1]
        t = refs[0][0, 0] if len(refs) > 1 else 0.0
        out_ref[:] = jnp.sum(p_ref[:], axis=1, keepdims=True) + t

    bcast = pl.BlockSpec((NO, nd), lambda i: (0, 0))
    fn = pl.pallas_call(
        kern,
        grid=(nw // block,),
        in_specs=[pl.BlockSpec((block, 8), lambda i: (i, 0))]
        + [bcast] * n_tables,
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nw, 1), jnp.float32),
    )

    @jax.jit
    def loop(p, *tabs):
        def body(c, _):
            # c*1e-30 loop-carry defeats hoisting (round-1 of this probe
            # measured a hoisted loop-invariant call: ~1 us of nothing)
            return c + fn(p + c * jnp.float32(1e-30), *tabs)[0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=50)
        return acc

    loop(p, *tables).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loop(p, *tables).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / 50)
    return best * 1e3


def main():
    print("devices:", jax.devices(), flush=True)

    print("[A] trivial kernel, block=256 (128 steps), vs #tables x nd:",
          flush=True)
    for nd in (896, 1792, 3584):
        row = []
        for ntab in (0, 1, 3, 6):
            ms = trivial_call(nd, 256, ntab)
            row.append(f"ntab={ntab}: {ms:.3f}")
        print(f"    nd={nd}: " + "  ".join(row), flush=True)

    print("[B] trivial kernel, 6 tables nd=1792, vs block size:", flush=True)
    for block in (128, 256, 512, 1024, 2048):
        ms = trivial_call(1792, block, 6)
        print(f"    block={block} ({NW//block} steps): {ms:.3f} ms", flush=True)

    # bytes model: per-step bcast traffic if re-fetched every step
    print("\nif re-fetched per step: 6 tables x 56 x nd x 4B x steps", flush=True)
    for nd, block in ((1792, 256),):
        mb = 6 * NO * nd * 4 * (NW // block) / 1e6
        print(f"    nd={nd} block={block}: {mb:.0f} MB/call", flush=True)


if __name__ == "__main__":
    main()
