"""Bisect the fused kernel's 2.2 ms floor, round 2.

`dma_probe_bisect.py` cleared SMEM input / PrefetchScalarGridSpec / input
count / p width / the residual op chain — every variant ran ~1 us.  Two
suspects remain:

  1. UNREAD tables: the probe bodies never read most refs, and Mosaic may
     eliminate copies of unread windows — so those probes never exercised
     the DMAs at all.  Force full reads here.
  2. Sub-8-row broadcast blocks: the fused call's bcast specs include
     (1, nd), (3, nd), (4, 220), (2, 2), (2, 6) — all below the (8, 128)
     sublane tile.  Strided row-fragment copies may not pipeline/revisit
     like full-tile ones.

Variants (all body-read so nothing can be elided):

  peek6     — 6x (56, nd) tables, body reads tab[0, 0] only
  read6     — 6x (56, nd) tables, body adds jnp.sum(tab) for each
  rows1     — 6x (1, nd) tables, fully read
  rows3     — 6x (3, nd) tables, fully read
  tiny12    — 12 tiny tables (4, 220)/(2, 2)/(4, 6)/(2, 6), fully read
  realmix   — the fused wrapper's exact bcast-shape multiset, fully read

Run on TPU:  nohup python scripts/dma_probe_bisect2.py > /tmp/r4/bisect2.log 2>&1 &
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, ".")

NW = 32768
ND = 1792
BLOCK = 256

REALMIX = ([(56, ND)] + [(1, ND)] * 3 + [(3, ND)] * 2 + [(4, 56)] * 2
           + [(4, 220), (2, 220), (4, 2), (2, 2), (56, 2), (56, 6),
              (2, 2), (4, 6), (2, 6)])


def timed(fn, args, n_iter=20):
    """Direct pipelined dispatch — the scan harness is untrustworthy (XLA
    hoists the pallas_call even behind a loop-carried perturbation)."""
    jfn = jax.jit(fn)
    jfn(*args).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = jfn(*args)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / n_iter)
    return best * 1e3


def run(name, shapes, read="full"):
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.randn(NW, 8), jnp.float32)
    tabs = [jnp.asarray(rng.randn(*s) * 1e-3, jnp.float32) for s in shapes]

    def kern(p_ref, *refs):
        out_ref = refs[-1]
        acc = jnp.zeros((), jnp.float32)
        for r in refs[:-1]:
            acc = acc + (r[0, 0] if read == "peek" else jnp.sum(r[:]))
        out_ref[:] = jnp.sum(p_ref[:], axis=1, keepdims=True) + acc

    call = pl.pallas_call(
        kern,
        grid=(NW // BLOCK,),
        in_specs=[pl.BlockSpec((BLOCK, 8), lambda i: (i, 0))]
        + [pl.BlockSpec(s, lambda i: (0, 0)) for s in shapes],
        out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NW, 1), jnp.float32),
    )
    ms = timed(call, [p] + tabs)
    print(f"  {name:>8}: {ms:.3f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    run("peek6", [(56, ND)] * 6, read="peek")
    run("read6", [(56, ND)] * 6)
    run("rows1", [(1, ND)] * 6)
    run("rows3", [(3, ND)] * 6)
    run("tiny12", [(4, 220), (2, 220), (4, 2), (2, 2), (56, 2), (56, 6),
                   (2, 2), (4, 6), (2, 6), (4, 56), (4, 56), (2, 6)])
    run("realmix", REALMIX)


if __name__ == "__main__":
    main()
