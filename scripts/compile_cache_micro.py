"""Client-cache-vs-tunnel-cache micro receipt (round 4).

The whole-fit cold/warm receipt is inconclusive on this environment: the
remote-compile TUNNEL keeps its own server-side cache, so once a shape has
been compiled (by anyone, any process) a "cold" client run is already
warm (measured: cold 72.9 s vs warm 98.5 s — pure tunnel variance).  This
micro receipt separates the two caches on a FRESH kernel shape (an nd this
chip has never compiled):

  A: fresh shape, client cache ON  -> pays the true remote compile, seeds
     the client cache
  B: same shape,  client cache ON  -> client-disk hit (no tunnel round trip)
  C: same shape,  client cache OFF -> tunnel server-side cache hit

B vs C is the value of the client cache on a tunnel-warm environment;
A vs B is its value on a tunnel-cold one (e.g. a fresh local TPU host).

Run on TPU:  python scripts/compile_cache_micro.py [nd]
(default nd is chosen odd/unusual; pass a new value if this one has been
compiled on this tunnel before)
"""
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, time, dataclasses
sys.path.insert(0, __REPO__)
import jax, jax.numpy as jnp
from mcmc_spec_tpu.utils import flags
cache = os.environ.get("MICRO_CACHE_DIR")
if cache:
    flags.enable_persistent_compile_cache(cache)
from mcmc_spec_tpu.bench_target import build_bench_target, init_walker_batch
from mcmc_spec_tpu.ops import pallas_kernels as pk
nd = int(os.environ["MICRO_ND"])
tgt, truth = build_bench_target(jnp.float32, nd=nd)
tgt = dataclasses.replace(tgt, eval_block=256, median_iters=14,
                          matmul_passes=3, recip_newton=2)
coords = init_walker_batch(tgt, truth, 1024, jnp.float32)
t0 = time.time()
pk.log_posterior_fused(coords, tgt).block_until_ready()
print(f"COMPILE+RUN {time.time()-t0:.2f}", flush=True)
"""


def run_child(tag, nd, cache_dir):
    env = dict(os.environ, MICRO_ND=str(nd))
    if cache_dir:
        env["MICRO_CACHE_DIR"] = cache_dir
    else:
        env.pop("MICRO_CACHE_DIR", None)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("__REPO__", repr(REPO))],
        env=env, capture_output=True, text=True, cwd=REPO)
    wall = time.time() - t0
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"{tag} failed")
    m = re.search(r"COMPILE\+RUN ([0-9.]+)", out.stdout)
    dt = float(m.group(1))
    print(f"[{tag}] compile+first-run {dt:.2f}s (process wall {wall:.1f}s)",
          flush=True)
    return dt


def main():
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 1808
    work = tempfile.mkdtemp(prefix="cache_micro_")
    cache = os.path.join(work, "xla-cache")
    a = run_child("A fresh shape, client cache on", nd, cache)
    b = run_child("B same shape, client cache on (disk hit)", nd, cache)
    c = run_child("C same shape, client cache OFF (tunnel hit)", nd, None)
    n_entries = len(os.listdir(cache)) if os.path.isdir(cache) else 0
    print(f"client cache entries: {n_entries}")
    print(f"summary: true-cold {a:.2f}s | client-hit {b:.2f}s | "
          f"tunnel-hit {c:.2f}s | client vs tunnel speedup {c/b:.2f}x | "
          f"cold vs client-hit {a/b:.2f}x")


if __name__ == "__main__":
    main()
