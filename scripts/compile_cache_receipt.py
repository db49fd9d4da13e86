"""Cold vs warm persistent-compilation-cache receipt (round 4).

The measured round-3 koi2298 production run spent most of its wall time in
first-time compiles through the remote-compile tunnel (TOTAL WALL 1066 s;
the sampler itself accounts for a small fraction — benchmarks/RESULTS.md).
Round 4 turns on JAX's persistent compilation cache for CLI runs
(`utils/flags.enable_persistent_compile_cache`, `MCMC_SPEC_COMPILE_CACHE`):
this script runs the SAME production fit twice in fresh processes against a
fresh cache directory and reports cold vs warm wall time — the number a
production user re-running a config actually sees.

Run on TPU:  nohup python scripts/compile_cache_receipt.py > /tmp/cache_receipt.log 2>&1 &
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import os, sys, time
sys.path.insert(0, __REPO__)
import jax
from mcmc_spec_tpu.cli import main
t0 = time.time()
sys.argv = ["cli", "-f", "/root/reference/param_koi2298.txt", "-o", "True",
            "-e", "True", "--noplots",
            "--data-dir", "/root/reference", "--bps-dir", "/root/reference/bps"]
# the BT-Settl grid dir isn't bundled; run the self-contained synthetic family
from mcmc_spec_tpu.utils.config import FitConfig
orig = FitConfig.from_file
def patched(path):
    cfg = orig(path)
    cfg.models = "synthetic"
    cfg.filename = "koi2298_HET.txt"  # bundled at the reference root, not Data/
    return cfg
FitConfig.from_file = staticmethod(patched)
main()
print(f"CHILD WALL {time.time()-t0:.1f}", flush=True)
"""


def run_once(tag, workdir, cache_dir):
    env = dict(os.environ, MCMC_SPEC_COMPILE_CACHE=cache_dir)
    t0 = time.time()
    # NOT str.format: the child source's own f-string braces would be
    # interpreted as format fields (this bit once — KeyError: 'time')
    out = subprocess.run([sys.executable, "-c",
                          CHILD.replace("__REPO__", repr(REPO))],
                         cwd=workdir, env=env, capture_output=True, text=True)
    dt = time.time() - t0
    sys.stdout.write(out.stdout[-2000:])
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"{tag} run failed rc={out.returncode}")
    n_entries = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    print(f"[{tag}] wall {dt:.1f}s, cache entries now: {n_entries}", flush=True)
    return dt


def main():
    work = tempfile.mkdtemp(prefix="cache_receipt_")
    cache = os.path.join(work, "xla-cache")
    try:
        cold = run_once("cold", work, cache)
        # fresh working dir for the artifacts, same cache
        shutil.rmtree(os.path.join(work, "koi2298"), ignore_errors=True)
        warm = run_once("warm", work, cache)
        print(json.dumps(dict(cold_s=round(cold, 1), warm_s=round(warm, 1),
                              speedup=round(cold / warm, 2))))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
