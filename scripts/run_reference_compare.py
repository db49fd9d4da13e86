"""Close the parity loop against an ACTUAL mft6.py execution.

This offline environment cannot install the reference's dependency stack
(pyphot, dustmaps + Bayestar data, PyAstronomy, the Cython ``extinction``
package, emcee), so parity is normally validated against the float64 emulator
(tests/helpers.py::RefEmulator, 0.5-sigma bound).  Whoever HAS the stack runs
this one command to compare the real thing:

    python scripts/run_reference_compare.py \
        --reference /root/reference --parfile param_koi2298.txt \
        [--grid-dir /path/to/BT-Settl_M-0.0a+0.0] [--skip-reference]

It (1) runs ``mft6.py -f <parfile> -o True -e True`` in a scratch copy of the
reference tree, (2) runs this framework's CLI on the same param file, and
(3) diffs the posterior medians / sigmas from both ``samples.txt`` files,
reporting each parameter's median offset in units of the reference posterior
sigma against the 0.5-sigma north star (BASELINE.json).

``--skip-reference`` reuses an existing reference ``samples.txt`` (e.g. from
a run on another machine) instead of executing ``mft6.py``.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np

LABELS6 = ["T1", "T2", "Av", "R1", "R2/R1", "plx"]


def _deps_available() -> list:
    missing = []
    for mod in ["pyphot", "dustmaps", "PyAstronomy", "extinction", "emcee",
                "synphot"]:
        try:
            __import__(mod)
        except ImportError:
            missing.append(mod)
    return missing


def run_reference(ref_dir: str, parfile: str, workdir: str) -> str:
    """Execute mft6.py in a scratch copy; returns the samples.txt path."""
    missing = _deps_available()
    if missing:
        sys.exit(f"reference deps missing: {missing} — install them or pass "
                 "--skip-reference with a precomputed samples.txt")
    os.makedirs(workdir, exist_ok=True)
    for name in ["mft6.py", parfile, "vegaspec.fits"]:
        shutil.copy(os.path.join(ref_dir, name), workdir)
    for d in ["Data", "bps"]:
        dst = os.path.join(workdir, d)
        if not os.path.isdir(dst):
            shutil.copytree(os.path.join(ref_dir, d), dst)
    subprocess.run(
        [sys.executable, "mft6.py", "-f", os.path.basename(parfile),
         "-o", "True", "-e", "True"],
        cwd=workdir, check=True,
    )
    dirname = _param_value(os.path.join(ref_dir, parfile), "dirname")
    return os.path.join(workdir, dirname, "samples.txt")


def _param_value(parfile: str, key: str) -> str:
    with open(parfile) as fh:
        for line in fh:
            parts = line.split("#")[0].split()
            if len(parts) >= 2 and parts[0] == key:
                return parts[1]
    raise KeyError(key)


def run_rebuild(ref_dir: str, parfile: str, workdir: str, grid_dir=None) -> str:
    os.makedirs(workdir, exist_ok=True)
    args = [sys.executable, "-m", "mcmc_spec_tpu.cli",
            "-f", os.path.join(ref_dir, parfile), "-o", "True", "-e", "True",
            "--data-dir", ref_dir, "--bps-dir", os.path.join(ref_dir, "bps")]
    if grid_dir:
        args += ["--grid-dir", grid_dir]
    subprocess.run(args, cwd=workdir, check=True)
    dirname = _param_value(os.path.join(ref_dir, parfile), "dirname")
    return os.path.join(workdir, dirname, "samples.txt")


def compare(ref_samples: str, new_samples: str) -> int:
    ref = np.genfromtxt(ref_samples)
    new = np.genfromtxt(new_samples)
    ndim = ref.shape[1]
    labels = LABELS6 if ndim == 6 else [f"p{i}" for i in range(ndim)]
    med_r, sig_r = np.median(ref, axis=0), ref.std(axis=0)
    med_n = np.median(new, axis=0)
    print(f"{'param':>8} {'ref median':>14} {'rebuild':>14} {'shift/sigma':>12}")
    worst = 0.0
    for i in range(ndim):
        s = (med_n[i] - med_r[i]) / max(sig_r[i], 1e-12)
        worst = max(worst, abs(s))
        print(f"{labels[i]:>8} {med_r[i]:>14.6g} {med_n[i]:>14.6g} {s:>+12.2f}")
    print(f"\nmax |shift| = {worst:.2f} sigma (north star: <= 0.5)")
    return 0 if worst <= 0.5 else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--parfile", default="param_koi2298.txt")
    ap.add_argument("--workdir", default="./refcompare")
    ap.add_argument("--grid-dir", default=None,
                    help="BT-Settl/PHOENIX model directory (both runs need it)")
    ap.add_argument("--skip-reference", metavar="SAMPLES_TXT", default=None,
                    help="reuse an existing reference samples.txt")
    args = ap.parse_args()

    if args.skip_reference:
        ref_samples = args.skip_reference
    else:
        ref_samples = run_reference(args.reference, args.parfile,
                                    os.path.join(args.workdir, "reference"))
    new_samples = run_rebuild(args.reference, args.parfile,
                              os.path.join(args.workdir, "rebuild"),
                              args.grid_dir)
    sys.exit(compare(ref_samples, new_samples))


if __name__ == "__main__":
    main()
