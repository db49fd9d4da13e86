"""Command-line driver: ``python -m mcmc_spec_tpu.cli -f paramfile -o True -e True``.

Flag-compatible with the reference CLI (``mft6.py:3450-3456``, README):
``-f`` parameter file, ``-o`` run the optimize stage, ``-e`` run the MCMC
stage.  Extensions: ``--nospec`` reproduces ``mft6_nospec.py`` as a flag
instead of a file fork (spectrum chi^2 weight -> 0), ``--nplots`` skips
report rendering, ``--dtype`` selects the device precision.
"""
from __future__ import annotations

import getopt
import sys

import jax.numpy as jnp

from mcmc_spec_tpu.pipeline import (
    run_mcmc_stage,
    run_optimize_stage,
    setup_context,
)
from mcmc_spec_tpu.utils.config import FitConfig


def main(argv=None):
    argv = sys.argv if argv is None else argv
    opts, _ = getopt.getopt(
        argv[1:], "f:o:e:", ["file=", "optimize=", "emcee=", "nospec", "noplots", "dtype="]
    )
    parfile, do_opt, do_emcee = None, "False", "False"
    nospec, noplots, dtype = False, False, jnp.float32
    for key, val in opts:
        if key in ("-f", "--file"):
            parfile = val
        elif key in ("-o", "--optimize"):
            do_opt = val
        elif key in ("-e", "--emcee"):
            do_emcee = val
        elif key == "--nospec":
            nospec = True
        elif key == "--noplots":
            noplots = True
        elif key == "--dtype":
            dtype = {"float32": jnp.float32, "float64": jnp.float64}[val]
    if parfile is None:
        raise SystemExit("usage: -f paramfile [-o True|False] [-e True|False] [--nospec]")

    cfg = FitConfig.from_file(parfile)
    if nospec:
        cfg.spectrum_weight = 0.0

    ctx = setup_context(cfg, dtype=dtype)

    if do_opt == "True":
        run_optimize_stage(ctx)
        if not noplots:
            from mcmc_spec_tpu.report.plots import plot_fit

            plot_fit(ctx)

    if do_emcee == "True":
        samples = run_mcmc_stage(ctx)
        if not noplots:
            from mcmc_spec_tpu.report.plots import plot_corner, plot_results

            plot_corner(ctx, samples)
            plot_results(ctx, samples)


if __name__ == "__main__":
    main()
