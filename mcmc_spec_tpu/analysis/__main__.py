"""Population-analysis CLI: ``python -m mcmc_spec_tpu.analysis``.

The reference's second entry point (``planet_error_analysis.py``) is a script
with hardcoded catalog paths; here the catalogs are arguments:

    python -m mcmc_spec_tpu.analysis \
        --results 'koi*' \
        --star-catalog stars.csv --planet-catalog planets.csv \
        [--cks cks.csv] [--out pop_out]

``stars.csv`` columns: system, kep_teff, kep_teff_err, kep_rstar,
kep_rstar_err [, kep_mstar, kep_pri_prcf, kep_sec_prcf, separation].
``planets.csv`` columns: system, pname, radius, radius_err, teq, period (yr),
period_err [, s, s_err].
"""
from __future__ import annotations

import argparse
import json
import os
from glob import glob


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", required=True,
                    help="glob of per-system result dirs (each with samples.txt etc.)")
    ap.add_argument("--star-catalog", required=True)
    ap.add_argument("--planet-catalog", required=True)
    ap.add_argument("--cks", default=None, help="CSV with an Rp column (radius-gap test)")
    ap.add_argument("--out", default="population_out")
    ap.add_argument("--no-plots", action="store_true")
    args = ap.parse_args(argv)

    import pandas as pd

    from mcmc_spec_tpu.analysis.planets import SystemPosteriors, population_analysis

    dirs = sorted(d for d in glob(args.results) if os.path.isdir(d))
    if not dirs:
        raise SystemExit(f"no result directories match {args.results!r}")
    systems = []
    for d in dirs:
        name = os.path.basename(d.rstrip("/"))
        if name.startswith("koi"):
            name = name[3:]  # koi0042 -> 0042 (catalog 'system' uses this form)
        try:
            systems.append(SystemPosteriors.from_dir(d, name))
        except Exception as e:
            print(f"[skip] {d}: {e}")
    print(f"loaded {len(systems)} systems")

    star_catalog = pd.read_csv(args.star_catalog)
    planet_catalog = pd.read_csv(args.planet_catalog)
    cks_radii = None
    if args.cks:
        cks = pd.read_csv(args.cks)
        cks_radii = cks["Rp"].to_numpy()

    ds, dp, stats = population_analysis(
        systems, star_catalog, planet_catalog, out_dir=args.out,
        cks_radii=cks_radii, make_plots=not args.no_plots,
    )
    ds.to_csv(os.path.join(args.out, "derived_star.csv"), index=False)
    dp.to_csv(os.path.join(args.out, "derived_planet.csv"), index=False)
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
