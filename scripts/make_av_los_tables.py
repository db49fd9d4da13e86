"""Generate per-KOI Av(d) line-of-sight prior tables (assets/av_los/).

The reference queries Bayestar2019 per posterior evaluation
(mft6.py:1233-1239).  The rebuild interpolates a per-target LOS profile
instead; when ``dustmaps`` + the Bayestar data are installed this script
writes the EXACT reference profile (``AvProfile.from_bayestar``), otherwise a
documented literature-derived approximation:

* sight line: the target's (ra, dec) when a param file supplies them
  (``--parfile``), else the Kepler field centre (RA 290.667, Dec +44.5,
  galactic b ~= +13.3 deg) — all nine bundled KOI spectra are Kepler-field
  targets;
* shape: exponential thin-disk LOS, ``Av(d) = k (1 - exp(-d |sin b| / h))``,
  h = 125 pc (Drimmel & Spergel 2001) — the same saturating form as the
  Kepler Input Catalog extinction model (Brown et al. 2011, who used
  h = 150 pc; tests/test_models.py bounds the divergence between the two);
* normalisation: the param-file Av at d = 1/plx when available, else the
  SFD98 asymptotic extinction toward the Kepler field centre,
  E(B-V) ~= 0.04 -> Av ~= 0.125 (re-typed literature value) — the
  integral every sight line must saturate to;
* width: constant max(av_err, 0.05) (the reference's sigma floor,
  mft6.py:1237-1238).

Usage::

    python scripts/make_av_los_tables.py              # regenerate all 9 KOIs
    python scripts/make_av_los_tables.py --parfile param_koi2298.txt
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mcmc_spec_tpu.models.dust import AvProfile, galactic_latitude

# bundled KOI spectra (reference Data/koi*.txt + koi2298_HET.txt)
BUNDLED_KOIS = ["227", "1422", "1681", "2124", "2174", "2298", "2542", "2862", "3010"]

# Kepler field centre (RA/Dec deg); SFD98 asymptotic Av toward it
FIELD_RA, FIELD_DEC = 290.667, 44.5
FIELD_AV_INF = 0.125  # SFD98 E(B-V) ~= 0.04 x 3.1 (literature-derived)

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "av_los")


def _parse_param(parfile: str) -> dict:
    out = {}
    with open(parfile) as fh:
        for line in fh:
            line = line.split("#")[0].strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) >= 2:
                out[parts[0]] = parts[1]
    return out


def write_table(koi: str, ra: float, dec: float, av: float, dist_pc: float,
                av_err: float, provenance: str) -> str:
    try:
        prof = AvProfile.from_bayestar(ra, dec)
        provenance = "Bayestar2019 query (exact reference profile)"
    except Exception:
        # calibrate the thin-disk model so Av(dist_pc) == av; when calibrated
        # at the SFD asymptote, anchor far out so k == av_inf
        prof = AvProfile.analytic(ra, dec, av, dist_pc, av_err)
    os.makedirs(ASSETS, exist_ok=True)
    path = os.path.join(ASSETS, f"koi{koi}.txt")
    b = galactic_latitude(ra, dec)
    with open(path, "w") as fh:
        fh.write(f"# Av(d) line-of-sight prior for KOI-{koi} "
                 f"(ra={ra:.6f} dec={dec:.6f}, galactic b={b:+.2f} deg).\n")
        fh.write("# Columns: distance_pc  av_mu  av_sigma.\n")
        fh.write(f"# {provenance}\n")
        fh.write("# Regenerate (or replace with a genuine Bayestar2019 query) via\n")
        fh.write("# scripts/make_av_los_tables.py; see module docstring for the model.\n")
        np.savetxt(fh, np.column_stack([prof.dist_pc, prof.av_mu, prof.av_sig]))
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parfile", help="param file supplying ra/dec/av/plx for one KOI")
    args = ap.parse_args()

    if args.parfile:
        p = _parse_param(args.parfile)
        koi = "".join(c for c in os.path.basename(args.parfile) if c.isdigit())
        dist = 1.0 / float(p["plx"]) if float(p.get("plx", 0)) > 0 else 500.0
        path = write_table(
            koi, float(p["ra"]), float(p["dec"]), float(p["av"]), dist,
            float(p.get("av_err", 0.05)),
            f"Analytic thin-disk LOS calibrated to the param-file "
            f"Av={p['av']} at d=1/plx={dist:.0f} pc.")
        print(path)
        return

    ref_param = "/root/reference/param_koi2298.txt"
    for koi in BUNDLED_KOIS:
        if koi == "2298" and os.path.exists(ref_param):
            p = _parse_param(ref_param)
            path = write_table(
                koi, float(p["ra"]), float(p["dec"]), float(p["av"]),
                1.0 / float(p["plx"]), float(p.get("av_err", 0.05)),
                f"Analytic thin-disk LOS calibrated to the param-file "
                f"Av={p['av']} at d=1/plx={1/float(p['plx']):.0f} pc.")
        else:
            # field-centre sight line, SFD-asymptote normalisation: anchor the
            # calibration far beyond the scale height so k == Av_inf
            path = write_table(
                koi, FIELD_RA, FIELD_DEC, FIELD_AV_INF, 25000.0, 0.05,
                "Kepler field-centre sight line (no bundled coordinates for "
                "this KOI); thin-disk shape normalised to the SFD98 "
                f"asymptote Av_inf={FIELD_AV_INF} (re-typed literature value).")
        print(path)


if __name__ == "__main__":
    main()
