"""Filter transmission loading: all per-format branches of the reference.

Reproduces ``get_transmission`` (``mft6.py:565-649``) — system inference from
bare filter names and the per-file-format special cases — plus the photometric
passband resolution that the reference delegates to pyphot's internal library
(``mft6.py:766-783``: SDSS r/i/z with AB zero points, 2MASS J/H/Ks with Vega
zero points, hardcoded regardless of the ``pfilt`` strings).

Zero fluxes: AB from the pivot wavelength (exact); Vega by integrating a Vega
spectrum (``load_vega_flam``) through the same photon weights, falling back to
published values (Cohen et al. 2003 for 2MASS) when no Vega file is supplied.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from mcmc_spec_tpu.io.fits import read_bintable
from mcmc_spec_tpu.io.vega import load_vega_flam
from mcmc_spec_tpu.ops.photometry import FilterCurve, ab_zero_flux, photon_flux_weights

# Vega zero fluxes in erg/s/cm^2/AA, computed once by integrating the
# synphot Vega reference spectrum through the public transmission curves with
# the photon-counting weights (consistent with Cohen+2003 to ~2%); used only
# when no Vega spectrum file is supplied at runtime.
VEGA_ZERO_FLUX_FALLBACK = {
    "2MASS_J": 3.0554e-10,
    "2MASS_H": 1.1109e-10,
    "2MASS_Ks": 4.1782e-11,
    "Gaia_G": 2.5038e-9,
    "Kepler_K": 2.4461e-9,
}


def infer_system(f: str) -> Tuple[str, str]:
    """System inference for bare filter names (mft6.py:570-592)."""
    f = f.lower().strip(",")
    if "," in f:
        syst, fil = f.split(",")
        return syst.strip(), fil.strip()
    fil = f
    if fil in "i":
        syst = "cousins"
    elif fil in "ubvr":
        syst = "johnson"
    elif fil in ("kp", "kshort"):
        syst = "keck"
    elif fil in "jhks":
        syst = "2mass"
    elif fil in "562 692 880":
        syst = "dssi"
    elif fil in "kepler":
        syst = "kep"
    elif fil in "brgamma":
        syst = "nirc2"
    else:
        syst = ""
    return syst, fil


def load_transmission(name: str, bps_dir: str) -> FilterCurve:
    """Transmission curve for a reference filter name (mft6.py:595-641)."""
    syst, fil = infer_system(name)
    j = lambda p: os.path.join(bps_dir, p)

    if fil == "lp600":
        d = np.genfromtxt(j("lp600.csv"), delimiter=",")
        wl, tr = d[:, 0] * 10.0, d[:, 1]
    elif syst == "gaia" and fil in ("g", "rp", "bp"):
        wl, tr = np.genfromtxt(j(f"gaia_{fil}_pb.txt")).T
        wl = wl * 10.0
    elif syst == "kep" or fil == "kepler":
        wl, tr = np.genfromtxt(j("Kepler_Kepler.K.dat")).T
    elif syst == "nirc2":
        wl, tr = np.genfromtxt(j("Keck_NIRC2.Brgamma.dat")).T
    elif syst == "2mass":
        if fil in ("j", "h"):
            t = read_bintable(j(f"2mass_{fil}_001_syn.fits"))
            wl, tr = t["WAVELENGTH"], t["THROUGHPUT"]
        else:  # k / ks
            d = np.genfromtxt(j("2MASS_2MASS.Ks.dat"))
            wl, tr = d[:, 0], d[:, 1] / d[:, 1].max()
    elif syst == "dssi":
        d = np.genfromtxt(j(f"DSSI_{fil}nm.dat"))
        wl, tr = d[:, 0], d[:, 1]
    elif syst == "sdss":
        wl, tr = np.genfromtxt(j(f"SLOAN_SDSS.{fil}prime_filter.dat")).T
    elif syst == "sloan":
        t = read_bintable(j("sdss.fits"), extname=fil.upper())
        wl, tr = np.asarray(t["wavelength"]), np.asarray(t["respt"])
    elif syst == "keck" and fil == "kp":
        d = np.genfromtxt(j("keck_kp.txt"))
        wl, tr = d[:, 0] * 1e4, d[:, 1]
    elif syst == "keck" and fil == "kshort":
        wl, tr = np.genfromtxt(j("Keck_NIRC2.Ks.dat")).T
    else:
        t = read_bintable(j(f"{syst}_{fil}_002.fits"))
        wl, tr = t["WAVELENGTH"], t["THROUGHPUT"]

    return FilterCurve(name=name, wl=np.asarray(wl, float), tr=np.asarray(tr, float))


# passband set the reference hardcodes for unresolved photometry (mft6.py:766-769)
_PHOT_SDSS = [("SDSS_r", "sdss,r", "ab"), ("SDSS_i", "sdss,i", "ab"), ("SDSS_z", "sdss,z", "ab")]
_PHOT_2MASS = [("2MASS_J", "2mass,j", "vega"), ("2MASS_H", "2mass,h", "vega"),
               ("2MASS_Ks", "2mass,ks", "vega")]


class FilterBank:
    """Resolves filter names to curves + zero fluxes from a ``bps/`` directory."""

    def __init__(self, bps_dir: str, vega_path: Optional[str] = None):
        self.bps_dir = bps_dir
        self.vega_path = vega_path
        self._vega = None
        self._cache = {}

    def curve(self, name: str) -> FilterCurve:
        if name not in self._cache:
            self._cache[name] = load_transmission(name, self.bps_dir)
        return self._cache[name]

    def _vega_spectrum(self):
        if self._vega is None and self.vega_path and os.path.exists(self.vega_path):
            self._vega = load_vega_flam(self.vega_path)
        return self._vega

    def vega_zero_flux(self, key: str, curve: FilterCurve) -> float:
        vega = self._vega_spectrum()
        if vega is not None:
            wl, flam = vega
            W, _ = photon_flux_weights(wl, curve.wl, curve.tr)
            return float(W @ flam)
        if key in VEGA_ZERO_FLUX_FALLBACK:
            return VEGA_ZERO_FLUX_FALLBACK[key]
        raise ValueError(f"no Vega spectrum and no fallback zero flux for {key}")

    def phot_passbands(self, pfilt: Sequence[str]):
        """(curves, zero_fluxes) for unresolved photometry.

        Mirrors the reference: 3 filters -> 2MASS-only, else SDSS riz + 2MASS
        JHKs, independent of the pfilt strings (mft6.py:766-769).
        """
        entries = _PHOT_2MASS if len(pfilt) == 3 else _PHOT_SDSS + _PHOT_2MASS
        if len(pfilt) not in (3, 6):
            raise ValueError(
                f"reference photometry supports 3 (2MASS) or 6 (SDSS+2MASS) filters, got {len(pfilt)}"
            )
        curves, zps = [], []
        for key, name, kind in entries:
            c = self.curve(name)
            curves.append(c)
            if kind == "ab":
                # the pivot wavelength is a property of the filter alone
                _, lpivot = photon_flux_weights(c.wl, c.wl, c.tr)
                zps.append(ab_zero_flux(lpivot))
            else:
                zps.append(self.vega_zero_flux(key, c))
        return curves, zps

    def contrast_curves(self, cfilt: Sequence[str]) -> List[FilterCurve]:
        return [self.curve(f) for f in cfilt]
