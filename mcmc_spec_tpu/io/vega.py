"""Vega reference spectrum loading (synphot-format FITS, PHOTLAM units).

The reference loads ``Data/vegaspec.fits`` via synphot (``mft6.py:3486``) and
pyphot's filter objects carry Vega zero fluxes in f_lambda.  The synphot file
stores flux in PHOTLAM (photons/s/cm^2/AA); converting to FLAM multiplies by
the photon energy ``hc/lambda``.
"""
from __future__ import annotations

import numpy as np

from mcmc_spec_tpu.io.fits import read_bintable

HC_ERG_AA = 6.62607015e-27 * 2.99792458e10 / 1e-8  # h*c with lambda in Angstrom


def load_vega_flam(path: str):
    """(wl_AA, flux_FLAM) from a synphot-format Vega FITS file."""
    t = read_bintable(path)
    wl = np.asarray(t["WAVELENGTH"], dtype=np.float64)
    photlam = np.asarray(t["FLUX"], dtype=np.float64)
    flam = photlam * HC_ERG_AA / wl
    return wl, flam
