"""Observed-spectrum ingest: load, telluric mask, window, median-normalise.

Mirrors the reference ``main``'s data path (``mft6.py:3492-3509``): three-column
(wavelength um, flux, error) text files; telluric bands dropped when masking is
on (``mft6.py:3496-3499``); windowed to ``[spmin, spmax]``; flux and error both
divided by the flux median.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# (lo, hi) in microns, dropped when mask=True (mft6.py:3496-3499)
TELLURIC_BANDS = [(0.6860, 0.6880), (0.7600, 0.7660), (0.8210, 0.8240)]


def apply_telluric_mask(wl_um: np.ndarray) -> np.ndarray:
    """Boolean keep-mask reproducing the reference's concatenation exactly."""
    keep = np.ones(len(wl_um), dtype=bool)
    keep &= ~((wl_um > TELLURIC_BANDS[0][0]) & (wl_um < TELLURIC_BANDS[0][1]))
    keep &= ~((wl_um > TELLURIC_BANDS[1][0]) & (wl_um < TELLURIC_BANDS[1][1]))
    # the last band drops its upper boundary too: the reference keeps only
    # wl > 0.8240 after it (mft6.py:3497)
    keep &= ~((wl_um > TELLURIC_BANDS[2][0]) & (wl_um <= TELLURIC_BANDS[2][1]))
    return keep


def load_data_spectrum(
    path: str, spmin: float, spmax: float, mask: bool = True,
    err_floor_frac: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(wl_um, flux, err) masked, windowed, and median-normalised.

    ``err_floor_frac`` floors non-positive errors at a fraction of |flux|
    (some archival spectra, e.g. ``Data/GJ544B.ascii``, ship zero errors).
    """
    wl, flux, err = np.genfromtxt(path, unpack=True)
    if err_floor_frac > 0:
        err = np.where(err <= 0, err_floor_frac * np.abs(flux), err)
    if mask:
        keep = apply_telluric_mask(wl)
        wl, flux, err = wl[keep], flux[keep], err[keep]
    sel = (wl > spmin) & (wl < spmax)
    wl, flux, err = wl[sel], flux[sel], err[sel]
    med = np.median(flux)
    return wl, flux / med, err / med
