"""Posterior summary statistics: quantiles, bimodal mode decomposition.

Implements the reference's bimodal-marginal handling (``mft6.py:2029-2194``):
histogram each marginal, locate the inter-mode minimum, fit a two-Gaussian
mixture with ``curve_fit``, and adopt the dominant mode's (mu, sigma) as the
point estimate — falling back to the median with sigma=0 when the
distribution isn't bimodal (the reference's ``except`` path).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def gauss(x, mu, sigma, A):
    """Reference ``gauss`` (mft6.py:26-27)."""
    return A * np.exp(-((x - mu) ** 2) / 2 / sigma**2)


def bimodal(x, mu1, sigma1, A1, mu2, sigma2, A2):
    """Reference ``bimodal`` (mft6.py:29-30)."""
    return gauss(x, mu1, sigma1, A1) + gauss(x, mu2, sigma2, A2)


def bimodal_decompose(samples: np.ndarray, nbins: int = 75) -> Tuple[float, float, dict]:
    """(mode_mu, mode_sigma, diagnostics) for one marginal.

    Follows mft6.py:2078-2108: on any failure returns (median, 0.0, {}).
    """
    from scipy.optimize import curve_fit

    samples = np.asarray(samples, dtype=np.float64)
    med = float(np.median(samples))
    try:
        bins = np.linspace(samples.min(), samples.max(), nbins)
        count = np.zeros(len(bins))
        idx = np.searchsorted(bins, samples, side="right") - 1
        for i in idx:
            if 0 <= i < nbins - 1:
                count[i] += 1
        localmin = int(np.mean(np.where(count < 0.5 * count.max())))
        p0 = [
            np.mean(bins[localmin:]), np.std(bins[localmin:]), count[localmin:].max(),
            np.mean(bins[:localmin]), np.std(bins[:localmin]), count[:localmin].max(),
        ]
        fit, _ = curve_fit(bimodal, bins, count, p0)
        a1 = np.trapezoid(gauss(bins, *fit[:3])) / np.trapezoid(bimodal(bins, *fit))
        a2 = np.trapezoid(gauss(bins, *fit[3:])) / np.trapezoid(bimodal(bins, *fit))
        if a1 > a2:
            mu, sigma, frac = float(fit[0]), float(abs(fit[1])), float(a1)
        else:
            mu, sigma, frac = float(fit[3]), float(abs(fit[4])), float(a2)
        if not np.isfinite(mu) or not np.isfinite(sigma):
            raise ValueError
        return mu, sigma, {"fit": fit, "bins": bins, "count": count,
                           "localmin": localmin, "dominant_fraction": frac}
    except (RuntimeError, ValueError, TypeError):
        # curve_fit non-convergence / degenerate histogram: fall back to the
        # plain median like the reference's unfit branches (mft6.py:2029-2194)
        return med, 0.0, {}


def quantile_title(samples: np.ndarray, label: str, fmt: str = ".2f") -> str:
    """'label = med^{+hi}_{-lo}' with a per-parameter format.

    The reference requires a forked ``corner`` that indexes over a list of
    ``title_fmt`` strings (README; ``mft6.py:3684-3686``); here per-parameter
    formats are native.
    """
    q16, q50, q84 = np.percentile(np.asarray(samples), [16, 50, 84])
    return (
        rf"{label} = ${q50:{fmt}}^{{+{q84 - q50:{fmt}}}}_{{-{q50 - q16:{fmt}}}}$"
    )
