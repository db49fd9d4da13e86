"""Instrumental & rotational broadening and resampling ops.

Re-implements the reference's broadening stack (``mft6.py:124-191``) without
PyAstronomy:

* ``instrumental_broaden``: Gaussian broadening to spectral resolution R on an
  evenly-spaced wavelength grid, equivalent to
  ``pyasl.instrBroadGaussFast(wl, flux, res, maxsig=5)``: the Gaussian FWHM is
  ``mean(wl)/R``, the kernel is evaluated on the grid spacing out to
  ``maxsig`` sigma, normalised to unit sum, and applied with a same-length
  convolution (no edge padding).  The reference then clamps the first 5 and
  last 10 pixels (``mft6.py:129-130``); ``edge_clamp`` reproduces that.
* ``rotational_broaden``: vsini rotational broadening with linear limb
  darkening (Gray's kernel), the analogue of ``pyasl.rotBroad``
  (``mft6.py:133-137``).
* ``redres`` / ``make_reg``: resampling helpers (``mft6.py:154-191``).

These run on host at grid-build time (once), and are also jit-safe for
on-device use.  The FFT variant is preferred for long (>=1e5 point) spectra.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_FWHM_TO_SIGMA = 1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0)))


def gaussian_instrumental_kernel(wl, resolution, maxsig=5.0):
    """Normalised Gaussian kernel on the grid spacing of ``wl`` (host numpy).

    FWHM = mean(wl)/resolution, evaluated at offsets ``k*dx`` for
    ``|k*dx| <= maxsig*sigma``, unit-sum normalised.
    """
    wl = np.asarray(wl)
    dx = float(wl[1] - wl[0])
    sigma = float(np.mean(wl)) / float(resolution) * _FWHM_TO_SIGMA
    half = max(1, int(maxsig * sigma / dx))
    offsets = np.arange(-half, half + 1) * dx
    kern = np.exp(-0.5 * (offsets / sigma) ** 2)
    return kern / kern.sum()


def edge_clamp(flux, n_lo=5, n_hi=10):
    """Clamp convolution edge artefacts like the reference (``mft6.py:129-130``)."""
    flux = np.asarray(flux).copy()
    flux[:n_lo] = flux[n_lo]
    flux[len(flux) - n_hi:] = flux[len(flux) - n_hi - 1]
    return flux


def instrumental_broaden(wl, flux, resolution, maxsig=5.0, clamp_edges=True):
    """Host-side Gaussian instrumental broadening (direct/FFT convolution)."""
    from scipy.signal import fftconvolve

    kern = gaussian_instrumental_kernel(wl, resolution, maxsig)
    out = fftconvolve(np.asarray(flux, dtype=np.float64), kern, mode="same")
    if clamp_edges:
        out = edge_clamp(out)
    return np.asarray(wl), out


def instrumental_broaden_fft(wl, flux, resolution, maxsig=5.0, clamp_edges=True):
    """JAX (jit-safe) Gaussian instrumental broadening via FFT convolution.

    ``wl`` must be evenly spaced and concrete (kernel size depends on it).
    """
    wl_np = np.asarray(wl)
    kern = jnp.asarray(gaussian_instrumental_kernel(wl_np, resolution, maxsig))
    n = wl_np.shape[0]
    k = kern.shape[0]
    fft_n = int(2 ** math.ceil(math.log2(n + k)))
    fk = jnp.fft.rfft(kern, fft_n)
    fs = jnp.fft.rfft(jnp.asarray(flux), fft_n)
    full = jnp.fft.irfft(fs * fk, fft_n)
    # 'same' slice of the full convolution
    start = (k - 1) // 2
    out = jax.lax.dynamic_slice_in_dim(full, start, n)
    if clamp_edges:
        out = out.at[:5].set(out[5])
        out = out.at[n - 10:].set(out[n - 11])
    return out


def rotational_broaden(wl, flux, vsini_kms, epsilon=0.6):
    """Rotational broadening with a linear limb-darkening law (host numpy).

    Convolves with Gray's rotational profile
    ``G(dl) = (2(1-eps)sqrt(1-(dl/dlmax)^2) + pi eps/2 (1-(dl/dlmax)^2)) /
    (pi dlmax (1-eps/3))`` where ``dlmax = lambda0 * vsini / c``.
    Analogue of ``pyasl.rotBroad`` used at ``mft6.py:133-137`` (the reference
    pipeline never enables it: ``vsini=0`` throughout).
    """
    from scipy.signal import fftconvolve

    wl = np.asarray(wl)
    flux = np.asarray(flux, dtype=np.float64)
    c_kms = 299792.458
    lam0 = float(np.mean(wl))
    dlmax = lam0 * vsini_kms / c_kms
    dx = float(wl[1] - wl[0])
    half = max(1, int(math.ceil(dlmax / dx)))
    dl = np.arange(-half, half + 1) * dx
    u = 1.0 - (dl / dlmax) ** 2
    u = np.clip(u, 0.0, None)
    kern = (2.0 * (1.0 - epsilon) * np.sqrt(u) + math.pi * epsilon / 2.0 * u) / (
        math.pi * dlmax * (1.0 - epsilon / 3.0)
    )
    s = kern.sum()
    if s <= 0:
        return flux
    kern = kern / s
    return fftconvolve(flux, kern, mode="same")


def redres(wl, spec, factor):
    """Resample to a coarser even grid by ``factor`` (``mft6.py:154-170``)."""
    wl = np.asarray(wl)
    spec = np.asarray(spec)
    diffs = wl[1:] - wl[:-1]
    new_step = float(np.median(diffs)) * factor
    wl_new = np.arange(wl.min(), wl.max(), new_step)
    spec_new = np.interp(wl_new, wl, spec)
    return wl_new, spec_new


def make_reg(wl, flux, waverange):
    """Evenly-resampled slice of a spectrum within ``waverange`` (``mft6.py:172-191``)."""
    wl = np.asarray(wl)
    flux = np.asarray(flux)
    step = float(wl[1] - wl[0])
    wl_slice = np.arange(min(waverange), max(waverange), step)
    return wl_slice, np.interp(wl_slice, wl, flux)
