"""Integrated autocorrelation time (emcee-compatible) for convergence gating.

The reference's emcee driver stops sampling when ``acl * 50 < n`` and the
relative ACL change drops below 10% (``mft6.py:1512-1524``).  This reproduces
emcee's estimator: per-walker FFT autocorrelation, averaged over walkers, with
Sokal's automated windowing (window ``M`` = first ``m`` with ``m >= c*tau_m``).
"""
from __future__ import annotations

import numpy as np


def _next_pow_two(n: int) -> int:
    i = 1
    while i < n:
        i <<= 1
    return i


def autocorr_func_1d(x: np.ndarray) -> np.ndarray:
    """Normalised autocorrelation function of a 1-D series (FFT-based)."""
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    n = _next_pow_two(len(x))
    f = np.fft.fft(x - np.mean(x), n=2 * n)
    acf = np.fft.ifft(f * np.conjugate(f))[: len(x)].real
    acf /= acf[0] if acf[0] != 0 else 1.0
    return acf


def integrated_time(chain: np.ndarray, c: float = 5.0) -> np.ndarray:
    """tau per parameter for ``chain [nsteps, nwalkers, ndim]``.

    The per-walker autocorrelation FFTs run BATCHED over the walker axis
    (the round-2 per-walker Python loop cost 24k numpy FFT calls per check
    at production fleet scale — 4096 walkers x 6 params — on this 1-core
    box), but looped over the (small) parameter axis with real-input
    rfft/irfft: the chain is real, so full complex FFTs doubled the work,
    and materializing [2n, nw, ndim] complex128 temporaries reached GB
    scale per convergence check at 15k-step production chains.  Per-dim
    rfft bounds the transient to ~(n+1) x nw complex.  (Both production
    callers additionally cap nw at 256 walkers before calling — emcee's
    estimator walker-averages, so a few hundred walkers already beat the
    reference's own 50-walker ensemble statistically.)
    """
    chain = np.asarray(chain)
    if chain.ndim == 2:
        chain = chain[:, :, None]
    nsteps, nw, ndim = chain.shape
    n = _next_pow_two(nsteps)
    x = np.asarray(chain, dtype=np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    taus = np.empty(ndim)
    for d in range(ndim):
        f = np.fft.rfft(x[:, :, d], n=2 * n, axis=0)
        acf = np.fft.irfft(np.abs(f) ** 2, n=2 * n, axis=0)[:nsteps]  # [n, nw]
        norm = acf[0].copy()
        norm[norm == 0] = 1.0
        acf = (acf / norm).mean(axis=1)  # walker-averaged, [nsteps]
        taus_m = 2.0 * np.cumsum(acf) - 1.0
        window = _auto_window(taus_m, c)
        taus[d] = taus_m[window]
    return taus


def _auto_window(taus: np.ndarray, c: float) -> int:
    m = np.arange(len(taus)) < c * taus
    if np.any(m):
        return int(np.argmin(m))
    return len(taus) - 1


def gelman_rubin(chain: np.ndarray) -> np.ndarray:
    """Split-R-hat per parameter for ``chain [nsteps, nwalkers, ndim]``.

    The standard split-chain potential-scale-reduction diagnostic (not in the
    reference, which relies on the autocorrelation gate alone); values near 1
    indicate the walkers sample the same distribution.
    """
    chain = np.asarray(chain, dtype=np.float64)
    n, w, d = chain.shape
    half = n // 2
    seqs = np.concatenate([chain[:half], chain[half : 2 * half]], axis=1)  # [half, 2w, d]
    m = seqs.shape[1]
    means = seqs.mean(axis=0)  # [2w, d]
    variances = seqs.var(axis=0, ddof=1)  # [2w, d]
    W = variances.mean(axis=0)
    B = half * means.var(axis=0, ddof=1)
    var_hat = (half - 1) / half * W + B / half
    return np.sqrt(var_hat / np.maximum(W, 1e-300))


def effective_sample_size(chain: np.ndarray) -> np.ndarray:
    """ESS per parameter: total samples / integrated autocorrelation time."""
    chain = np.asarray(chain)
    taus = integrated_time(chain)
    return chain.shape[0] * chain.shape[1] / np.maximum(taus, 1.0)


def converged(taus, n_steps: int, old_taus=None, factor: float = 50.0, rtol: float = 0.1):
    """The reference's convergence gate (mft6.py:1518-1522)."""
    taus = np.asarray(taus)
    if np.any(np.isnan(taus)):
        return False
    ok = np.all(taus * factor < n_steps)
    if old_taus is not None and np.all(np.isfinite(old_taus)):
        ok &= np.all(np.abs(np.asarray(old_taus) - taus) / taus < rtol)
    return bool(ok)
