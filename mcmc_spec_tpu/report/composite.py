"""Full-resolution composite model + vectorized posterior band magnitudes.

Two consumers:

* Plotting needs component spectra across the full grid wavelength range —
  the reference's ``make_composite(..., plot=True)`` path
  (``mft6.py:785-828``), reproduced here from the packed grid.
* The Kepler/Gaia posterior blocks (``mft6.py:2486-2541``) evaluate
  ``make_composite`` ~2000 times just to integrate two filters.  Band fluxes
  are linear in the grid spectra, so here they are bilinear blends of
  per-gridpoint band fluxes, vectorized over all posterior draws in one
  ``vmap`` — the whole 2000-draw posterior costs less than one reference
  evaluation.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mcmc_spec_tpu.inference.target import PC_CM, RSUN_CM
from mcmc_spec_tpu.models.grid import SpectralGrid
from mcmc_spec_tpu.models.mist import MistTable
from mcmc_spec_tpu.ops.interp import bilinear_bracket, bilinear_gather_blend
from mcmc_spec_tpu.ops.photometry import FilterCurve, contrast_weights, photon_flux_weights


def component_scales(p, nspec, dist_fit_vec=True):
    """Flux scales per component from a sample row (mft6.py:689-703)."""
    if dist_fit_vec:
        r1 = p[nspec + 1]
        ratios = p[nspec + 2 : 2 * nspec + 1]
        plx = p[2 * nspec + 1]
        base = (r1 * RSUN_CM * plx / PC_CM) ** 2
        return np.array([base] + [base * rr**2 for rr in ratios])
    ratios = p[nspec + 1 :]
    return np.array([1.0] + [rr**2 for rr in np.atleast_1d(ratios)])


def composite_full(grid: SpectralGrid, mist: MistTable, p, nspec=2, fit_plx=True):
    """(wl, composite, [component spectra]) on the full grid wavelength axis."""
    p = np.asarray(p, dtype=np.float64)
    teffs = p[:nspec]
    scales = component_scales(p, nspec, fit_plx)
    comps = []
    for k in range(nspec):
        lg = float(mist.get_logg(teffs[k]))
        comps.append(scales[k] * grid.interp_spectrum(teffs[k], lg))
    return grid.wl, np.sum(comps, axis=0), comps


def band_flux_table(grid: SpectralGrid, curve: FilterCurve, weighting: str = "trapz"):
    """Per-gridpoint band fluxes ``[nT, nG]`` for one filter.

    ``trapz`` is the reference's Kepler convention (plain ``trapz(spec*T)``,
    mft6.py:798-802); ``photon`` is pyphot's (used for Gaia G, mft6.py:811-814).
    """
    nT, nG, _ = grid.flux.shape
    if weighting == "trapz":
        W = contrast_weights(grid.wl, curve.wl, curve.tr)
    else:
        W, _ = photon_flux_weights(grid.wl, curve.wl, curve.tr)
    return (grid.flux.reshape(nT * nG, -1) @ W).reshape(nT, nG)


def band_mag_posteriors(
    grid: SpectralGrid,
    mist: MistTable,
    samples: np.ndarray,
    curves: Sequence[FilterCurve],
    weightings: Sequence[str],
    zero_fluxes: Sequence[float],
    nspec: int = 2,
    fit_plx: bool = True,
):
    """Component magnitudes for every posterior draw and band, vectorized.

    Returns ``mags [n_draws, n_bands, nspec]`` where
    ``mag = -2.5 log10(blend(F) * scale / zero_flux)``.
    """
    samples = np.asarray(samples, dtype=np.float64)
    tables = jnp.stack(
        [jnp.asarray(band_flux_table(grid, c, w)) for c, w in zip(curves, weightings)]
    )  # [nb, nT, nG]
    zps = jnp.asarray(np.asarray(zero_fluxes, dtype=np.float64))
    temps = jnp.asarray(grid.temps)
    loggs = jnp.asarray(grid.loggs)
    # host report path: use the widest dtype the session allows (requesting
    # float64 without x64 enabled triggers a truncation warning per call)
    report_dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    mist_lo, mist_step, mist_logg_tab, _ = mist.device_tables(dtype=report_dtype)

    def one_draw(p):
        teffs = p[:nspec]
        if fit_plx:
            r1 = p[nspec + 1]
            ratios = p[nspec + 2 : 2 * nspec + 1]
            plx = p[2 * nspec + 1]
            base = (r1 * RSUN_CM * plx / PC_CM) ** 2
            scales = jnp.concatenate([jnp.array([base]), base * ratios**2])
        else:
            scales = jnp.concatenate([jnp.ones(1), p[nspec + 1 :] ** 2])
        from mcmc_spec_tpu.models.mist import uniform_interp

        mags = []
        for k in range(nspec):
            lg = uniform_interp(mist_lo, mist_step, mist_logg_tab, teffs[k])
            ti, tw = bilinear_bracket(temps, teffs[k])
            gi, gw = bilinear_bracket(loggs, lg)
            f = bilinear_gather_blend(jnp.moveaxis(tables, 0, -1), ti, tw, gi, gw)  # [nb]
            mags.append(-2.5 * jnp.log10(jnp.maximum(f * scales[k] / zps, 1e-300)))
        return jnp.stack(mags, axis=-1)  # [nb, nspec]

    return np.asarray(jax.jit(jax.vmap(one_draw))(jnp.asarray(samples)))
