"""Self-contained benchmark target: koi2298-scale workload, no external data.

Mirrors the shape of benchmark config 2 in BASELINE.md: a binary fit with
~1.8k data wavelengths (HET/LRS2-like), 2 contrast filters, 6 photometric
filters, a 14x4 (Teff, logg) grid — the same tensor shapes the real koi2298
fit produces, built from the synthetic model family so it runs anywhere.
"""
from __future__ import annotations

import numpy as np

from mcmc_spec_tpu.inference.target import PC_CM, RSUN_CM, pack_target
from mcmc_spec_tpu.models.dust import AvProfile
from mcmc_spec_tpu.models.mist import MistTable
from mcmc_spec_tpu.models.synthetic import synthetic_grid
from mcmc_spec_tpu.ops.photometry import FilterCurve, ab_zero_flux, photon_flux_weights

TRUTH = np.array([4600.0, 3400.0, 0.12, 0.72, 0.45, 2.0e-3])


def _gaussian_filter(name, center, width, n=256):
    wl = np.linspace(center - 4 * width, center + 4 * width, n)
    return FilterCurve(name=name, wl=wl, tr=np.exp(-0.5 * ((wl - center) / width) ** 2))


def build_bench_target(dtype, nd=1792, grid_step=1.0, nspec=2, seed=0,
                       pad_nd=None, pad_nc=None, stage_on_device=True):
    """(PackedTarget, truth params). Deterministic.

    ``pad_nd``/``pad_nc`` thread through to ``pack_target`` (inert fleet
    padding) so on-device shape sweeps can build padded fleet members
    without the test fixtures (scripts/tpu_validation.py).
    ``stage_on_device=False`` returns a host-numpy target (the WxS staging
    mode; observed cmag/pmag are mirrored back to host too)."""
    import jax.numpy as jnp  # noqa: F401

    rng = np.random.RandomState(seed)
    specrange = (3000.0, 26000.0)
    window = (6450.0, 8400.0)
    grid = synthetic_grid(
        specrange=specrange,
        data_window=window,
        resolution=1700,
        temps=np.arange(3000.0, 5601.0, 200.0),
        loggs=np.array([4.0, 4.5, 5.0, 5.5]),
        step=grid_step,
    )
    mist = MistTable.builtin()

    data_wl_um = np.linspace(0.652, 0.838, nd)
    p = TRUTH.copy()
    if nspec == 3:
        p = np.array([4600.0, 3800.0, 3300.0, 0.12, 0.72, 0.55, 0.3, 2.0e-3])

    # composite at truth on the data grid
    d_pc = 1.0 / p[-1]
    teffs = p[:nspec]
    r1 = p[nspec + 1]
    ratios = np.concatenate([[1.0], p[nspec + 2 : 2 * nspec + 1]])
    comp = np.zeros(len(grid.wl))
    for k in range(nspec):
        scale = (r1 * ratios[k] * RSUN_CM / (d_pc * PC_CM)) ** 2
        comp += scale * grid.interp_spectrum(teffs[k], float(mist.get_logg(teffs[k])))
    flux = np.interp(data_wl_um * 1e4, grid.wl, comp)
    err = 0.01 * np.abs(flux)
    flux = flux + rng.normal(0, err)
    med = np.median(flux)
    flux, err = flux / med, err / med

    cfilts = [_gaussian_filter("lp600ish", 6000.0, 150.0),
              _gaussian_filter("Kpish", 21000.0, 400.0)]
    pfilts = [
        _gaussian_filter("r", 6250.0, 300.0), _gaussian_filter("i", 7700.0, 350.0),
        _gaussian_filter("z", 9100.0, 400.0), _gaussian_filter("J", 12350.0, 500.0),
        _gaussian_filter("H", 16620.0, 600.0), _gaussian_filter("K", 21590.0, 700.0),
    ]
    zps = []
    for f in pfilts:
        _, lp = photon_flux_weights(f.wl, f.wl, f.tr)
        zps.append(ab_zero_flux(lp))

    ndim = 2 * nspec + 2
    prior_mu = np.zeros(ndim)
    prior_sig = np.ones(ndim)
    prior_mu[-1] = p[-1]
    prior_sig[-1] = 0.05e-3

    tgt = pack_target(
        grid, data_wl_um, flux, err,
        cfilts, np.array([2.0, 1.3][: len(cfilts)]), np.full(len(cfilts), 0.05),
        pfilts, zps,
        # placeholder observations; replaced below with model-at-truth + noise
        pmag=np.zeros(len(pfilts)), perr=np.full(len(pfilts), 0.05),
        mist=mist, av_profile=AvProfile.constant(0.12, 0.05),
        nspec=nspec, dist_fit=True, rad_prior=False,
        prior_mu=prior_mu, prior_sig=prior_sig, dtype=dtype,
        pad_nd=pad_nd, pad_nc=pad_nc, stage_on_device=stage_on_device,
    )
    # fill observed contrasts/photometry from the packed forward at truth
    import jax
    import jax.numpy as jnp
    from mcmc_spec_tpu.inference.posterior import forward

    out = forward(jnp.asarray(p, dtype=dtype), tgt)
    import dataclasses

    # noise draws are sized by the TRUE filter counts (not the padded
    # forward-output shapes) so a pad_nc/pad_nd build consumes the same RNG
    # stream as its unpadded twin — padding-inertness comparisons on these
    # fixtures must see identical true observations, not an RNG shift
    cnoise = np.zeros(out.contrasts.shape[-1])
    cnoise[: len(cfilts)] = rng.normal(0, 0.02, len(cfilts))
    cmag = out.contrasts + jnp.asarray(cnoise, dtype=dtype)
    pmag = out.phot_mags + jnp.asarray(rng.normal(0, 0.02, len(pfilts)), dtype=dtype)
    if not stage_on_device:
        cmag, pmag = np.asarray(cmag), np.asarray(pmag)
    tgt = dataclasses.replace(tgt, cmag=cmag, pmag=pmag)
    return tgt, p


def init_walker_batch(tgt, truth, nwalk, dtype, seed=1):
    """Truth-centred walker cloud for benchmarking/sampling."""
    import jax

    key = jax.random.PRNGKey(seed)
    import jax.numpy as jnp

    scale = jnp.asarray(
        np.concatenate([np.full(tgt.nspec, 50.0), [0.02],
                        np.full(tgt.nspec, 0.02), [0.02e-3]]), dtype=dtype
    )
    noise = jax.random.normal(key, (nwalk, len(truth)), dtype=dtype)
    return jnp.asarray(truth, dtype=dtype) + noise * scale
