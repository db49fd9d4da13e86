"""Single-star mode (BASELINE config 1): chi^2 fit of GJ544B-style data."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmc_spec_tpu.bench_target import build_bench_target
from mcmc_spec_tpu.inference import batched
from mcmc_spec_tpu.inference import posterior as scalar
from mcmc_spec_tpu.inference.anneal import init_walkers, run_anneal
from mcmc_spec_tpu.inference.target import PC_CM, RSUN_CM, pack_target
from mcmc_spec_tpu.io.spectra import load_data_spectrum
from mcmc_spec_tpu.models.dust import AvProfile
from mcmc_spec_tpu.models.mist import MistTable
from mcmc_spec_tpu.models.synthetic import synthetic_grid
from mcmc_spec_tpu.ops.photometry import ab_zero_flux, photon_flux_weights
from tests.helpers import gaussian_filter_curve

GJ544B = "/root/reference/Data/GJ544B.ascii"


def _single_target(data_wl_um, flux, err, dtype=jnp.float64):
    grid = synthetic_grid(
        specrange=(5000.0, 12000.0), data_window=(6450.0, 8400.0), resolution=1700,
        temps=np.arange(3000.0, 5801.0, 400.0), loggs=np.array([4.5, 5.0, 5.5]),
        step=2.0,
    )
    pfilts = [gaussian_filter_curve("p_i", 7700.0, 350.0)]
    _, lp = photon_flux_weights(grid.wl, pfilts[0].wl, pfilts[0].tr)
    prior_mu = np.zeros(4)
    prior_sig = np.ones(4)
    prior_mu[-1] = 5e-2
    prior_sig[-1] = 1e-2
    tgt = pack_target(
        grid, data_wl_um, flux, err,
        [], np.zeros(0), np.zeros(0),  # no contrasts for a single star
        pfilts, [ab_zero_flux(lp)], np.array([10.0]), np.array([0.2]),
        MistTable.builtin(), AvProfile.constant(0.05, 0.05),
        nspec=1, prior_mu=prior_mu, prior_sig=prior_sig, dtype=dtype,
    )
    return grid, tgt


class TestSingleStar:
    def test_ndim_and_forward(self):
        wl = np.linspace(0.66, 0.83, 300)
        flux = np.ones(300)
        err = 0.01 * np.ones(300)
        grid, tgt = _single_target(wl, flux, err)
        assert tgt.ndim == 4  # [T1, Av, R1, plx]
        p = jnp.asarray([4000.0, 0.1, 0.3, 5e-2])
        out = scalar.forward(p, tgt)
        assert out.contrasts.shape == (0,)
        assert np.isfinite(float(scalar.log_posterior(p, tgt)))

    def test_batched_matches_scalar(self):
        wl = np.linspace(0.66, 0.83, 300)
        rng = np.random.RandomState(0)
        flux = 1 + 0.02 * rng.randn(300)
        grid, tgt = _single_target(wl, flux, 0.02 * np.ones(300))
        P = jnp.asarray(np.column_stack([
            rng.uniform(3200, 5500, 12), rng.uniform(0.0, 0.3, 12),
            rng.uniform(0.1, 1.0, 12), rng.uniform(0.01, 0.1, 12),
        ]))
        got = np.asarray(batched.log_posterior_batch(P, tgt))
        exp = np.asarray(jax.vmap(lambda q: scalar.log_posterior(q, tgt))(P))
        finite = np.isfinite(exp)
        np.testing.assert_allclose(got[finite], exp[finite], rtol=1e-9)

    @pytest.mark.skipif(not os.path.exists(GJ544B), reason="GJ544B data unavailable")
    def test_gj544b_chi2_fit(self):
        """BASELINE config 1: single-star chi^2 fit of GJ544B.ascii."""
        wl, flux, err = load_data_spectrum(GJ544B, 0.66, 0.83, mask=True,
                                           err_floor_frac=0.01)
        assert np.all(err > 0)
        grid, tgt = _single_target(wl, flux, err)
        p0 = init_walkers(tgt, 24, 5e-2, 1e-2, jax.random.PRNGKey(0))
        assert p0.shape == (24, 4)
        params, chi, _ = run_anneal(tgt, p0, jax.random.PRNGKey(1), steps=60)
        chi = np.asarray(chi)
        assert np.all(np.isfinite(chi))
        best = np.asarray(params)[np.argmin(chi)]
        # GJ544B is an M dwarf; the fit should land at the cool end of the grid
        assert best[0] < 4200.0
