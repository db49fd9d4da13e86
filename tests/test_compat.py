"""Reference-API compatibility layer and emcee-style sampler facade."""
import numpy as np
import jax.numpy as jnp
import pytest

from mcmc_spec_tpu import compat
from mcmc_spec_tpu.inference.sampler_api import EnsembleSampler
from mcmc_spec_tpu.models.mist import _anchor_table
from mcmc_spec_tpu.models.synthetic import synthetic_grid


class TestCompatFunctions:
    def test_chisq_and_gauss(self):
        np.testing.assert_allclose(compat.chisq([1, 2], [1.1, 1.8], [0.1, 0.1]),
                                   [(0.1 / 0.1) ** 2 * 0.01 / 0.01, 4.0])
        assert abs(compat.gauss(0.0, 0.0, 1.0, 2.0) - 2.0) < 1e-12
        assert compat.bimodal(0.0, 0.0, 1.0, 1.0, 0.0, 1.0, 1.0) == 2.0

    def test_bccorr_and_find_nearest(self):
        np.testing.assert_allclose(compat.bccorr([5000.0], 30.0, 10.0),
                                   [5000.0 * (1 + 20 / 3e5)])
        assert compat.find_nearest([1.0, 5.0, 9.0], 6.0) == 1

    def test_extinct_matches_ops(self):
        wl = np.linspace(4000, 9000, 50)
        spec = np.ones(50)
        out = compat.extinct(wl, spec, 0.3)
        from mcmc_spec_tpu.ops.extinction import ccm89

        np.testing.assert_allclose(out, 10 ** (-0.4 * np.asarray(ccm89(wl, 0.3))),
                                   rtol=1e-10)

    def test_mist_lookups(self):
        matrix = _anchor_table()
        matrix[:, 4] = 10.0 ** matrix[:, 4]
        matrix[:, 6] = 10.0 ** matrix[:, 6]
        r = compat.get_radius(5772.0, matrix)
        g = compat.get_logg(5772.0, matrix)
        assert abs(r - 1.0) < 0.05 and abs(g - 4.44) < 0.1

    def test_norm_spec_and_interp2(self):
        wl = np.linspace(0, 1, 50)
        model = 1 + 0.1 * wl
        data = model * (1.2 + 0.3 * wl - 0.1 * wl**2)
        renorm = compat.norm_spec(wl, model, data)
        np.testing.assert_allclose(renorm, model, rtol=1e-8)
        a, b = np.ones(5), 3 * np.ones(5)
        np.testing.assert_allclose(compat.interp_2_spec(a, b, 0.0, 1.0, 0.5),
                                   2 * np.ones(5))

    def test_find_model_paths(self):
        p = compat.find_model(3400, 4.5)
        assert p.endswith("lte034-4.5-0.0a+0.0.BT-Settl.spec.7.txt")
        p = compat.find_model(3400, 4.5, models="hires")
        assert "lte03400" in p and "HiRes" in p

    def test_broaden(self):
        wl = np.arange(6000.0, 6500.0, 0.2)
        flux = np.ones_like(wl)
        flux[1000] = 0.0
        w2, b = compat.broaden(wl, flux, 1700)
        assert b[1000] > 0.1  # line smeared
        np.testing.assert_allclose(w2, wl)

    def test_get_spec_with_reference_style_dict(self):
        grid = synthetic_grid(specrange=(6000.0, 7000.0), data_window=(6400.0, 6800.0),
                              resolution=1000, temps=np.array([3000.0, 3400.0]),
                              loggs=np.array([4.5, 5.0]), step=1.0)
        d = {"wl": grid.wl}
        for i, t in enumerate(grid.temps):
            for j, g in enumerate(grid.loggs):
                d[f"{int(t)}, {g}"] = grid.flux[i, j]
        wl_a, fx_a = compat.get_spec(3200.0, 4.75, [0.61, 0.69], grid)
        wl_b, fx_b = compat.get_spec(3200.0, 4.75, [0.61, 0.69], d)
        np.testing.assert_allclose(fx_a, fx_b, rtol=1e-12)
        assert wl_a.min() >= 6100 and wl_a.max() <= 6900
        # um unit option
        wl_c, _ = compat.get_spec(3200.0, 4.75, [0.61, 0.69], grid, wlunit="um")
        np.testing.assert_allclose(wl_c, wl_a * 1e-4)

    def test_get_transmission_signature(self):
        import os

        if not os.path.isdir("/root/reference/bps"):
            pytest.skip("bps unavailable")
        t_wl, t_cv, n_resel, cwl = compat.get_transmission("lp600", 1700,
                                                           bps_dir="/root/reference/bps")
        assert len(t_wl) == len(t_cv)
        assert 5900 < cwl < 8000 and n_resel > 0


class TestEnsembleSamplerAPI:
    def _logp(self):
        mu = jnp.asarray([1.0, -1.0])

        def logp(batch):
            return -0.5 * jnp.sum((batch - mu) ** 2, axis=1)

        return logp

    def test_run_and_chain(self):
        sampler = EnsembleSampler(16, 2, self._logp(), seed=1)
        p0 = np.random.RandomState(0).randn(16, 2) * 0.1 + [1.0, -1.0]
        last = sampler.run_mcmc(p0, 500)
        assert last.shape == (16, 2)
        chain = sampler.get_chain()
        assert chain.shape == (500, 16, 2)
        flat = sampler.get_chain(flat=True, discard=100)
        np.testing.assert_allclose(flat.mean(axis=0), [1.0, -1.0], atol=0.2)
        af = sampler.acceptance_fraction
        assert af.shape == (16,) and 0.2 < af[0] < 0.9
        taus = sampler.get_autocorr_time()
        assert taus.shape == (2,) and np.all(taus > 0)
        # legacy layout
        assert sampler.chain.shape == (16, 500, 2)

    def test_sample_generator_and_reset(self):
        sampler = EnsembleSampler(8, 2, self._logp(), seed=2)
        p0 = np.zeros((8, 2))
        states = list(sampler.sample(p0, iterations=200, block=50))
        assert len(states) == 4
        assert sampler.get_chain().shape[0] == 200
        sampler.reset()
        assert sampler.get_chain(flat=True).shape[0] == 0
