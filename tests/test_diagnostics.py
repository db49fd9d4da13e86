"""Convergence diagnostics: autocorrelation, R-hat, ESS."""
import numpy as np
import jax
import jax.numpy as jnp

from mcmc_spec_tpu.inference.autocorr import (
    autocorr_func_1d,
    converged,
    effective_sample_size,
    gelman_rubin,
    integrated_time,
)
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble


class TestAutocorr:
    def test_white_noise_tau_near_one(self):
        rng = np.random.RandomState(0)
        chain = rng.randn(2000, 8, 2)
        taus = integrated_time(chain)
        assert np.all(taus < 2.0)

    def test_ar1_tau(self):
        # AR(1) with rho=0.9 has tau = (1+rho)/(1-rho) = 19
        rng = np.random.RandomState(1)
        n, w = 20000, 4
        x = np.zeros((n, w))
        for i in range(1, n):
            x[i] = 0.9 * x[i - 1] + rng.randn(w)
        taus = integrated_time(x[:, :, None])
        assert 12 < taus[0] < 28

    def test_acf_normalised(self):
        x = np.random.RandomState(2).randn(512)
        acf = autocorr_func_1d(x)
        assert abs(acf[0] - 1.0) < 1e-12

    def test_converged_gate(self):
        assert converged(np.array([2.0]), 200, np.array([2.05]))
        assert not converged(np.array([10.0]), 200)  # 10*50 > 200
        assert not converged(np.array([np.nan]), 10000)


class TestRhatESS:
    def test_rhat_near_one_for_iid(self):
        chain = np.random.RandomState(0).randn(1000, 16, 3)
        r = gelman_rubin(chain)
        assert np.all(r < 1.02)

    def test_rhat_large_for_separated_walkers(self):
        rng = np.random.RandomState(1)
        chain = rng.randn(500, 8, 1) * 0.1
        chain[:, :4] += 5.0  # two walker populations that never mix
        r = gelman_rubin(chain)
        assert r[0] > 2.0

    def test_ess_bounds(self):
        chain = np.random.RandomState(2).randn(1000, 8, 2)
        ess = effective_sample_size(chain)
        assert np.all(ess > 1000)  # iid: ess ~ n*w

    def test_on_sampler_output(self):
        mu = jnp.asarray([0.0, 2.0])
        logp = lambda b: -0.5 * jnp.sum((b - mu) ** 2, axis=1)
        coords = mu + 0.5 * jax.random.normal(jax.random.PRNGKey(0), (32, 2))
        state = init_ensemble(coords, logp, jax.random.PRNGKey(1))
        _, chain, _ = run_ensemble(state, logp, n_steps=2000, thin=1)
        chain = np.asarray(chain[200:])
        r = gelman_rubin(chain)
        assert np.all(r < 1.1)
        ess = effective_sample_size(chain)
        assert np.all(ess > 500)
