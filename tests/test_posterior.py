"""Validate the fused packed-projection posterior against the numpy emulator
of the reference's scoring math (see tests/helpers.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_setup
from mcmc_spec_tpu.inference.posterior import (
    chi2_total,
    forward,
    forward_summary,
    log_likelihood,
    log_posterior,
    log_prior,
    mist_logg,
    mist_radius,
    optimizer_chi2,
)


@pytest.fixture(scope="module")
def setup():
    return make_setup(dtype=jnp.float64)


def _params_near_truth(setup, n=12, seed=3):
    rng = np.random.RandomState(seed)
    p = setup["p_truth"]
    out = []
    for _ in range(n):
        q = p.copy()
        q[0] += rng.uniform(-300, 300)
        q[1] += rng.uniform(-200, 200)
        q[2] = abs(q[2] + rng.uniform(-0.1, 0.1))
        q[3] *= rng.uniform(0.8, 1.2)
        q[4] *= rng.uniform(0.8, 1.2)
        q[5] *= rng.uniform(0.95, 1.05)
        out.append(q)
    return np.stack(out)


class TestForwardEquivalence:
    def test_contrasts_match_emulator(self, setup):
        st, tgt = setup
        emu = st["emulator"]
        for p in _params_near_truth(st, 4):
            got = forward(jnp.asarray(p), tgt)
            exp = emu.forward(p)
            np.testing.assert_allclose(
                np.asarray(got.contrasts), exp["contrasts"], rtol=1e-8, atol=1e-8
            )

    def test_phot_mags_match_emulator(self, setup):
        st, tgt = setup
        emu = st["emulator"]
        for p in _params_near_truth(st, 4):
            got = forward(jnp.asarray(p), tgt)
            exp = emu.forward(p)
            np.testing.assert_allclose(np.asarray(got.phot_mags), exp["phot"], rtol=1e-8)

    def test_model_spectrum_matches_emulator(self, setup):
        # extinction-before-interp vs interp-before-extinction commute to ~1e-6
        st, tgt = setup
        emu = st["emulator"]
        p = st["p_truth"]
        got = forward_summary(jnp.asarray(p), tgt)
        exp = emu.forward(p)
        model = exp["model_data"] * np.median(st["data_flux"]) / np.median(exp["model_data"])
        np.testing.assert_allclose(np.asarray(got["model_data"]), model, rtol=2e-5)


class TestChi2Equivalence:
    def test_chi2_matches_emulator(self, setup):
        st, tgt = setup
        emu = st["emulator"]
        for p in _params_near_truth(st, 8):
            got = float(chi2_total(jnp.asarray(p), tgt))
            exp = emu.chi2(p)
            assert abs(got - exp) / max(abs(exp), 1e-9) < 2e-4, (got, exp, p)

    def test_log_posterior_matches_emulator(self, setup):
        st, tgt = setup
        emu = st["emulator"]
        for p in _params_near_truth(st, 8, seed=11):
            got = float(log_posterior(jnp.asarray(p), tgt))
            exp = emu.log_posterior(p)
            assert abs(got - exp) / max(abs(exp), 1e-9) < 2e-4, (got, exp)

    def test_optimizer_weighting_x3(self, setup):
        st, tgt = setup
        p = jnp.asarray(st["p_truth"])
        base = float(chi2_total(p, tgt, spec_mult=1.0))
        tri = float(chi2_total(p, tgt, spec_mult=3.0))
        # the spectrum term scales x3, contrast/phot terms unchanged
        a1, b1, c1 = [float(x) for x in
                      __import__("mcmc_spec_tpu.inference.posterior", fromlist=["x"])._chi2_terms(p, tgt, 1.0)]
        assert abs((tri - base) - 2 * a1) < 1e-6 * max(base, 1.0)


class TestPriors:
    def test_out_of_bounds_rejected(self, setup):
        st, tgt = setup
        p = st["p_truth"].copy()
        cases = []
        q = p.copy(); q[0] = 9000.0; cases.append(q)  # T above grid
        q = p.copy(); q[1] = 1000.0; cases.append(q)  # T below grid
        q = p.copy(); q[2] = -0.1; cases.append(q)  # negative Av
        q = p.copy(); q[3] = 0.01; cases.append(q)  # R1 too small
        q = p.copy(); q[3] = 2.0; cases.append(q)  # R1 > 1.5
        q = p.copy(); q[5] = 1e-5; cases.append(q)  # plx < 1/3000
        q = p.copy(); q[5] = 0.5; cases.append(q)  # plx > 1/4
        for q in cases:
            assert float(log_prior(jnp.asarray(q), tgt)) == -np.inf
            assert float(log_posterior(jnp.asarray(q), tgt)) == -np.inf

    def test_in_bounds_prior_matches_emulator(self, setup):
        st, tgt = setup
        emu = st["emulator"]
        for p in _params_near_truth(st, 6, seed=5):
            got = float(log_prior(jnp.asarray(p), tgt))
            exp = emu.log_prior(p)
            if np.isfinite(exp):
                np.testing.assert_allclose(got, exp, rtol=1e-6, atol=1e-9)
            else:
                assert got == -np.inf

    def test_rad_prior_mode(self):
        st, tgt = make_setup(rad_prior=True, dtype=jnp.float64)
        emu = st["emulator"]
        p = st["p_truth"]
        got = float(log_prior(jnp.asarray(p), tgt))
        exp = emu.log_prior(p)
        # the 2%-sigma radius prior amplifies the ~7e-5 MIST-table resample
        # difference; agreement to 0.01 in log-prob is far below 0.5 sigma
        np.testing.assert_allclose(got, exp, atol=0.01)


class TestNospecMode:
    def test_spectrum_weight_zero_drops_spec_term(self):
        st, tgt = make_setup(spectrum_weight=0.0, dtype=jnp.float64)
        emu = st["emulator"]
        p = st["p_truth"]
        got = float(chi2_total(jnp.asarray(p), tgt))
        exp = emu.chi2(p)  # emulator also uses spectrum_weight=0
        np.testing.assert_allclose(got, exp, rtol=1e-5)
        # equals bare contrast+phot chi2
        fwd = emu.forward(p)
        manual = (np.sum((fwd["contrasts"] - emu.cmag) ** 2 / emu.cerr**2)
                  + np.sum((fwd["phot_ext"] - emu.pmag) ** 2 / emu.perr**2))
        np.testing.assert_allclose(got, manual, rtol=1e-5)


class TestMistLookups:
    def test_device_tables_match_host(self, setup):
        st, tgt = setup
        mist = st["mist"]
        for t in [3100.0, 3700.0, 4500.0, 5500.0]:
            np.testing.assert_allclose(
                float(mist_logg(tgt, jnp.asarray(t))), mist.get_logg(t), rtol=1e-3
            )
            np.testing.assert_allclose(
                float(mist_radius(tgt, jnp.asarray(t))), mist.get_radius(t), rtol=1e-3
            )


class TestVmapJit:
    def test_vmapped_posterior(self, setup):
        st, tgt = setup
        ps = jnp.asarray(_params_near_truth(st, 12))
        lp = jax.jit(jax.vmap(lambda p: log_posterior(p, tgt)))(ps)
        assert lp.shape == (12,)
        assert np.all(np.isfinite(np.asarray(lp)))

    def test_float32_close_to_float64(self, setup):
        st64, tgt64 = setup
        st32, tgt32 = make_setup(dtype=jnp.float32)
        p = st64["p_truth"]
        a = float(chi2_total(jnp.asarray(p), tgt64))
        b = float(chi2_total(jnp.asarray(p, dtype=jnp.float32), tgt32))
        # f32 packing holds chi2 to <1% on normalised data
        assert abs(a - b) / abs(a) < 1e-2


class TestAnnealerStageParity:
    """Annealer (fit_spec) scoring vs the reference emulator (VERDICT r2
    next-round item 6: the x3-weighted stage-1 path was previously compared
    only internally).  fit_spec median-matches the model and scores against
    the RAW data — no deg-2 continuum renorm (mft6.py:1007-1014), unlike the
    emcee-stage loglikelihood (mft6.py:1172-1174)."""

    def test_optimizer_chi2_matches_emulator(self, setup):
        st, tgt = setup
        emu = st["emulator"]
        for p in _params_near_truth(st, 8, seed=17):
            got = float(optimizer_chi2(jnp.asarray(p), tgt))
            exp = emu.optimizer_chi2(p)
            assert abs(got - exp) / max(abs(exp), 1e-9) < 2e-4, (got, exp, p)

    def test_optimizer_chi2_batch_matches_emulator(self, setup):
        from mcmc_spec_tpu.inference.batched import optimizer_chi2_batch

        st, tgt = setup
        emu = st["emulator"]
        P = _params_near_truth(st, 8, seed=19)
        got = np.asarray(optimizer_chi2_batch(jnp.asarray(P), tgt))
        exp = np.array([emu.optimizer_chi2(p) for p in P])
        np.testing.assert_allclose(got, exp, rtol=2e-4)

    def test_rad_prior_with_step_sigmas(self):
        from mcmc_spec_tpu.inference.batched import optimizer_chi2_batch

        st, tgt = make_setup(rad_prior=True, dtype=jnp.float64)
        emu = st["emulator"]
        P = _params_near_truth(st, 6, seed=23)
        rad_sigma = np.abs(0.08 * P[:, 3:5])  # annealer step sizes
        got = np.asarray(optimizer_chi2_batch(
            jnp.asarray(P), tgt, rad_sigma=jnp.asarray(rad_sigma)))
        exp = np.array([emu.optimizer_chi2(p, rad_sigma=s)
                        for p, s in zip(P, rad_sigma)])
        np.testing.assert_allclose(got, exp, rtol=2e-4)

    def test_annealer_skips_continuum_renorm(self, setup):
        """The stage-1 chi^2 must differ from a renorm'd one (regression:
        round-2 applied the emcee-stage renorm inside the annealer)."""
        from mcmc_spec_tpu.inference.posterior import chi2_total

        st, tgt = setup
        p = jnp.asarray(st["p_truth"] * 1.02)
        with_renorm = float(chi2_total(p, tgt, spec_mult=3.0, renorm=True))
        without = float(chi2_total(p, tgt, spec_mult=3.0, renorm=False))
        assert abs(with_renorm - without) / max(without, 1e-9) > 1e-6
