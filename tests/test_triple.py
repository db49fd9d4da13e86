"""Triple-star (nspec=3) path: scalar/batched equivalence + sampling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcmc_spec_tpu.bench_target import build_bench_target
from mcmc_spec_tpu.inference import batched
from mcmc_spec_tpu.inference import posterior as scalar
from mcmc_spec_tpu.inference.anneal import init_walkers, run_anneal
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble


@pytest.fixture(scope="module")
def triple():
    tgt, truth = build_bench_target(jnp.float64, nd=400, grid_step=8.0, nspec=3)
    return tgt, truth


def _batch(truth, n=16, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        q = np.asarray(truth, dtype=np.float64).copy()
        q[:3] += rng.uniform(-200, 200, 3)
        q[3] = abs(q[3] + rng.uniform(-0.05, 0.05))
        q[4] *= rng.uniform(0.9, 1.1)
        q[5] *= rng.uniform(0.9, 1.1)
        q[6] *= rng.uniform(0.9, 1.1)
        q[7] *= rng.uniform(0.95, 1.05)
        out.append(q)
    return jnp.asarray(np.stack(out))


class TestTripleEquivalence:
    def test_forward_shapes(self, triple):
        tgt, truth = triple
        assert tgt.nspec == 3
        out = scalar.forward(jnp.asarray(truth), tgt)
        assert out.contrasts.shape == (tgt.n_contrast,)
        assert out.scales.shape == (3,)

    def test_contrast_split_halves(self, triple):
        """First half of contrast filters vs comp 2, rest vs comp 3 (mft6.py:747-749)."""
        tgt, truth = triple
        out = scalar.forward(jnp.asarray(truth), tgt)
        # comp3 is cooler+smaller than comp2 -> larger contrast in the 2nd half
        nc = tgt.n_contrast
        assert float(out.contrasts[nc // 2]) > float(out.contrasts[0]) - 5  # sanity
        # verify against manual blend
        m, c, ph, s, _ = batched.forward_batch(jnp.asarray(truth)[None, :], tgt)
        np.testing.assert_allclose(np.asarray(c[0]), np.asarray(out.contrasts), rtol=1e-9)

    def test_batched_matches_scalar(self, triple):
        tgt, truth = triple
        P = _batch(truth)
        got = np.asarray(batched.log_posterior_batch(P, tgt))
        exp = np.asarray(jax.vmap(lambda p: scalar.log_posterior(p, tgt))(P))
        finite = np.isfinite(exp)
        np.testing.assert_array_equal(np.isfinite(got), finite)
        np.testing.assert_allclose(got[finite], exp[finite], rtol=1e-9)

    def test_triple_bounds(self, triple):
        tgt, truth = triple
        q = np.asarray(truth).copy()
        q[7] = 1.0 / 2000.0  # triple plx lower bound is 1/1000 (mft6.py:1347)
        assert float(scalar.log_prior(jnp.asarray(q), tgt)) == -np.inf
        q = np.asarray(truth).copy()
        q[6] = 0.01  # ratio below 0.05
        assert float(scalar.log_prior(jnp.asarray(q), tgt)) == -np.inf


class TestTripleSampling:
    def test_anneal_and_mcmc(self, triple):
        tgt, truth = triple
        p0 = init_walkers(tgt, 24, truth[-1], 0.05e-3, jax.random.PRNGKey(0))
        assert p0.shape == (24, 8)
        # T1 >= T2 >= T3 ordering at init
        p0n = np.asarray(p0)
        assert np.all(p0n[:, 1] <= p0n[:, 0])
        assert np.all(p0n[:, 2] <= p0n[:, 1])
        params, chi, _ = run_anneal(tgt, p0, jax.random.PRNGKey(1), steps=40)
        assert np.all(np.isfinite(np.asarray(chi)))
        # triple ratio fix keeps r3 < r2
        pn = np.asarray(params)
        assert np.all(pn[:, 6] < np.maximum(pn[:, 5], 1.0))

        seeds = pn[np.argsort(np.asarray(chi))[:8]]
        seeds = seeds * (1 + 1e-5 * np.random.RandomState(0).randn(*seeds.shape))
        logp = lambda b: batched.log_posterior_batch(b, tgt)
        state = init_ensemble(jnp.asarray(seeds), logp, jax.random.PRNGKey(2))
        state, chain, logps = run_ensemble(state, logp, n_steps=100, thin=10)
        assert np.all(np.isfinite(np.asarray(logps)[-1]))
