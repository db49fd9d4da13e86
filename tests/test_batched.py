"""Batched (production) posterior must match the scalar reference path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import make_setup
from mcmc_spec_tpu.inference import posterior as scalar
from mcmc_spec_tpu.inference import batched
from mcmc_spec_tpu.ops.interp import pwl_interp, tent_weights


class TestTentWeights:
    def test_matches_np_interp(self):
        rng = np.random.RandomState(0)
        xs = np.sort(rng.uniform(0, 10, 17))
        ys = rng.randn(17)
        q = rng.uniform(-2, 12, 200)  # includes out-of-range (clamped)
        got = np.asarray(pwl_interp(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(q)))
        np.testing.assert_allclose(got, np.interp(q, xs, ys), rtol=1e-12, atol=1e-12)

    def test_weights_sum_to_one(self):
        xs = jnp.asarray(np.linspace(0, 1, 9))
        q = jnp.asarray(np.linspace(-0.5, 1.5, 101))
        w = np.asarray(tent_weights(xs, q))
        np.testing.assert_allclose(w.sum(axis=-1), 1.0, rtol=1e-12)

    def test_two_node_edge_case(self):
        xs = jnp.asarray([0.0, 1.0])
        ys = jnp.asarray([2.0, 4.0])
        q = jnp.asarray([-1.0, 0.0, 0.5, 1.0, 2.0])
        got = np.asarray(pwl_interp(xs, ys, q))
        np.testing.assert_allclose(got, [2.0, 2.0, 3.0, 4.0, 4.0])


@pytest.fixture(scope="module", params=[False, True], ids=["plain", "rad_prior"])
def setup(request):
    return make_setup(rad_prior=request.param, dtype=jnp.float64)


def _batch_near_truth(st, n=32, seed=7, frac_oob=0.25):
    rng = np.random.RandomState(seed)
    p = st["p_truth"]
    out = []
    for i in range(n):
        q = p.copy()
        q[0] += rng.uniform(-300, 300)
        q[1] += rng.uniform(-250, 250)
        q[2] = q[2] + rng.uniform(-0.1, 0.1)
        q[3] *= rng.uniform(0.8, 1.2)
        q[4] *= rng.uniform(0.8, 1.2)
        q[5] *= rng.uniform(0.9, 1.1)
        if rng.rand() < frac_oob:  # deliberately out of bounds
            q[rng.randint(6)] = [9000.0, 500.0, -0.5, 0.01, 2.5, 1e-5][rng.randint(6)]
        out.append(q)
    return jnp.asarray(np.stack(out))


class TestBatchedEquivalence:
    def test_log_likelihood(self, setup):
        st, tgt = setup
        P = _batch_near_truth(st, frac_oob=0.0)
        got = np.asarray(batched.log_likelihood_batch(P, tgt))
        exp = np.asarray(jax.vmap(lambda p: scalar.log_likelihood(p, tgt))(P))
        np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-9)

    def test_log_prior(self, setup):
        st, tgt = setup
        P = _batch_near_truth(st, frac_oob=0.4)
        got = np.asarray(batched.log_prior_batch(P, tgt))
        exp = np.asarray(jax.vmap(lambda p: scalar.log_prior(p, tgt))(P))
        finite = np.isfinite(exp)
        np.testing.assert_array_equal(np.isfinite(got), finite)
        np.testing.assert_allclose(got[finite], exp[finite], rtol=1e-9, atol=1e-9)

    def test_log_posterior(self, setup):
        st, tgt = setup
        P = _batch_near_truth(st, frac_oob=0.4)
        got = np.asarray(batched.log_posterior_batch(P, tgt))
        exp = np.asarray(jax.vmap(lambda p: scalar.log_posterior(p, tgt))(P))
        finite = np.isfinite(exp)
        np.testing.assert_array_equal(np.isfinite(got), finite)
        np.testing.assert_allclose(got[finite], exp[finite], rtol=1e-9, atol=1e-9)

    def test_optimizer_chi2(self, setup):
        st, tgt = setup
        P = _batch_near_truth(st, frac_oob=0.0)
        rad_sigma = 0.1 * np.abs(np.asarray(P[:, 3:5]))
        got = np.asarray(batched.optimizer_chi2_batch(P, tgt, jnp.asarray(rad_sigma)))
        exp = np.asarray(
            jax.vmap(lambda p, s: scalar.optimizer_chi2(p, tgt, rad_sigma=s))(
                P, jnp.asarray(rad_sigma)
            )
        )
        np.testing.assert_allclose(got, exp, rtol=1e-9)

    def test_forward_pieces(self, setup):
        st, tgt = setup
        P = _batch_near_truth(st, frac_oob=0.0)
        model, contrasts, phot, scales, _ = batched.forward_batch(P, tgt)
        for i in range(4):
            out = scalar.forward(P[i], tgt)
            np.testing.assert_allclose(np.asarray(model[i]), np.asarray(out.model_data),
                                       rtol=1e-9)
            np.testing.assert_allclose(np.asarray(contrasts[i]), np.asarray(out.contrasts),
                                       rtol=1e-9, atol=1e-12)
            np.testing.assert_allclose(np.asarray(phot[i]), np.asarray(out.phot_mags),
                                       rtol=1e-9)

    def test_nospec_mode(self):
        st, tgt = make_setup(spectrum_weight=0.0, dtype=jnp.float64)
        P = _batch_near_truth(st, n=8, frac_oob=0.0)
        got = np.asarray(batched.log_likelihood_batch(P, tgt))
        exp = np.asarray(jax.vmap(lambda p: scalar.log_likelihood(p, tgt))(P))
        np.testing.assert_allclose(got, exp, rtol=1e-9)
