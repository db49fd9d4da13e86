"""Checkpoint/resume: an interrupted chain must continue exactly."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from mcmc_spec_tpu.io.results import Checkpoint
from mcmc_spec_tpu.inference.stretch import init_ensemble, run_ensemble
from mcmc_spec_tpu.ops.misc import bccorr, find_nearest


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "ck.npz")
        ck = Checkpoint(
            coords=np.random.randn(8, 3), log_prob=np.random.randn(8),
            key=np.asarray(jax.random.PRNGKey(5)), step=700, n_accept=123,
            chain=np.random.randn(7, 8, 3),
        )
        ck.save(path)
        ck2 = Checkpoint.load(path)
        np.testing.assert_array_equal(ck.coords, ck2.coords)
        np.testing.assert_array_equal(ck.key, ck2.key)
        assert ck2.step == 700 and ck2.n_accept == 123
        assert ck2.chain.shape == (7, 8, 3)

    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        """Run 40 steps straight vs 20 + checkpoint + 20: identical chains."""
        mu = jnp.asarray([1.0, -1.0])
        logp = lambda b: -0.5 * jnp.sum((b - mu) ** 2, axis=1)
        coords = mu + 0.1 * jax.random.normal(jax.random.PRNGKey(0), (16, 2))

        state = init_ensemble(coords, logp, jax.random.PRNGKey(1))
        s_full, chain_full, _ = run_ensemble(state, logp, n_steps=40, thin=1)

        state = init_ensemble(coords, logp, jax.random.PRNGKey(1))
        s_half, chain_a, _ = run_ensemble(state, logp, n_steps=20, thin=1)
        path = str(tmp_path / "ck.npz")
        Checkpoint(np.asarray(s_half.coords), np.asarray(s_half.log_prob),
                   np.asarray(s_half.key), 20, int(s_half.n_accept),
                   chain=np.asarray(chain_a)).save(path)

        ck = Checkpoint.load(path)
        resumed = init_ensemble(jnp.asarray(ck.coords), logp, jnp.asarray(ck.key))
        resumed = resumed._replace(n_accept=jnp.asarray(ck.n_accept, jnp.int32))
        s_res, chain_b, _ = run_ensemble(resumed, logp, n_steps=20, thin=1)

        chain_resumed = np.concatenate([ck.chain, np.asarray(chain_b)], axis=0)
        np.testing.assert_allclose(chain_resumed, np.asarray(chain_full), rtol=1e-12)
        assert int(s_res.n_accept) == int(s_full.n_accept)


class TestMiscOps:
    def test_bccorr(self):
        wl = jnp.asarray([5000.0, 6000.0])
        out = np.asarray(bccorr(wl, 30.0, 10.0))
        np.testing.assert_allclose(out, np.array([5000.0, 6000.0]) * (1 + 20.0 / 3e5))

    def test_find_nearest(self):
        assert int(find_nearest(jnp.asarray([1.0, 2.0, 5.0]), 2.3)) == 1


class TestOrbaxBackend:
    """MCMC_SPEC_CKPT_BACKEND=orbax: same exact-resume semantics, orbax tree."""

    def test_roundtrip(self, tmp_path, monkeypatch):
        from mcmc_spec_tpu.io import results as rio

        monkeypatch.setenv("MCMC_SPEC_CKPT_BACKEND", "orbax")
        path = str(tmp_path / "ck.npz")
        ck = rio.Checkpoint(
            coords=np.random.randn(8, 3), log_prob=np.random.randn(8),
            key=np.asarray(jax.random.PRNGKey(5)), step=700, n_accept=123,
            chain=np.random.randn(7, 8, 3), config_tag="cfg:1",
        )
        rio.save_checkpoint(ck, path)
        assert not os.path.exists(path)  # npz not written in orbax mode
        ck2 = rio.maybe_load_checkpoint(path)
        np.testing.assert_array_equal(ck.coords, ck2.coords)
        np.testing.assert_array_equal(ck.key, ck2.key)
        assert ck2.step == 700 and ck2.n_accept == 123
        assert ck2.config_tag == "cfg:1"
        assert ck2.chain.shape == (7, 8, 3)
        # overwrite (force=True) and cleanup
        rio.save_checkpoint(ck, path)
        rio.remove_checkpoint(path)
        assert rio.maybe_load_checkpoint(path) is None

    def test_npz_default_unchanged(self, tmp_path):
        from mcmc_spec_tpu.io import results as rio

        path = str(tmp_path / "ck.npz")
        ck = rio.Checkpoint(
            coords=np.zeros((4, 2)), log_prob=np.zeros(4),
            key=np.asarray(jax.random.PRNGKey(0)), step=10,
        )
        rio.save_checkpoint(ck, path)
        assert os.path.exists(path)
        assert rio.maybe_load_checkpoint(path).step == 10
        rio.remove_checkpoint(path)
        assert rio.maybe_load_checkpoint(path) is None


class TestAsyncOrbax:
    def test_async_roundtrip(self, tmp_path, monkeypatch):
        """MCMC_SPEC_CKPT_ASYNC=1: save returns immediately; load barriers
        on the in-flight commit and restores bit-identically."""
        import numpy as np

        from mcmc_spec_tpu.io import results as results_io

        monkeypatch.setenv("MCMC_SPEC_CKPT_BACKEND", "orbax")
        monkeypatch.setenv("MCMC_SPEC_CKPT_ASYNC", "1")
        path = str(tmp_path / "chain_checkpoint.npz")
        rng = np.random.RandomState(0)
        ck = results_io.Checkpoint(
            coords=rng.randn(8, 6), log_prob=rng.randn(8),
            key=np.array([1, 2], dtype=np.uint32), step=300, n_accept=41,
            config_tag="async:test:tag",
        )
        results_io.save_checkpoint(ck, path)
        # immediately overwrite (exercises the one-in-flight barrier)
        ck2 = results_io.Checkpoint(
            coords=ck.coords * 2, log_prob=ck.log_prob, key=ck.key,
            step=400, n_accept=50, config_tag="async:test:tag",
        )
        results_io.save_checkpoint(ck2, path)
        got = results_io.maybe_load_checkpoint(path)
        assert got is not None and got.step == 400 and got.n_accept == 50
        np.testing.assert_array_equal(got.coords, ck2.coords)
        assert got.config_tag == "async:test:tag"
        results_io.remove_checkpoint(path)
        assert results_io.maybe_load_checkpoint(path) is None
