"""Affine-invariant ensemble MCMC (Goodman & Weare stretch move), TPU-native.

Replaces the reference's (commented-out) ``emcee.EnsembleSampler`` driver
(``mft6.py:1472-1529``).  The ensemble is updated red-black: the first half
proposes against the current second half, then the second half proposes
against the *updated* first half — the exact scheme emcee uses, which keeps
detailed balance when every walker in a half moves simultaneously.

All walkers evaluate the fused log-posterior under ``vmap``; whole chains run
inside a single ``lax.scan`` with zero host round-trips, emitting a thinned
chain.  Cross-chip scaling shards the walker axis over a mesh (see
``mcmc_spec_tpu/parallel``).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class EnsembleState(NamedTuple):
    coords: jnp.ndarray  # [nw, ndim]
    log_prob: jnp.ndarray  # [nw]
    key: jax.Array
    n_accept: jnp.ndarray  # [] total accepted moves


def _stretch_z(key, shape, a):
    """Draw from g(z) ~ 1/sqrt(z) on [1/a, a]: z = ((a-1)u + 1)^2 / a."""
    u = jax.random.uniform(key, shape)
    return ((a - 1.0) * u + 1.0) ** 2 / a


def _half_update(carry, half, log_prob_fn, a):
    """Propose and accept for one half of the ensemble against the other."""
    coords, logp, key, n_acc = carry
    nw, ndim = coords.shape
    nh = nw // 2
    sl = slice(0, nh) if half == 0 else slice(nh, nw)
    co = slice(nh, nw) if half == 0 else slice(0, nh)
    m = nh if half == 0 else nw - nh  # sizes differ when nw is odd
    n_comp = nw - m

    key, kz, kp, ka = jax.random.split(key, 4)
    z = _stretch_z(kz, (m,), a)
    partner_idx = jax.random.randint(kp, (m,), 0, n_comp)
    partners = coords[co][partner_idx]  # [m, ndim]

    cur = coords[sl]
    proposal = partners + z[:, None] * (cur - partners)
    logp_new = log_prob_fn(proposal)

    log_ratio = (ndim - 1) * jnp.log(z) + logp_new - logp[sl]
    accept = jnp.log(jax.random.uniform(ka, (m,))) < log_ratio

    new_half = jnp.where(accept[:, None], proposal, cur)
    new_logp_half = jnp.where(accept, logp_new, logp[sl])
    coords = coords.at[sl].set(new_half)
    logp = logp.at[sl].set(new_logp_half)
    return coords, logp, key, n_acc + jnp.sum(accept).astype(n_acc.dtype)


def stretch_step(state: EnsembleState, log_prob_fn: Callable, a: float = 2.0) -> EnsembleState:
    """One full ensemble update (both halves)."""
    carry = (state.coords, state.log_prob, state.key, state.n_accept)
    carry = _half_update(carry, 0, log_prob_fn, a)
    carry = _half_update(carry, 1, log_prob_fn, a)
    return EnsembleState(*carry)


def init_ensemble(coords, log_prob_fn, key) -> EnsembleState:
    """Initialise the ensemble; ``log_prob_fn`` maps [n, ndim] -> [n]."""
    coords = jnp.asarray(coords)
    logp = log_prob_fn(coords)
    return EnsembleState(coords, logp, key, jnp.zeros((), jnp.int32))


@functools.partial(jax.jit, static_argnames=("log_prob_fn", "n_steps", "thin", "a"))
def run_ensemble(
    state: EnsembleState,
    log_prob_fn: Callable,
    n_steps: int,
    thin: int = 1,
    a: float = 2.0,
):
    """Run ``n_steps`` stretch moves inside one ``lax.scan``.

    Returns ``(final_state, chain [n_steps//thin, nw, ndim], logps)``.
    With ``thin > 1`` only every ``thin``-th state is emitted (the reference
    dumps coords every ``nthin`` steps, mft6.py:1494-1510).
    """
    n_keep = n_steps // thin

    def outer(state, _):
        def inner(s, _):
            return stretch_step(s, log_prob_fn, a), None

        state, _ = jax.lax.scan(inner, state, None, length=thin)
        return state, (state.coords, state.log_prob)

    state, (chain, logps) = jax.lax.scan(outer, state, None, length=n_keep)
    return state, chain, logps


def acceptance_fraction(state: EnsembleState, n_steps: int) -> jnp.ndarray:
    nw = state.coords.shape[0]
    return state.n_accept / (nw * jnp.maximum(n_steps, 1))
