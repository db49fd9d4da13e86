"""Stage-1 optimizer: vmapped random-restart annealing on chi^2.

Re-implements the reference's per-walker "modified Gibbs sampler"
(``fit_spec``, ``mft6.py:856-1137``) as a single jitted program over all
walkers simultaneously (the reference forks one OS process per walker through
``mp.Pool(15)``, ``mft6.py:1744-1753``):

* every walker perturbs all parameters at once with Gaussian draws whose step
  sizes are coarse for the first half of the run and fine afterwards
  (``mft6.py:952-973``);
* a proposal is accepted iff its chi^2 (the x3-spectrum-weighted optimizer
  convention + chi^2-style priors, see :func:`optimizer_chi2`) improves; an
  accept in the first half restarts the step counter, one in the second half
  pins it just past the midpoint (``mft6.py:1053-1063``);
* out-of-bounds proposals are rejected and only burn the global attempt
  budget (the reference "reflects" them but then discards the reflected
  values — ``var_par`` is regenerated from ``gi`` on the next iteration, so
  reflection is effectively rejection; ``mft6.py:1070-1103``);
* every walker stops after ``steps`` consecutive non-improving in-bounds
  proposals or ``50*steps`` total attempts (``mft6.py:966``).

The whole schedule runs as one ``lax.scan`` of length ``50*steps`` with
per-walker active masks; finished walkers idle (their lanes are masked), which
matches the reference's ragged termination without dynamic shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcmc_spec_tpu.inference.batched import optimizer_chi2_batch
from mcmc_spec_tpu.inference.target import PackedTarget


class AnnealState(NamedTuple):
    params: jnp.ndarray  # [nw, ndim] current best per walker
    chi: jnp.ndarray  # [nw] current best chi^2
    n: jnp.ndarray  # [nw] consecutive non-improving counter
    total_n: jnp.ndarray  # [nw] total attempt counter
    key: jax.Array


def _step_sigmas(tgt: PackedTarget, p0: jnp.ndarray, fine: bool):
    """Per-walker step-size vector (mft6.py:952-973).

    Coarse: [250 K, 0.05 mag, 10% of initial radii, 2% of initial plx];
    fine (after steps/2): [20 K, 0.01, 5%, 0.5%] (triple: 1% plx).
    Radius/parallax fractions are of the walker's *initial* guess.
    """
    n = tgt.nspec
    t_sig = jnp.full((p0.shape[0], n), 20.0 if fine else 250.0)
    av_sig = jnp.full((p0.shape[0], 1), 0.01 if fine else 0.05)
    if tgt.fit_plx:
        rad = p0[:, n + 1 : 2 * n + 1]
        plx = p0[:, 2 * n + 1 : 2 * n + 2]
        rfrac = 0.05 if fine else 0.1
        if n == 2:
            dfrac = 0.005 if fine else 0.02
        else:
            dfrac = 0.01 if fine else 0.05
        return jnp.concatenate([t_sig, av_sig, rfrac * rad, dfrac * plx], axis=1)
    rad = p0[:, n + 1 :]
    rfrac = 0.05 if fine else 0.1
    return jnp.concatenate([t_sig, av_sig, rfrac * rad], axis=1)


def _in_bounds(tgt: PackedTarget, p: jnp.ndarray):
    """The annealer's proposal gate (mft6.py:981-982), batched over [nw, ndim].

    Note it differs slightly from the emcee prior bounds: plx in (1/3000,
    1/10), R1 in [0.05, 1.5], ratio in (0.05, 1), T within the grid, Av >= 0.
    """
    n = tgt.nspec
    teffs = p[:, :n]
    av = p[:, n]
    ok = jnp.all(teffs > tgt.tmin, axis=1) & jnp.all(teffs < tgt.tmax, axis=1) & (av >= 0)
    if tgt.fit_plx:
        r1 = p[:, n + 1]
        ratios = p[:, n + 2 : 2 * n + 1]
        plx = p[:, 2 * n + 1]
        ok &= (r1 >= 0.05) & (r1 <= 1.5)
        ok &= jnp.all((ratios > 0.05) & (ratios < 1.0), axis=1)
        ok &= (plx > 1.0 / 3000.0) & (plx < 0.1)
    else:
        ok &= jnp.all(p[:, n + 1 :] >= 0.05, axis=1)
    return ok


def _fix_triple_ratio(tgt: PackedTarget, p: jnp.ndarray):
    """r3 >= r2 or r3 < 0 -> r3 = 0.9*r2 (mft6.py:984-985), batched."""
    if tgt.nspec != 3 or not tgt.fit_plx:
        return p
    r2 = p[:, 5]
    r3 = p[:, 6]
    bad = (r3 >= r2) | (r3 < 0)
    return p.at[:, 6].set(jnp.where(bad, 0.9 * r2, r3))


@functools.partial(jax.jit, static_argnames=("steps", "record_thin"))
def run_anneal(
    tgt: PackedTarget,
    p0: jnp.ndarray,
    key: jax.Array,
    steps: int = 200,
    record_thin: int = 0,
):
    """Anneal all walkers; returns (params [nw,ndim], chi [nw], trace or None).

    ``record_thin > 0`` additionally emits every ``record_thin``-th
    (params, chi) snapshot for the optimizer-diagnostic plots
    (the reference's ``params{n}.txt``/``chisq{n}.txt`` traces).
    """
    chi_fn = lambda p, rs: optimizer_chi2_batch(p, tgt, rad_sigma=rs)
    return _anneal_scan(tgt, jnp.asarray(p0), key, steps, record_thin, chi_fn)


def _anneal_scan(tgt, p0, key, steps, record_thin, chi_fn):
    """The annealing schedule with a pluggable chi^2.

    ``chi_fn(p, rad_sigma) -> [nw]`` defaults to ``optimizer_chi2_batch``
    (:func:`run_anneal`); the spectral-sharded path
    (``parallel.spec_shard.run_anneal_spec_sharded``) threads a psum-reduced
    variant and calls this per walker shard inside ``shard_map`` — the
    walkers are fully independent, so the schedule itself needs no
    collectives.
    """
    nw, ndim = p0.shape
    max_iters = 50 * steps

    sig_coarse = _step_sigmas(tgt, p0, fine=False)
    sig_fine = _step_sigmas(tgt, p0, fine=True)

    rad_slice = (
        (slice(tgt.nspec + 1, 2 * tgt.nspec + 1)) if tgt.fit_plx else slice(tgt.nspec + 1, None)
    )

    # initial chi^2 uses the 5%-of-guess radius-prior sigma (mft6.py:918);
    # in-loop proposals use the current step sigmas (mft6.py:1042)
    chi0 = chi_fn(p0, None)
    state = AnnealState(
        params=p0,
        chi=chi0,
        n=jnp.zeros(nw, jnp.int32),
        total_n=jnp.zeros(nw, jnp.int32),
        key=key,
    )

    def step_fn(state: AnnealState, _):
        key, knoise = jax.random.split(state.key)
        active = (state.n < steps) & (state.total_n < max_iters)
        fine = state.n > steps // 2
        sig = jnp.where(fine[:, None], sig_fine, sig_coarse)

        noise = jax.random.normal(knoise, (nw, ndim), dtype=p0.dtype)
        proposal = state.params + noise * sig
        proposal = _fix_triple_ratio(tgt, proposal)
        ok = _in_bounds(tgt, proposal)

        chi_new = chi_fn(proposal, sig[:, rad_slice])
        better = ok & (chi_new < state.chi) & active

        params = jnp.where(better[:, None], proposal, state.params)
        chi = jnp.where(better, chi_new, state.chi)
        # counter bookkeeping (mft6.py:987-989,1053-1063)
        n_after = jnp.where(ok, state.n + 1, state.n)
        n_after = jnp.where(better, jnp.where(fine, steps // 2 + 1, 0), n_after)
        n = jnp.where(active, n_after, state.n)
        total_n = jnp.where(active, state.total_n + 1, state.total_n)

        new_state = AnnealState(params, chi, n, total_n, key)
        if record_thin:
            return new_state, (params, chi)
        return new_state, None

    if record_thin:
        # thinned recording: scan in chunks of record_thin, emit last of each
        n_chunks = max_iters // record_thin

        def outer(state, _):
            def inner(s, _):
                s, _ = step_fn(s, None)
                return s, None

            state, _ = jax.lax.scan(inner, state, None, length=record_thin)
            return state, (state.params, state.chi)

        state, trace = jax.lax.scan(outer, state, None, length=n_chunks)
        return state.params, state.chi, trace
    state, _ = jax.lax.scan(step_fn, state, None, length=max_iters)
    return state.params, state.chi, None


def init_walkers(tgt: PackedTarget, nwalk: int, plx: float, plx_err: float, key: jax.Array):
    """Random walker initialisation (``optimize_fit``, mft6.py:1712-1743).

    T1 ~ U(tmin,tmax); T2 ~ U(tmin,T1) (T3 ~ U(tmin,T2)); Av ~ U(0.1,0.5);
    R1 ~ U(0.05,1); ratio_k = U(0.05, prev)/prev; plx ~ |N(plx, plx_err)|.
    """
    n = tgt.nspec
    keys = jax.random.split(key, 8)
    tmin = tgt.tmin
    tmax = tgt.tmax
    t1 = jax.random.uniform(keys[0], (nwalk,), minval=tmin, maxval=tmax)
    cols = [t1]
    if n >= 2:
        t2 = jax.random.uniform(keys[1], (nwalk,), minval=tmin, maxval=t1)
        cols.append(t2)
    if n == 3:
        t3 = jax.random.uniform(keys[2], (nwalk,), minval=tmin, maxval=t2)
        cols.append(t3)
    av = jax.random.uniform(keys[3], (nwalk,), minval=0.1, maxval=0.5)
    cols.append(av)
    if tgt.fit_plx:
        rmin, rmax = 0.05, 1.0
        r1 = jax.random.uniform(keys[4], (nwalk,), minval=rmin, maxval=rmax)
        cols.append(r1)
        if n >= 2:
            r2 = jax.random.uniform(keys[5], (nwalk,), minval=rmin, maxval=r1)
            cols.append(r2 / r1)
        if n == 3:
            rr2 = r2 / r1
            r3 = jax.random.uniform(keys[6], (nwalk,), minval=rmin, maxval=rr2)
            cols.append(r3 / rr2)
        d = jnp.abs(plx + plx_err * jax.random.normal(keys[7], (nwalk,)))
        cols.append(d)
    else:
        ratio = jax.random.uniform(keys[4], (nwalk, n - 1), minval=0.05, maxval=1.0)
        cols.extend([ratio[:, k] for k in range(n - 1)])
    return jnp.stack(cols, axis=1)
