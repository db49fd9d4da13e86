"""Runtime feature flags (env-overridable).

``MCMC_SPEC_SPECTRUM_KERNEL``: ``auto`` (Pallas on TPU f32, XLA otherwise),
``pallas`` (force), or ``xla`` (force fallback).
"""
from __future__ import annotations

import os


def spectrum_kernel_mode() -> str:
    mode = os.environ.get("MCMC_SPEC_SPECTRUM_KERNEL", "auto").lower()
    if mode not in ("auto", "pallas", "xla"):
        raise ValueError(f"bad MCMC_SPEC_SPECTRUM_KERNEL={mode!r}")
    return mode


def use_pallas_spectrum(dtype) -> bool:
    import jax
    import jax.numpy as jnp

    mode = spectrum_kernel_mode()
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32


def _fused_eval_mode() -> str:
    """Parse ``MCMC_SPEC_FUSED_EVAL`` once, for BOTH the single-target and
    fleet gates (the round-2 fleet gate accepted a narrower value set, so
    ``pallas`` silently enabled fusion only for single-target evals)."""
    mode = os.environ.get("MCMC_SPEC_FUSED_EVAL", "auto").lower()
    if mode in ("1", "force", "pallas"):
        return "force"
    if mode in ("0", "off", "xla"):
        return "off"
    if mode != "auto":
        raise ValueError(f"bad MCMC_SPEC_FUSED_EVAL={mode!r}")
    return "auto"


def use_fused_eval(dtype) -> bool:
    """Whole-posterior fused Pallas kernel (``ops.pallas_kernels.log_posterior_fused``).

    ``MCMC_SPEC_FUSED_EVAL``: ``auto`` (on when the Pallas spectrum kernel
    would be used), ``1``/``force``/``pallas`` (always), ``0``/``off``/``xla``
    (never).
    """
    mode = _fused_eval_mode()
    if mode == "force":
        return True
    if mode == "off":
        return False
    return spectrum_kernel_mode() != "xla" and use_pallas_spectrum(dtype)


def fused_eval_forced() -> bool:
    """True when the fused kernel is explicitly forced on (the fleet path is
    opt-in: fusion there measured ~8% slower than the composition)."""
    return _fused_eval_mode() == "force"


def median_iters() -> int:
    """Radix-median pass count: DEFAULT 14 (fast), 31 = exact.

    ``MCMC_SPEC_FAST_MEDIAN`` is an accuracy dial: any integer in [8, 31]
    selects that pass count (``31``/``exact`` = np.median-identical; ``1``
    is a legacy alias for 20).  14 passes is the production default since
    round 4, adopted on the STRUCTURAL tempering bound: on the emcee
    (renorm) path a relative median error eps is exactly a (1+eps)^-2
    reweighting of the spectrum chi^2 (the alpha^2 factorization, PARITY.md,
    pinned bit-for-bit by ``TestAlphaSquaredFactorization``), and the
    Cauchy-Schwarz posterior-shift bound std(dL) measured over an
    equilibrated production ensemble is 0.027 sigma at 14 passes
    (0.0068 @ 16, 0.107 @ 12 — scripts/median_tempering_bound_cpu.py,
    RESULTS.md round-4 decision table); the round-3 identical-RNG fixture
    fit independently measured <= 0.007 sigma at 14.  The ANNEALER's
    renorm=False scoring has no such factorization and always uses the
    exact median regardless of this dial (``optimizer_chi2_batch``).
    Fast modes return the MIDPOINT of the remaining rank-search interval
    (halved, sign-free error).  Resolved ONCE at target-pack time
    (``pack_target`` -> ``PackedTarget.median_iters``) and threaded into
    the kernels as a static argument, so flipping the env var mid-process
    takes effect on the next pack, not silently never (the round-2 footgun:
    the kernels read the env at trace time and the jit cache is keyed only
    on shapes).
    """
    raw = os.environ.get("MCMC_SPEC_FAST_MEDIAN", "")
    if not raw:
        return 14
    if raw.lower() == "exact":
        return 31
    n = int(raw)
    if n == 1:
        return 20
    if not 8 <= n <= 31:
        raise ValueError(f"MCMC_SPEC_FAST_MEDIAN={raw!r}: use 'exact', 1, or 8..31")
    return n


def recip_newton() -> int:
    """Newton steps of the in-kernel magic-seed reciprocal: DEFAULT 2.

    The spectrum continuum renorm divides twice per [walkers, nd] element
    (``frac = data/model``, ``data_renorm = data/fitted``).  Mosaic's
    ``arith.divf`` lowering measured ~4.5-8% of the whole spectrum kernel;
    replacing both divides with the classic integer-magic reciprocal seed
    (``bitcast(0x7EF311C3 - bitcast(x))``) plus 2 Newton steps is
    consistently faster and changes chi^2 by <= 8.6e-6 relative
    (scripts/try_fast_recip.py) — ~30x below the accepted bf16x3 matmul
    envelope, so 2-Newton is the production default.
    ``MCMC_SPEC_FAST_RECIP=exact`` (or ``0``) restores true divides (the
    parity suites pin it); ``1``/``3`` select other Newton depths (1 is
    ~2.7e-3 relative and measured NO faster than 2 — diagnostic only).
    Resolved at pack time (``PackedTarget.recip_newton``; -1 = unset).
    """
    raw = os.environ.get("MCMC_SPEC_FAST_RECIP", "")
    if not raw:
        return 2
    if raw.lower() == "exact":
        return 0
    n = int(raw)
    if not 0 <= n <= 3:
        raise ValueError(f"MCMC_SPEC_FAST_RECIP={raw!r}: use 'exact' or 0..3")
    return n


def eval_block() -> int:
    """Fused-kernel walker block size (``MCMC_SPEC_EVAL_BLOCK``, default 256).

    Resolved at target-pack time like :func:`median_iters` (same footgun).
    The kernels still clamp to the measured VMEM caps per data width.
    """
    return int(os.environ.get("MCMC_SPEC_EVAL_BLOCK", "256"))


def matmul_passes() -> int:
    """bf16 pass count of the in-kernel f32-accurate MXU matmul: 3 or 6.

    Mosaic lowers f32 matmuls to single-pass bf16 (~2.5e-3 relative — far
    too coarse), so the kernels emulate f32 with split-bf16 passes.  The
    full bf16x6 scheme is ~2.5e-7 relative; dropping the three O(eps^2)
    cross terms (bf16x3) is ~3e-4 relative on the log-posterior and was
    measured at <= 0.006 sigma end-to-end posterior impact
    (scripts/matmul_passes_impact.py) for ~+9% eval throughput — the
    production default since round 3.  ``MCMC_SPEC_MATMUL_PASSES=6`` (or
    ``exact``) restores the full scheme (the parity suites pin it).
    Resolved at pack time (``PackedTarget.matmul_passes``).
    """
    raw = os.environ.get("MCMC_SPEC_MATMUL_PASSES", "")
    if not raw:
        return 3
    if raw.lower() == "exact":
        return 6
    n = int(raw)
    if n not in (1, 3, 6):
        raise ValueError(f"MCMC_SPEC_MATMUL_PASSES={raw!r}: use 3, 6, or 'exact'")
    return n


def enable_persistent_compile_cache(path: str = None) -> "str | None":
    """Turn on JAX's persistent compilation cache (``MCMC_SPEC_COMPILE_CACHE``).

    Production fits are compile-dominated through the remote-compile tunnel
    (the measured koi2298 run spent most of its 18 min in first-time
    compiles, benchmarks/RESULTS.md); the persistent cache makes every
    repeat run of the same shapes skip them entirely.  Values:
    unset/``1``/``auto`` — cache under ``~/.cache/mcmc_spec_tpu/xla``;
    ``0``/``off`` — disabled; anything else — used as the cache directory.
    Returns the cache dir, or None when disabled/unsupported.  Idempotent;
    called by the CLI before the first dispatch.  (JAX's own
    ``JAX_COMPILATION_CACHE_DIR`` env var works too — this flag just gives
    the framework a default-on path with one switch.)
    """
    raw = os.environ.get("MCMC_SPEC_COMPILE_CACHE", "auto")
    if raw.lower() in ("0", "off", ""):
        return None
    if path is None:
        path = (raw if raw.lower() not in ("1", "auto")
                else os.path.join(os.path.expanduser("~"), ".cache",
                                  "mcmc_spec_tpu", "xla"))
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # trivial host-callback programs churn the cache for no win; the
        # spectrum/sampler programs all compile in >> 1 s over the tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError, ValueError) as e:
        print(f"[cache] persistent compilation cache unavailable: {e}")
        return None
    return path
