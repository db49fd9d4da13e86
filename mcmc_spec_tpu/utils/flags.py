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


def use_fused_eval(dtype) -> bool:
    """Whole-posterior fused Pallas kernel (``ops.pallas_kernels.log_posterior_fused``).

    ``MCMC_SPEC_FUSED_EVAL``: ``auto`` (on when the Pallas spectrum kernel
    would be used), ``1``/``force`` (always), ``0``/``off`` (never).
    """
    mode = os.environ.get("MCMC_SPEC_FUSED_EVAL", "auto").lower()
    if mode in ("1", "force", "pallas"):
        return True
    if mode in ("0", "off", "xla"):
        return False
    if mode != "auto":
        raise ValueError(f"bad MCMC_SPEC_FUSED_EVAL={mode!r}")
    return spectrum_kernel_mode() != "xla" and use_pallas_spectrum(dtype)
