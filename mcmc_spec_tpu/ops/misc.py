"""Small utility ops from the reference's toolbox."""
from __future__ import annotations

import jax.numpy as jnp

C_KMS = 3e5  # the reference uses 3e5 km/s (mft6.py:44)


def bccorr(wl, bcvel_kms, radvel_kms):
    """Barycentric/radial velocity wavelength correction (mft6.py:32-44).

    ``wl * (1 + (bcvel - radvel)/c)`` with c = 3e5 km/s as in the reference.
    """
    return jnp.asarray(wl) * (1.0 + (bcvel_kms - radvel_kms) / C_KMS)


def find_nearest(array, value):
    """Index of the array element closest to ``value`` (mft6.py:100-113)."""
    array = jnp.asarray(array)
    return jnp.argmin(jnp.abs(array - value))
