"""Line-of-sight extinction prior profile Av(distance).

The reference queries the Bayestar2019 3-D dust map through ``dustmaps`` *on
every posterior evaluation* (``mft6.py:1233-1239``): it builds a SkyCoord at
the walker's current distance, draws map samples, and uses their mean/std as a
Gaussian prior on Av (with a 0.05 mag sigma floor).  That host round-trip is
the single worst TPU hazard in the pipeline.

Here the map is queried ONCE per target over a log-spaced distance grid at
init (when ``dustmaps`` is importable), or replaced by a constant/user profile,
and the per-step prior is a uniform-grid interpolation on device — numerically
equivalent because Bayestar's line-of-sight Av is piecewise-smooth in distance.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

SIGMA_FLOOR = 0.05  # mag, reference mft6.py:1237-1238
BAYESTAR_TO_AV = 3.1 * 0.884  # reference mft6.py:1234


@dataclasses.dataclass
class AvProfile:
    """Gaussian Av prior vs distance, tabulated on a log-distance grid."""

    dist_pc: np.ndarray  # [n] sorted distances (pc)
    av_mu: np.ndarray  # [n]
    av_sig: np.ndarray  # [n] (floored)

    def __post_init__(self):
        self.dist_pc = np.asarray(self.dist_pc, dtype=np.float64)
        self.av_mu = np.asarray(self.av_mu, dtype=np.float64)
        sig = np.asarray(self.av_sig, dtype=np.float64)
        self.av_sig = np.where(sig == 0.0, SIGMA_FLOOR, sig)

    @classmethod
    def constant(cls, av_mu: float, av_sig: float = SIGMA_FLOOR) -> "AvProfile":
        """Distance-independent prior (fallback when no dust map is available)."""
        d = np.array([1.0, 30000.0])
        return cls(d, np.full(2, av_mu), np.full(2, max(av_sig, SIGMA_FLOOR)))

    @classmethod
    def from_bayestar(cls, ra_deg: float, dec_deg: float, d_min=4.0, d_max=3000.0, n=256):
        """Query Bayestar2019 once over a log-distance grid (needs ``dustmaps``)."""
        from astropy import units as u  # pragma: no cover - optional deps
        from astropy.coordinates import SkyCoord  # pragma: no cover
        from dustmaps.bayestar import BayestarQuery  # pragma: no cover

        bayestar = BayestarQuery(version="bayestar2019")  # pragma: no cover
        dists = np.geomspace(d_min, d_max, n)  # pragma: no cover
        mus, sigs = [], []  # pragma: no cover
        for d in dists:  # pragma: no cover
            pos = SkyCoord(ra_deg * u.deg, dec_deg * u.deg, distance=d * u.pc)
            samples = bayestar(pos, mode="samples") * BAYESTAR_TO_AV
            mus.append(np.mean(samples))
            sigs.append(np.std(samples))
        return cls(dists, np.asarray(mus), np.asarray(sigs))  # pragma: no cover

    @classmethod
    def for_target(cls, ra_deg, dec_deg, av_fallback, av_err_fallback=SIGMA_FLOOR):
        """Bayestar profile when available, else a constant prior from the config."""
        try:
            return cls.from_bayestar(ra_deg, dec_deg)
        except Exception:
            return cls.constant(av_fallback, av_err_fallback)

    @classmethod
    def from_table(cls, path: str) -> "AvProfile":
        d, mu, sig = np.loadtxt(path, unpack=True)
        return cls(d, mu, sig)

    # ------------------------------------------------------------- device form
    def device_nodes(self, dtype=jnp.float32):
        """(log_d_nodes, mu_nodes, sig_nodes) for gather-free tent interp."""
        return (
            jnp.asarray(np.log(self.dist_pc), dtype=dtype),
            jnp.asarray(self.av_mu, dtype=dtype),
            jnp.asarray(self.av_sig, dtype=dtype),
        )

    def device_tables(self, n=256, dtype=jnp.float32):
        """(log_d_lo, log_d_step, mu_tab, sig_tab) on a uniform log-distance grid."""
        log_d = np.log(self.dist_pc)
        lo, hi = float(log_d.min()), float(log_d.max())
        step = (hi - lo) / (n - 1) if hi > lo else 1.0
        grid = lo + step * np.arange(n)
        mu = np.interp(grid, log_d, self.av_mu)
        sig = np.interp(grid, log_d, self.av_sig)
        return (
            jnp.asarray(lo, dtype=dtype),
            jnp.asarray(step, dtype=dtype),
            jnp.asarray(mu, dtype=dtype),
            jnp.asarray(sig, dtype=dtype),
        )
