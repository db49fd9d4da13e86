"""Native corner plot: marginal + pairwise posterior panels.

Replaces the vendored/forked ``corner`` package the reference requires
(SURVEY.md 2.20): per-parameter title format strings are supported natively
(``quantile_title``), with the reference's styling defaults — 50 bins,
quantile lines at (16, 50, 84)%, filled 2-D contours, smoothing, and the
green ground-truth overlay for synthetic fixtures (``mft6.py:1554-1576``).
"""
from __future__ import annotations

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from mcmc_spec_tpu.report.corner_stats import quantile_title


def _smooth2d(H, sigma):
    if sigma <= 0:
        return H
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(H, sigma)


def corner_plot(
    samples: np.ndarray,
    labels: Sequence[str],
    title_fmts: Optional[Sequence[str]] = None,
    truths: Optional[Sequence[float]] = None,
    bins: int = 50,
    quantiles=(0.16, 0.5, 0.84),
    smooth: float = 0.75,
    out_path: Optional[str] = None,
):
    """Render a corner plot; returns the matplotlib figure."""
    samples = np.asarray(samples)
    ndim = samples.shape[1]
    if title_fmts is None:
        title_fmts = [".2f"] * ndim

    fig, axes = plt.subplots(ndim, ndim, figsize=(2.0 * ndim, 2.0 * ndim))
    if ndim == 1:
        axes = np.array([[axes]])

    lims = [np.percentile(samples[:, i], [0.5, 99.5]) for i in range(ndim)]

    for i in range(ndim):
        for j in range(ndim):
            ax = axes[i, j]
            if j > i:
                ax.axis("off")
                continue
            if i == j:
                x = samples[:, i]
                ax.hist(x, bins=bins, range=lims[i], histtype="step", color="k", lw=2)
                for q in quantiles:
                    ax.axvline(np.quantile(x, q), color="k", ls="--", lw=1)
                ax.set_title(quantile_title(x, labels[i], title_fmts[i]), fontsize=9)
                ax.set_yticks([])
                if truths is not None:
                    ax.axvline(truths[i], color="g")
            else:
                x, y = samples[:, j], samples[:, i]
                H, xe, ye = np.histogram2d(x, y, bins=bins, range=[lims[j], lims[i]])
                H = _smooth2d(H.T, smooth)
                # contour levels enclosing 0.5/1/1.5/2-sigma mass fractions
                flat = np.sort(H.ravel())[::-1]
                csum = np.cumsum(flat)
                csum /= csum[-1] if csum[-1] > 0 else 1.0
                fracs = 1.0 - np.exp(-0.5 * np.array([2.0, 1.5, 1.0, 0.5]) ** 2)
                levels = sorted(
                    {flat[min(np.searchsorted(csum, f), len(flat) - 1)] for f in fracs}
                )
                xc = 0.5 * (xe[1:] + xe[:-1])
                yc = 0.5 * (ye[1:] + ye[:-1])
                if len(levels) > 1:
                    ax.contourf(xc, yc, H, levels=levels + [H.max() * 1.01], cmap="Greys")
                    ax.contour(xc, yc, H, levels=levels, colors="k", linewidths=0.7)
                else:
                    ax.pcolormesh(xe, ye, H, cmap="Greys")
                if truths is not None:
                    ax.axvline(truths[j], color="g")
                    ax.axhline(truths[i], color="g")
                    ax.plot(truths[j], truths[i], "sg")
            if i < ndim - 1:
                ax.set_xticklabels([])
            else:
                ax.set_xlabel(labels[j], fontsize=11)
                ax.tick_params(axis="x", rotation=45, labelsize=8)
            if j > 0 or i == 0:
                ax.set_yticklabels([])
            else:
                ax.set_ylabel(labels[i], fontsize=11)
                ax.tick_params(axis="y", rotation=45, labelsize=8)

    fig.subplots_adjust(hspace=0.08, wspace=0.08, top=0.95, right=0.98)
    if out_path:
        fig.savefig(out_path)
        plt.close(fig)
    return fig
