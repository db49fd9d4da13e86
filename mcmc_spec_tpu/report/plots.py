"""Report rendering: every artifact of the reference's reporting layer.

Produces the reference's output set (``plot_fit`` mft6.py:1767-1902,
``run_emcee`` corner block 1533-1682, ``plot_results``/``plot_results3``
2017-3449) under ``{dirname}/plots/``:

    {fname}_corner.pdf            bimodal_test_{T1,T2,R1,R2R1}.pdf
    fit_res_{param}.png           bestfit_spec.pdf
    {fname}_phot_scatter.pdf      {fname}_all_spec.pdf
    bestfit_spec_post_mcmc.pdf    {fname}_delta_kep.pdf
    {fname}_{pri,sec}_corr.pdf    {fname}_isochrone.pdf
    {primary,secondary}_{mass,lum}_posterior.pdf

plus the text artifacts ``params.txt``, ``kep_contrast.txt``, ``gaia_pri.txt``,
``gaia_sec.txt``, ``pri_corr.txt``, ``sec_corr.txt`` (+``tri_corr.txt``), and
``{primary,secondary}_{mass,lum}_posterior.txt``.

Heavy posterior blocks (Kepler/Gaia contrasts over 2000 draws, 100 spectrum
draws) use the vectorized packed-grid paths instead of per-draw forward
evaluations.
"""
from __future__ import annotations

import os
from glob import glob

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from mcmc_spec_tpu.inference.posterior import forward_summary
from mcmc_spec_tpu.models.mist import LSUN, SIGMA_SB
from mcmc_spec_tpu.ops.extinction import ccm89
from mcmc_spec_tpu.report.composite import band_mag_posteriors, composite_full
from mcmc_spec_tpu.report.corner_plot import corner_plot
from mcmc_spec_tpu.report.corner_stats import bimodal_decompose

# SDSS riz + 2MASS JHKs zero fluxes / central wavelengths / half-widths used by
# the reference's SED panel (mft6.py:2226-2228; published filter constants)
SED_ZP = [2.854074834606756e-09, 1.940259205607388e-09, 1.359859453789013e-09,
          3.1121838042516567e-10, 1.1353317746392182e-10, 4.279017715611946e-11]
SED_CWL = [6175.0, 7489.0, 8946.0, 12350.0, 16620.0, 21590.0]
SED_WIDTH = np.array([[6175 - 5415, 6989 - 6175], [7489 - 6689, 8389 - 7489],
                      [8946 - 7960, 10833 - 8946], [12350 - 10806, 14067 - 12350],
                      [16620 - 14787, 18231 - 16620], [21590 - 19543, 23552 - 21590]]).T


def _labels_formats(nspec, dist_fit):
    if nspec == 2:
        labels = [r"T$_{eff,1}$", r"T$_{eff,2}$", r"$A_{V}$", r"R$_{1}$",
                  r"R$_{2}$/R$_{1}$", r"$\pi$ (mas)"]
        fmts = [".0f", ".0f", ".2f", ".2f", ".2f", ".2f"]
    else:
        labels = [r"T$_{eff,1}$", r"T$_{eff,2}$", r"T$_{eff,3}$", r"$A_{V}$",
                  r"R$_{1}$", r"R$_{2}$/R$_{1}$", r"R$_{3}$/R$_{1}$", r"$\pi$"]
        fmts = [".0f", ".0f", ".0f", ".2f", ".2f", ".2f", ".2f", ".2f"]
    if not dist_fit and nspec == 2:
        labels, fmts = labels[:-1], fmts[:-1]
    return labels, fmts


def plot_corner(ctx, samples):
    """Corner plot with mas-scaled parallax and truth overlay (mft6.py:1533-1682)."""
    cfg = ctx.cfg
    samples = np.asarray(samples).copy()
    ndim = samples.shape[1]
    if ndim == 4:
        # no-parallax vector layout (reference run_emcee else-branch, :1661-1682)
        labels = [r"T$_{eff,1}$", r"T$_{eff,2}$", r"$A_{V}$", r"R$_{2}$/R$_{1}$"]
        fmts = [".0f", ".0f", ".2f", ".2f"]
        out = os.path.join(cfg.dirname, "plots", f"{cfg.fname}_corner.pdf")
        rv = cfg.real_values_or_zero()
        truths = rv[:4].astype(float) if np.any(rv != 0) else None
        corner_plot(samples, labels, fmts, truths=truths, out_path=out)
        return
    if ndim in (6, 8):
        samples[:, -1] *= 1e3  # plx -> mas
    labels, fmts = _labels_formats(cfg.nspec, cfg.dist_fit)
    if not cfg.dist_fit and ndim == 6:
        samples = samples[:, :-1]
    truths = None
    rv = cfg.real_values_or_zero()
    if np.any(rv != 0):
        truths = rv[: samples.shape[1]].astype(float).copy()
        if ndim in (6, 8) and cfg.dist_fit:
            truths[-1] *= 1e3
    out = os.path.join(cfg.dirname, "plots", f"{cfg.fname}_corner.pdf")
    corner_plot(samples, labels, fmts, truths=truths, out_path=out)


def plot_fit(ctx):
    """Optimizer diagnostics: per-parameter chain traces + best-fit spectrum.

    The reference reads back its ``params{n}.txt`` trace files
    (mft6.py:1767-1902); we do the same so the artifacts stay compatible.
    """
    cfg = ctx.cfg
    run = cfg.dirname
    fit_plx = bool(getattr(ctx.target, "fit_plx", True))
    if cfg.nspec == 2:
        labels = (["teff1", "teff2", "Av", "rad1", "rad2", "dist"] if fit_plx
                  else ["teff1", "teff2", "Av", "rad2"])
    else:
        labels = (["teff1", "teff2", "teff3", "Av", "rad1", "rad2", "rad3", "dist"]
                  if fit_plx else ["teff1", "teff2", "teff3", "Av", "rad2", "rad3"])

    # numbered per-walker traces only: a bare "params*" glob also matches
    # the FINAL params.txt summary (written by plot_results), which made
    # re-running the report over a completed directory crash on its
    # mixed-column text
    walk_files = sorted(glob(os.path.join(run, "params[0-9]*txt")))
    figs_axes = [plt.subplots() for _ in labels]
    for f in walk_files:
        res = np.atleast_2d(np.genfromtxt(f))
        for i, (fig, ax) in enumerate(figs_axes):
            if i < res.shape[1]:
                ax.plot(range(len(res)), res[:, i], color="k", alpha=0.5)
    for i, (fig, ax) in enumerate(figs_axes):
        ax.set_xlabel("Step number", fontsize=13)
        ax.set_ylabel(labels[i], fontsize=13)
        fig.tight_layout()
        fig.savefig(os.path.join(run, "plots", f"fit_res_{labels[i]}.png"))
        plt.close(fig)

    # best-fit composite vs data (mft6.py:1856-1901)
    from mcmc_spec_tpu.io.results import read_optimize_results

    chis, pars = read_optimize_results(run)
    best = pars[np.argmin(chis)]
    wl_um = ctx.data_wl_um
    w, spe, _ = composite_full(ctx.grid, ctx.mist, best, cfg.nspec, fit_plx=fit_plx)
    av = best[cfg.nspec]
    spe = spe * 10 ** (-0.4 * np.asarray(ccm89(w, av)))
    model = np.interp(wl_um * 1e4, w, spe)
    model *= np.median(ctx.data_flux) / np.median(model)

    plt.figure()
    plt.plot(wl_um * 1e4, ctx.data_flux, color="navy", lw=1, label="data")
    plt.plot(wl_um * 1e4, model, color="xkcd:sky blue", lw=1,
             label=f"model: {best[0]:.0f} + {best[1]:.0f}; Av={av:.2f}")
    plt.xlabel("Wavelength (A)", fontsize=13)
    plt.ylabel("Normalized flux", fontsize=13)
    plt.legend(loc="best", fontsize=13)
    plt.tight_layout()
    plt.savefig(os.path.join(run, "plots", "bestfit_spec.pdf"))
    plt.close()


def plot_results(ctx, samples, n_spec_draws=100, n_kep_draws=2000, rng_seed=0):
    """Posterior reporting (mft6.py:2017-3449, binary and triple)."""
    cfg = ctx.cfg
    run = cfg.dirname
    fname = cfg.fname
    nspec = cfg.nspec
    samples = np.asarray(samples)
    rng = np.random.RandomState(rng_seed)
    med = np.median(samples, axis=0)

    # parameter-vector layout: [T_1..n, Av, R1, ratios, plx] with fit_plx,
    # [T_1..n, Av, ratios] without (posterior.py module docstring)
    fit_plx = bool(getattr(ctx.target, "fit_plx", True))
    ratio_col = nspec + 2 if fit_plx else nspec + 1  # first ratio (R2/R1)

    # ---------------- bimodal decompositions (mft6.py:2029-2194)
    if nspec == 2:
        bim_cols = ({0: "T1", 1: "T2", 3: "R1", 4: "R2R1"} if fit_plx
                    else {0: "T1", 1: "T2", 3: "R2R1"})
    else:
        bim_cols = ({0: "T1", 1: "T2", 2: "T3", 4: "R1", 5: "R2", 6: "R3"}
                    if fit_plx else {0: "T1", 1: "T2", 2: "T3", 4: "R2", 5: "R3"})
    point, sigma = med.copy(), np.zeros(len(med))
    for col, tag in bim_cols.items():
        mu, sig, diag = bimodal_decompose(samples[:, col])
        if sig > 0:
            point[col], sigma[col] = mu, sig
            _plot_bimodal(samples[:, col], diag, os.path.join(run, "plots",
                                                              f"bimodal_test_{tag}.pdf"))

    # ---------------- median-parameter forward pieces
    import jax.numpy as jnp

    summ = {k: np.asarray(v) for k, v in
            forward_summary(jnp.asarray(med, dtype=ctx.target.data_flux.dtype),
                            ctx.target).items()}
    w_full, comp_full, comps_full = composite_full(ctx.grid, ctx.mist, med, nspec,
                                                   fit_plx=fit_plx)
    av = med[nspec]
    ext_full = 10 ** (-0.4 * np.asarray(ccm89(w_full, av)))

    # ---------------- phot_scatter (mft6.py:2216-2317)
    _plot_phot_scatter(ctx, med, summ, w_full, comp_full, comps_full, ext_full)

    # ---------------- all_spec + residuals (mft6.py:2319-2438)
    _plot_all_spec(ctx, med, samples[rng.choice(len(samples),
                                                size=min(n_spec_draws, len(samples)),
                                                replace=False)],
                   w_full, comp_full, comps_full, ext_full, fit_plx=fit_plx)

    # ---------------- zoomed best-fit (mft6.py:2461-2479)
    _plot_zoom(ctx, w_full, comp_full * ext_full)

    # ---------------- Kepler/Gaia posteriors (mft6.py:2486-2541), vectorized
    kep_sample = samples[rng.choice(len(samples), size=min(n_kep_draws, len(samples)),
                                    replace=False)]
    kep_curve = ctx.bank.curve("kepler")
    gaia_curve = ctx.bank.curve("gaia,g")
    gaia_zp = ctx.bank.vega_zero_flux("Gaia_G", gaia_curve)
    mags = band_mag_posteriors(
        ctx.grid, ctx.mist, kep_sample, [kep_curve, gaia_curve], ["trapz", "photon"],
        [1.0, gaia_zp], nspec=nspec, fit_plx=fit_plx,
    )  # [n, 2, nspec]
    kep_contrast = mags[:, 0, 1] - mags[:, 0, 0]
    gaia_pri = mags[:, 1, 0]
    gaia_sec = mags[:, 1, 1]
    np.savetxt(os.path.join(run, "kep_contrast.txt"), kep_contrast)
    np.savetxt(os.path.join(run, "gaia_pri.txt"), gaia_pri)
    np.savetxt(os.path.join(run, "gaia_sec.txt"), gaia_sec)
    _plot_posterior_hist(kep_contrast, r"$\Delta$Kep (mag)", r"$\Delta$Kep",
                         os.path.join(run, "plots", f"{fname}_delta_kep.pdf"))
    if nspec == 3:
        kep_contrast_tri = mags[:, 0, 2] - mags[:, 0, 0]
        np.savetxt(os.path.join(run, "kep_contrast_tri.txt"), kep_contrast_tri)
        _plot_posterior_hist(kep_contrast_tri, r"$\Delta$Kep tri (mag)", r"$\Delta$Kep,3",
                             os.path.join(run, "plots", f"{fname}_delta_kep_tri.pdf"))

    # ---------------- Furlan+2017 correction factors (mft6.py:2544-2593)
    kep_rad = kep_sample[:, ratio_col]
    pri_corr = np.sqrt(1 + 10 ** (-0.4 * kep_contrast))
    sec_corr = kep_rad * np.sqrt(1 + 10 ** (0.4 * kep_contrast))
    np.savetxt(os.path.join(run, "pri_corr.txt"), pri_corr)
    np.savetxt(os.path.join(run, "sec_corr.txt"), sec_corr)
    _plot_posterior_hist(pri_corr, "Corr. factor (primary)", r"$f_{p,corr}$",
                         os.path.join(run, "plots", f"{fname}_pri_corr.pdf"), fmt=".4f")
    _plot_posterior_hist(sec_corr, "Corr. factor (secondary)", r"$f_{s,corr}$",
                         os.path.join(run, "plots", f"{fname}_sec_corr.pdf"))
    if nspec == 3:
        tri_rad = kep_sample[:, ratio_col + 1]
        tri_corr = tri_rad * np.sqrt(1 + 10 ** (0.4 * kep_contrast_tri))
        np.savetxt(os.path.join(run, "tri_corr.txt"), tri_corr)
        _plot_posterior_hist(tri_corr, "Corr. factor (tertiary)", r"$f_{t,corr}$",
                             os.path.join(run, "plots", f"{fname}_tri_corr.pdf"))

    # ---------------- params.txt (mft6.py:2356-2360 binary, 3071-3075 triple)
    # the reference keys the long variant on dist_fit (absolute radii are only
    # physical with a distance); the short variant reports the radius ratio(s)
    kep_med = np.median(mags[:, 0, :], axis=0)
    full = fit_plx and cfg.dist_fit
    with open(os.path.join(run, "params.txt"), "w") as f:
        if nspec == 2 and full:
            f.write(
                "teff: {} +/- {} + {} +/- {}\nradius: {} +/- {} + {} +/- {}\n"
                "extinction: {}\nparallax: {}\nprimary Kep mag:{}\nsecondary Kep mag:{}".format(
                    point[0], sigma[0], point[1], sigma[1], point[3], sigma[3],
                    point[4], sigma[4], med[2], med[5], kep_med[0], kep_med[1]
                )
            )
        elif nspec == 2:
            f.write(
                "teff: {} +/- {} + {} +/- {}\nradius: {} +/- {}\nextinction: {}\n"
                "primary Kep mag:{}\nsecondary Kep mag:{}".format(
                    point[0], sigma[0], point[1], sigma[1],
                    point[ratio_col], sigma[ratio_col],
                    med[2], kep_med[0], kep_med[1]
                )
            )
        elif full:
            # triple with parallax (mft6.py:3073-3074)
            f.write(
                "teff: {} +/- {} + {} +/- {} + {} +/- {}\n"
                "radius: {} +/- {} + {} +/- {} + {} +/- {}\n"
                "extinction: {}\nparallax: {}\n"
                "primary Kep mag:{}\nsecondary Kep mag:{}\ntertiary Kep mag:{}".format(
                    point[0], sigma[0], point[1], sigma[1], point[2], sigma[2],
                    point[4], sigma[4], point[5], sigma[5], point[6], sigma[6],
                    med[3], med[7], kep_med[0], kep_med[1], kep_med[2]
                )
            )
        else:
            f.write(
                "teff: {} +/- {} + {} +/- {} + {} +/- {}\nradius: {} +/- {} + {} +/- {}\n"
                "extinction: {}\nprimary Kep mag:{}\nsecondary Kep mag:{}\n"
                "tertiary Kep mag:{}".format(
                    point[0], sigma[0], point[1], sigma[1], point[2], sigma[2],
                    point[ratio_col], sigma[ratio_col],
                    point[ratio_col + 1], sigma[ratio_col + 1],
                    med[3], kep_med[0], kep_med[1], kep_med[2]
                )
            )

    # ---------------- isochrone plot + mass/lum posteriors (mft6.py:2595-2721)
    _plot_isochrone(ctx, med, os.path.join(run, "plots", f"{fname}_isochrone.pdf"),
                    fit_plx=fit_plx)
    _mass_lum_posteriors(ctx, kep_sample, run)


def plot_results3(ctx, samples, **kw):
    """Triple-star reporting — same artifact set via the shared implementation."""
    return plot_results(ctx, samples, **kw)


# --------------------------------------------------------------------- helpers
def _plot_bimodal(x, diag, out):
    plt.figure()
    plt.hist(x, bins=diag["bins"])
    plt.axvline(diag["bins"][diag["localmin"]], color="k", lw=2)
    from mcmc_spec_tpu.report.corner_stats import bimodal, gauss

    plt.plot(diag["bins"], diag["count"])
    plt.plot(diag["bins"], bimodal(diag["bins"], *diag["fit"]), color="b")
    plt.plot(diag["bins"], gauss(diag["bins"], *diag["fit"][:3]))
    plt.plot(diag["bins"], gauss(diag["bins"], *diag["fit"][3:]))
    plt.savefig(out)
    plt.close()


def _plot_posterior_hist(x, xlabel, tlabel, out, fmt=".3f"):
    q16, q50, q84 = np.percentile(x, [16, 50, 84])
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.hist(x, histtype="step", lw=2, color="k")
    for v, ls in [(q84, "--"), (q16, "--"), (q50, "-")]:
        ax.axvline(abs(v), linestyle=ls, color="k", lw=2)
    ax.set_title(rf"{tlabel} = {abs(q50):{fmt}}$^{{+{q84 - q50:{fmt}}}}_{{-{q50 - q16:{fmt}}}}$")
    ax.set_xlabel(xlabel)
    plt.tight_layout()
    plt.savefig(out)
    plt.close(fig)


def _plot_phot_scatter(ctx, med, summ, w_full, comp_full, comps_full, ext_full):
    cfg = ctx.cfg
    if not cfg.dist_fit:
        return _plot_contrast_scatter(ctx, summ)  # 2-panel variant (mft6.py:2284-2317)
    phot_model = summ["phot_mags"]
    contrasts = summ["contrasts"]
    n = len(phot_model)
    zp, cwl = np.array(SED_ZP[:n]), np.array(SED_CWL[:n])
    widths = SED_WIDTH[:, :n]
    cwl_contrast = [c.cwl for c in ctx.bank.contrast_curves(cfg.cfilt)]

    fig, ax = plt.subplots(nrows=3, gridspec_kw=dict(hspace=0, height_ratios=[3, 1.75, 1]),
                           sharex=True, figsize=(7, 6))
    ax[0].scatter(cwl, 10 ** (-0.4 * phot_model) * zp, color="seagreen", s=100, marker=".",
                  label="Composite phot.")
    ax[0].errorbar(cwl, 10 ** (-0.4 * phot_model) * zp, xerr=widths, color="seagreen",
                   zorder=0, ls="None")
    ax[0].scatter(cwl, 10 ** (-0.4 * np.asarray(ctx.phot_vega)) * zp, color="k", marker=".",
                  s=100, label="Data phot.")
    sm_wl, sm_sp = _decimate(w_full, comp_full * ext_full)
    ax[0].plot(sm_wl, sm_sp, color="seagreen", lw=1, zorder=0, alpha=0.5)
    ax[0].set_xscale("log")
    ax[0].set_yscale("log")
    ax[0].set_ylabel(r"Flux (erg s$^{-1}$ cm$^{-2}$ $\AA^{-1}$)", fontsize=12)

    ax[1].scatter(cwl_contrast, contrasts, color="blue", marker="v", label="Model contrast",
                  zorder=2)
    ax[1].errorbar(cwl_contrast, cfg.cmag, yerr=cfg.cerr, ls="None", capsize=4, capthick=2,
                   color="k", marker="v", zorder=1)
    if len(comps_full) >= 2:
        _, pri_sm = _decimate(w_full, comps_full[0])
        _, sec_sm = _decimate(w_full, comps_full[1])
        good = (pri_sm > 0) & (sec_sm > 0)
        ax[1].plot(sm_wl[good], 2.5 * np.log10(pri_sm[good]) - 2.5 * np.log10(sec_sm[good]),
                   color="blue", lw=1, zorder=0, alpha=0.5)
    ax[1].set_ylabel(r"$\Delta$ mag", fontsize=12)

    ax[2].scatter(cwl, phot_model - np.asarray(ctx.phot_vega)[:n], color="seagreen",
                  marker="x", s=50, label="Phot. resid.")
    ax[2].axhline(0, color="0.3", ls="--", lw=2)
    ax[2].scatter(cwl_contrast, np.asarray(cfg.cmag) - contrasts, color="blue", marker="x",
                  s=50, label="Cont. resid.")
    ax[2].set_xlabel(r"Wavelength ($\AA$)", fontsize=12)
    ax[2].set_ylabel("Resid. (mag)", fontsize=12)
    ax[0].legend(loc="best", fontsize=10, ncol=2)
    plt.tight_layout()
    plt.savefig(os.path.join(cfg.dirname, "plots", f"{cfg.fname}_phot_scatter.pdf"))
    plt.close(fig)


def _plot_contrast_scatter(ctx, summ):
    """Contrast-only 2-panel scatter for no-distance fits (mft6.py:2284-2317)."""
    cfg = ctx.cfg
    contrasts = summ["contrasts"]
    cwl = [c.cwl for c in ctx.bank.contrast_curves(cfg.cfilt)]
    fig, ax = plt.subplots(nrows=2, gridspec_kw=dict(hspace=0, height_ratios=[3, 1]),
                           sharex=True, figsize=(7, 6))
    ax[0].scatter(cwl, contrasts, color="blue", marker="v", label="Model contrast", zorder=2)
    ax[0].errorbar(cwl, cfg.cmag, yerr=cfg.cerr, ls="None", capsize=4, capthick=2,
                   color="k", marker="v", label="Data contrast", zorder=1)
    ax[0].set_ylabel("Contrast (mag)", fontsize=12)
    ax[1].axhline(0, color="0.3", ls="--", lw=2, label="No resid.")
    ax[1].scatter(cwl, np.asarray(cfg.cmag) - contrasts, color="blue", marker="x",
                  s=50, label="Cont. resid.")
    ax[1].set_xlabel(r"Wavelength ($\AA$)", fontsize=12)
    ax[1].set_ylabel("Residual (mag)", fontsize=12)
    ax[1].set_xscale("log")
    ax[0].legend(loc="best", fontsize=10, ncol=2)
    plt.tight_layout()
    plt.savefig(os.path.join(cfg.dirname, "plots", f"{cfg.fname}_phot_scatter.pdf"))
    plt.close(fig)


def _decimate(wl, spec, factor=250):
    from mcmc_spec_tpu.ops.broaden import redres

    wl2, sp2 = redres(wl, spec, factor)
    keep = (wl2 >= 5315) & (wl2 <= 23652)
    return wl2[keep], sp2[keep]


def _plot_all_spec(ctx, med, draws, w_full, comp_full, comps_full, ext_full,
                   fit_plx=True):
    cfg = ctx.cfg
    wl_aa = ctx.data_wl_um * 1e4
    data = ctx.data_flux

    def on_data(spec_full):
        return np.interp(wl_aa, w_full, spec_full)

    spe = on_data(comp_full * ext_full)
    norm = np.median(data) / np.median(spe)
    spe *= norm
    pri = on_data(comps_full[0] * ext_full) * norm
    sec = on_data(comps_full[1] * ext_full) * norm
    ter = (on_data(comps_full[2] * ext_full) * norm) if len(comps_full) > 2 else None

    from mcmc_spec_tpu.ops.continuum import polyfit_renorm_matrix

    V, Vpinv = polyfit_renorm_matrix(wl_aa)
    data_renorm = data / (V @ (Vpinv @ (data / spe)))

    fig, (ax, ax1) = plt.subplots(nrows=2, gridspec_kw=dict(hspace=0, height_ratios=[3, 1]),
                                  sharex=True, figsize=(7, 6))
    rv = cfg.real_values_or_zero()
    dlabel = (f"Data: {rv[0]:.0f}+{rv[1]:.0f}K" if np.any(rv != 0) else "Data")
    ax.plot(wl_aa, data_renorm, lw=1, label=dlabel, color="k", zorder=4)
    ax.plot(wl_aa, spe, lw=1, label="Composite spectrum", color="seagreen", zorder=3.5)
    ax.plot(wl_aa, pri, lw=1, label=f"Primary: {med[0]:.0f}K", color="darkblue", zorder=3)
    ax.plot(wl_aa, sec, lw=1, label=f"Secondary: {med[1]:.0f}K", color="darkorange", zorder=3)
    if ter is not None:
        ax.plot(wl_aa, ter, lw=1, label=f"Tertiary: {med[2]:.0f}K", color="firebrick",
                zorder=3)

    for p in draws:
        wd, cd, compsd = composite_full(ctx.grid, ctx.mist, p, cfg.nspec,
                                        fit_plx=fit_plx)
        extd = 10 ** (-0.4 * np.asarray(ccm89(wd, p[cfg.nspec])))
        sd = np.interp(wl_aa, wd, cd * extd)
        sd *= np.median(data_renorm) / np.median(sd)
        ax.plot(wl_aa, sd, lw=0.75, color="limegreen", alpha=0.5, zorder=2.5, rasterized=True)
        ax1.plot(wl_aa, data_renorm - sd, lw=0.5, color="0.7", alpha=0.5, zorder=0,
                 rasterized=True)

    ax1.plot(wl_aa, data_renorm - spe, lw=1, color="k", label="Data - composite", zorder=2)
    ax1.axhline(0, label="No resid.", ls="--", color="k", lw=1, zorder=1)
    if cfg.mask:
        from mcmc_spec_tpu.io.spectra import TELLURIC_BANDS

        for lo, hi in TELLURIC_BANDS:
            ax.axvspan(lo * 1e4, hi * 1e4, alpha=0.3, color="0.4", zorder=5)
            ax1.axvspan(lo * 1e4, hi * 1e4, alpha=0.3, color="0.4", zorder=5)
    ax1.set_xlabel(r"Wavelength ($\AA$)", fontsize=14)
    ax.set_ylabel("Normalized Flux", fontsize=14)
    ax1.set_ylabel("Resid.", fontsize=14)
    ax.legend(loc="best", fontsize=10)
    ax1.legend(loc="best", fontsize=8, ncol=2)
    plt.tight_layout()
    plt.savefig(os.path.join(cfg.dirname, "plots", f"{cfg.fname}_all_spec.pdf"))
    plt.close(fig)


def _plot_zoom(ctx, w_full, comp_ext):
    cfg = ctx.cfg
    wl_aa = ctx.data_wl_um * 1e4
    spe = np.interp(wl_aa, w_full, comp_ext)
    spe *= np.median(ctx.data_flux) / np.median(spe)
    fig, ax = plt.subplots()
    ax.plot(wl_aa, ctx.data_flux, lw=1, label="Data spectrum", color="navy", zorder=0)
    ax.plot(wl_aa, spe, lw=1, label="Model", color="xkcd:sky blue", zorder=1)
    lo, hi = 8500, 8700  # reference zoom window (mft6.py:2467)
    if wl_aa.max() < lo or wl_aa.min() > hi:
        mid = 0.5 * (wl_aa.min() + wl_aa.max())
        lo, hi = mid - 100, mid + 100
    ax.set_xlim(lo, hi)
    plt.xlabel(r"Wavelength ($\AA$)", fontsize=13)
    plt.ylabel("Normalized flux", fontsize=13)
    plt.legend(loc="best", fontsize=13)
    plt.tight_layout()
    plt.savefig(os.path.join(cfg.dirname, "plots", "bestfit_spec_post_mcmc.pdf"))
    plt.close(fig)


def _plot_isochrone(ctx, med, out, fit_plx=True):
    """HR-diagram with all component placements (mft6.py:2595-2677, 3351-3449)."""
    cfg = ctx.cfg
    mist = ctx.mist
    nspec = cfg.nspec
    tt1, tt2 = med[0], med[1]
    ratio_col = nspec + 2 if fit_plx else nspec + 1
    ratio1 = med[ratio_col]
    pri_lum = float(mist.get_lum(tt1))
    pri_rad = np.sqrt(pri_lum * LSUN / (4 * np.pi * SIGMA_SB * tt1**4))  # cm
    sec_rad = ratio1 * pri_rad
    sec_lum = (4 * np.pi * sec_rad**2 * SIGMA_SB * tt2**4) / LSUN

    fig, ax = plt.subplots()
    tgrid = np.linspace(max(mist.teff_lo, 2800), 6500, 200)
    ax.plot(tgrid, np.log10(np.maximum(mist.get_lum(tgrid), 1e-6)), color="purple",
            zorder=0, label="MS (1 Gyr)")
    ax.scatter(tt1, np.log10(pri_lum), marker="x", color="darkgray", s=60, label="Primary")
    ax.scatter(tt2, np.log10(max(sec_lum, 1e-6)), marker="x", color="darkorange", s=50,
               label="Secondary")
    if nspec == 3:
        tt3 = med[2]
        ter_rad = med[ratio_col + 1] * pri_rad
        ter_lum = (4 * np.pi * ter_rad**2 * SIGMA_SB * tt3**4) / LSUN
        ax.scatter(tt3, np.log10(max(ter_lum, 1e-6)), marker="x", color="firebrick",
                   s=50, label="Tertiary")
    ax.set_xlabel(r"T$_{eff}$ (K)", fontsize=16)
    ax.set_ylabel(r"$\log_{10}$(L (L$_{\odot}$))", fontsize=16)
    ax.set_xlim(5000, 3000)
    ax.set_ylim(-3, 0)
    ax.legend(loc="best", fontsize=13)
    fig.tight_layout()
    plt.savefig(out)
    plt.close(fig)


def _mass_lum_posteriors(ctx, kep_sample, run):
    """Mass & luminosity posteriors via MIST lookups (mft6.py:2679-2721;
    tertiary analog from the plot_results3 block, mft6.py:2725-3449)."""
    mist = ctx.mist
    t1, t2 = kep_sample[:, 0], kep_sample[:, 1]
    posts = [mist.get_mass(t1), mist.get_mass(t2), mist.get_lum(t1), mist.get_lum(t2)]
    names = ["primary_mass_posterior", "secondary_mass_posterior",
             "primary_lum_posterior", "secondary_lum_posterior"]
    titles = [r"M$_{pri}$", r"M$_{sec}$", r"L$_{pri}$", r"L$_{sec}$"]
    xlabels = [r"M$_{pri}$ (M$_\odot$)", r"M$_{sec}$ (M$_\odot$)",
               r"L$_{pri}$ (L$_\odot$)", r"L$_{sec}$ (L$_\odot$)"]
    if ctx.cfg.nspec == 3:
        t3 = kep_sample[:, 2]
        posts += [mist.get_mass(t3), mist.get_lum(t3)]
        names += ["tertiary_mass_posterior", "tertiary_lum_posterior"]
        titles += [r"M$_{ter}$", r"L$_{ter}$"]
        xlabels += [r"M$_{ter}$ (M$_\odot$)", r"L$_{ter}$ (L$_\odot$)"]
    for post, name, title, xl in zip(posts, names, titles, xlabels):
        np.savetxt(os.path.join(run, name + ".txt"), np.asarray(post))
        _plot_posterior_hist(np.asarray(post), xl, title,
                             os.path.join(run, "plots", name + ".pdf"))
