"""Shared fixtures: a small synthetic fit target + a numpy reference emulator.

The emulator (`RefEmulator`) re-implements the reference pipeline's scoring
math (mft6.py:651-831, 1139-1205) directly from the *full-resolution* grid in
float64 numpy — bilinear spectrum interpolation, component scaling, extinction
of the full spectrum, interp1d onto the data grid, median + polynomial
renormalisation, per-filter trapz integrals — with none of the framework's
precomputed projections.  Agreement between `log_posterior` and the emulator
validates that the packed linear-projection design is exact.
"""
from __future__ import annotations

import numpy as np

from mcmc_spec_tpu.models.dust import AvProfile
from mcmc_spec_tpu.models.mist import MistTable
from mcmc_spec_tpu.models.synthetic import synthetic_grid, synthetic_spectrum
from mcmc_spec_tpu.inference.target import PC_CM, RSUN_CM, pack_target
from mcmc_spec_tpu.ops.photometry import FilterCurve, ab_zero_flux, photon_flux_weights


def gaussian_filter_curve(name, center, width, n=300, span=4.0):
    wl = np.linspace(center - span * width, center + span * width, n)
    tr = np.exp(-0.5 * ((wl - center) / width) ** 2)
    return FilterCurve(name=name, wl=wl, tr=tr)


_SETUP_CACHE = {}


def make_setup(nspec=2, rad_prior=False, dist_fit=True, dtype=None, spectrum_weight=1.0):
    """Small synthetic grid + data + filters; returns (setup dict, PackedTarget).

    Memoized per configuration: the synthetic grid + emulator build costs
    ~5 s and dozens of tests request identical setups (the suite spends
    minutes rebuilding them on the 1-CPU CI box).  The returned dict is a
    fresh shallow copy each call; the underlying arrays are shared, so
    mutate copies (as the existing tests already do via ``.copy()``).
    """
    key = (nspec, rad_prior, dist_fit, repr(dtype), spectrum_weight)
    if key in _SETUP_CACHE:
        setup, tgt = _SETUP_CACHE[key]
        return dict(setup), tgt
    setup, tgt = _make_setup_impl(nspec, rad_prior, dist_fit, dtype, spectrum_weight)
    _SETUP_CACHE[key] = (setup, tgt)
    return dict(setup), tgt


def _make_setup_impl(nspec, rad_prior, dist_fit, dtype, spectrum_weight):
    import jax.numpy as jnp

    specrange = (3000.0, 12000.0)
    data_window = (6450.0, 8400.0)
    res = 1700
    grid = synthetic_grid(
        specrange=specrange,
        data_window=data_window,
        resolution=res,
        temps=np.arange(3000.0, 5801.0, 400.0),
        loggs=np.array([4.0, 4.5, 5.0, 5.5]),
        step=1.0,
    )

    # observed "data": a composite synthetic binary at truth params + noise
    rng = np.random.RandomState(7)
    mist = MistTable.builtin()
    truth = dict(t1=4600.0, t2=3400.0, av=0.15, r1=0.72, rr2=0.45, plx=2.0e-3)
    data_wl_um = np.linspace(0.652, 0.838, 900)
    data_wl_aa = data_wl_um * 1e4

    def comp_spec_full(t, g):
        from mcmc_spec_tpu.ops.interp import bilinear_bracket, bilinear_gather_blend
        import jax.numpy as jnp2

        ti, tw = bilinear_bracket(jnp2.asarray(grid.temps), t)
        gi, gw = bilinear_bracket(jnp2.asarray(grid.loggs), g)
        return np.asarray(bilinear_gather_blend(jnp2.asarray(grid.flux), ti, tw, gi, gw))

    d_pc = 1.0 / truth["plx"]
    s1 = (truth["r1"] * RSUN_CM / (d_pc * PC_CM)) ** 2
    s2 = (truth["r1"] * truth["rr2"] * RSUN_CM / (d_pc * PC_CM)) ** 2
    lg1 = float(mist.get_logg(truth["t1"]))
    lg2 = float(mist.get_logg(truth["t2"]))
    comp = s1 * comp_spec_full(truth["t1"], lg1) + s2 * comp_spec_full(truth["t2"], lg2)
    data_flux = np.interp(data_wl_aa, grid.wl, comp)
    data_flux *= 1.0 + 0.01 * rng.randn(len(data_flux))
    data_err = 0.01 * np.abs(data_flux)
    med = np.median(data_flux)
    data_flux = data_flux / med
    data_err = data_err / med

    cfilts = [
        gaussian_filter_curve("c600", 6000.0, 150.0),
        gaussian_filter_curve("cK", 9500.0, 300.0),
    ]
    pfilts = [
        gaussian_filter_curve("p_r", 6250.0, 300.0),
        gaussian_filter_curve("p_i", 7700.0, 350.0),
        gaussian_filter_curve("p_z", 9100.0, 400.0),
    ]
    zps = []
    for f in pfilts:
        _, lpivot = photon_flux_weights(grid.wl, f.wl, f.tr)
        zps.append(ab_zero_flux(lpivot))

    av_profile = AvProfile.constant(truth["av"], 0.05)

    emu = RefEmulator(
        grid, mist, data_wl_aa, data_flux, data_err, cfilts, pfilts, zps,
        nspec=nspec, dist_fit=dist_fit, rad_prior=rad_prior, av_profile=av_profile,
        spectrum_weight=spectrum_weight,
    )

    # truth-adjacent observations so chi^2 values are O(1)
    p_truth = emu.truth_params(truth, nspec)
    fwd = emu.forward(p_truth)
    cmag = fwd["contrasts"] + rng.normal(0, 0.02, len(cfilts))
    cerr = np.full(len(cfilts), 0.05)
    pmag = fwd["phot_ext"] + rng.normal(0, 0.02, len(pfilts))
    perr = np.full(len(pfilts), 0.05)
    emu.set_observations(cmag, cerr, pmag, perr)

    ndim = 2 * nspec + 2
    prior_mu = np.zeros(ndim)
    prior_sig = np.ones(ndim)
    if dist_fit:
        prior_mu[-1] = truth["plx"]
        prior_sig[-1] = 0.05e-3

    kwargs = {}
    if dtype is not None:
        kwargs["dtype"] = dtype
    tgt = pack_target(
        grid, data_wl_um, data_flux, data_err,
        cfilts, cmag, cerr, pfilts, zps, pmag, perr,
        mist, av_profile,
        nspec=nspec, dist_fit=dist_fit, rad_prior=rad_prior,
        spectrum_weight=spectrum_weight,
        prior_mu=prior_mu, prior_sig=prior_sig, **kwargs,
    )
    emu.prior_mu, emu.prior_sig = prior_mu, prior_sig

    setup = dict(
        grid=grid, mist=mist, truth=truth, p_truth=p_truth,
        data_wl_um=data_wl_um, data_flux=data_flux, data_err=data_err,
        cfilts=cfilts, pfilts=pfilts, zps=zps, cmag=cmag, cerr=cerr,
        pmag=pmag, perr=perr, av_profile=av_profile, emulator=emu,
    )
    return setup, tgt


class RefEmulator:
    """Float64 numpy re-implementation of the reference scoring math."""

    def __init__(self, grid, mist, data_wl_aa, data_flux, data_err,
                 cfilts, pfilts, zps, nspec=2, dist_fit=True, rad_prior=False,
                 av_profile=None, spectrum_weight=1.0):
        self.grid = grid
        self.mist = mist
        self.data_wl_aa = data_wl_aa
        self.data_flux = data_flux
        self.data_err = data_err
        self.cfilts = cfilts
        self.pfilts = pfilts
        self.zps = np.asarray(zps)
        self.nspec = nspec
        self.dist_fit = dist_fit
        self.rad_prior = rad_prior
        self.av_profile = av_profile
        self.spectrum_weight = spectrum_weight
        self.prior_mu = None
        self.prior_sig = None

    @staticmethod
    def truth_params(truth, nspec):
        assert nspec == 2
        return np.array([truth["t1"], truth["t2"], truth["av"],
                         truth["r1"], truth["rr2"], truth["plx"]])

    # --- reference math, straight from the full grid ----------------------
    def _bilinear(self, t, g):
        temps, loggs = self.grid.temps, self.grid.loggs
        i = np.clip(np.searchsorted(temps, t, side="right") - 1, 0, len(temps) - 2)
        j = np.clip(np.searchsorted(loggs, g, side="right") - 1, 0, len(loggs) - 2)
        tw = (t - temps[i]) / (temps[i + 1] - temps[i])
        gw = (g - loggs[j]) / (loggs[j + 1] - loggs[j])
        F = self.grid.flux
        f0 = F[i, j] * (1 - gw) + F[i, j + 1] * gw
        f1 = F[i + 1, j] * (1 - gw) + F[i + 1, j + 1] * gw
        return f0 * (1 - tw) + f1 * tw

    def _ccm89(self, wl_aa, av):
        import jax.numpy  # noqa: F401  (use framework curve; validated separately)
        from mcmc_spec_tpu.ops.extinction import ccm89

        return np.asarray(ccm89(np.asarray(wl_aa, dtype=np.float64), av), dtype=np.float64)

    def forward(self, p):
        n = self.nspec
        teffs, av = p[:n], p[n]
        r1, ratios, plx = p[n + 1], p[n + 2: 2 * n + 1], p[2 * n + 1]
        d_pc = 1.0 / plx
        scales = [(r1 * RSUN_CM / (d_pc * PC_CM)) ** 2]
        for k in range(n - 1):
            scales.append((r1 * ratios[k] * RSUN_CM / (d_pc * PC_CM)) ** 2)
        loggs = [float(self.mist.get_logg(t)) for t in teffs]
        comps = [s * self._bilinear(t, g) for s, t, g in zip(scales, teffs, loggs)]
        composite = np.sum(comps, axis=0)

        # contrasts: trapz(spec * interp(T)) over model points in filter support
        mags = np.zeros((len(self.cfilts), n))
        for i, f in enumerate(self.cfilts):
            ran = f.wl
            mask = (self.grid.wl >= ran.min()) & (self.grid.wl <= ran.max())
            w = self.grid.wl[mask]
            tran = np.interp(w, ran, f.tr)
            for k in range(n):
                mags[i, k] = -2.5 * np.log10(np.trapezoid(comps[k][mask] * tran, w))
        if n == 2:
            contrasts = mags[:, 1] - mags[:, 0]
        else:
            nc = len(self.cfilts)
            contrasts = np.where(np.arange(nc) < nc // 2,
                                 mags[:, 1] - mags[:, 0], mags[:, 2] - mags[:, 0])

        # photometry: pyphot photon convention on the composite
        phot = np.zeros(len(self.pfilts))
        for i, f in enumerate(self.pfilts):
            tr_on = np.interp(self.grid.wl, f.wl, f.tr, left=0, right=0)
            ind = tr_on > 0
            w = self.grid.wl[ind]
            a = np.trapezoid(w * tr_on[ind] * composite[ind], w)
            b = np.trapezoid(w * tr_on[ind], w)
            phot[i] = -2.5 * np.log10((a / b) / self.zps[i])

        # extincted versions (mft6.py:1161-1166)
        if av > 0:
            comp_ext = composite * 10 ** (-0.4 * self._ccm89(self.grid.wl, av))
            cwls = np.array([f.cwl for f in self.pfilts])
            phot_ext = phot + self._ccm89(cwls, av)
        else:
            comp_ext = composite
            phot_ext = phot
        model_data = np.interp(self.data_wl_aa, self.grid.wl, comp_ext)
        return dict(model_data=model_data, contrasts=contrasts, phot=phot,
                    phot_ext=phot_ext, composite=composite)

    def set_observations(self, cmag, cerr, pmag, perr):
        self.cmag, self.cerr = np.asarray(cmag), np.asarray(cerr)
        self.pmag, self.perr = np.asarray(pmag), np.asarray(perr)

    def chi2(self, p, spec_mult=1.0):
        fwd = self.forward(p)
        model = fwd["model_data"]
        model = model * np.median(self.data_flux) / np.median(model)
        frac = self.data_flux / model
        pfit = np.polynomial.Polynomial.fit(self.data_wl_aa, frac, deg=2)
        data_renorm = self.data_flux / pfit(self.data_wl_aa)
        ic = (model - data_renorm) ** 2 / self.data_err**2
        iic = np.sum(ic) / len(ic)
        chi_c = np.sum((fwd["contrasts"] - self.cmag) ** 2 / self.cerr**2)
        chi_p = np.sum((fwd["phot_ext"] - self.pmag) ** 2 / self.perr**2)
        nc, npf = len(self.cmag), len(self.pmag)
        return (self.spectrum_weight * iic * spec_mult * (nc + npf)) + chi_c + chi_p

    def log_prior(self, p):
        n = self.nspec
        teffs, av = p[:n], p[n]
        rad = p[n + 1: 2 * n + 1]
        plx = p[2 * n + 1]
        tmin, tmax = self.grid.temps.min(), self.grid.temps.max()
        # nospec variant tightens the plx cap to 1/100 (mft6_nospec.py:1228)
        plx_hi = 1 / 100 if self.spectrum_weight == 0.0 else 1 / 4
        if (np.any(teffs > tmax) or np.any(teffs < tmin) or np.any(rad < 0.05)
                or rad[0] > 1.5 or plx < 1 / 3000 or plx > plx_hi or av < 0):
            return -np.inf
        pp = []
        d = 1.0 / plx
        mu = np.interp(np.log(d), np.log(self.av_profile.dist_pc), self.av_profile.av_mu)
        sig = np.interp(np.log(d), np.log(self.av_profile.dist_pc), self.av_profile.av_sig)
        pp.append(-0.5 * ((av - mu) / sig) ** 2)
        if self.prior_mu is not None:
            for k, m in enumerate(self.prior_mu):
                if m != 0:
                    pp.append(-0.5 * ((p[k] - m) / self.prior_sig[k]) ** 2)
        if self.rad_prior:
            m1 = float(self.mist.get_radius(teffs[0]))
            m2 = float(self.mist.get_radius(teffs[1]))
            for rv, mv in zip([rad[0], rad[1]], [m1, m2 / m1]):
                pp.append(-0.5 * ((rv - mv) / (0.02 * mv)) ** 2)
        return float(np.sum(pp))

    def log_posterior(self, p):
        lp = self.log_prior(p)
        if not np.isfinite(lp):
            return -np.inf
        return lp - 0.5 * self.chi2(p, spec_mult=1.0)

    def optimizer_chi2(self, p, rad_sigma=None):
        """ANNEALER-stage scoring, transcribed from ``fit_spec``
        (mft6.py:999-1050): the model is median-matched and scored against
        the RAW data (no ``norm_spec`` continuum renorm — that is an
        emcee-stage refinement, mft6.py:1172-1174), the per-point mean
        spectrum chi^2 carries the x3 weight (mft6.py:1015), and the priors
        enter in ``opt_prior``'s chi^2 convention (no 0.5, mft6.py:833-854):
        dust at the trial distance, the parallax measurement, and the MIST
        radii with the annealer's current step sizes as sigmas
        (mft6.py:1030-1050)."""
        n = self.nspec
        fwd = self.forward(p)
        model = fwd["model_data"]
        model = model * np.median(self.data_flux) / np.median(model)
        tc = (model - self.data_flux) ** 2 / self.data_err**2
        ttc = np.sum(tc) / len(tc) * 3.0
        chi_c = np.sum((fwd["contrasts"] - self.cmag) ** 2 / self.cerr**2)
        chi_p = np.sum((fwd["phot_ext"] - self.pmag) ** 2 / self.perr**2)
        nc, npf = len(self.cmag), len(self.pmag)
        cs = self.spectrum_weight * ttc * (nc + npf) + chi_c + chi_p

        av = p[n]
        plx = p[2 * n + 1]
        d = 1.0 / plx
        mu = np.interp(np.log(d), np.log(self.av_profile.dist_pc), self.av_profile.av_mu)
        sig = np.interp(np.log(d), np.log(self.av_profile.dist_pc), self.av_profile.av_sig)
        cs += ((av - mu) / sig) ** 2
        if self.dist_fit and self.prior_mu is not None and self.prior_mu[-1] != 0:
            cs += ((plx - self.prior_mu[-1]) / self.prior_sig[-1]) ** 2
        if self.rad_prior:
            rad = np.asarray(p[n + 1: 2 * n + 1])
            m1 = float(self.mist.get_radius(p[0]))
            m2 = float(self.mist.get_radius(p[1]))
            model_vals = np.array([m1, m2 / m1])
            if rad_sigma is None:
                rad_sigma = 0.05 * rad  # initial step-size convention (mft6.py:918)
            cs += np.sum((rad - model_vals) ** 2 / np.asarray(rad_sigma) ** 2)
        return float(cs)
