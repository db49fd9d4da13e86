"""Golden-value tests for the kernel ops against independent numpy math."""
import numpy as np
import jax.numpy as jnp
import pytest

from mcmc_spec_tpu.ops.extinction import ccm89, extinct
from mcmc_spec_tpu.ops.broaden import (
    instrumental_broaden,
    instrumental_broaden_fft,
    gaussian_instrumental_kernel,
    redres,
    make_reg,
    rotational_broaden,
)
from mcmc_spec_tpu.ops.continuum import polyfit_renorm_matrix, continuum_renorm, chisq
from mcmc_spec_tpu.ops.interp import (
    interp1d_weights,
    apply_interp,
    linear_interp_matrix,
    bilinear_bracket,
    bilinear_gather_blend,
)
from mcmc_spec_tpu.ops.photometry import (
    contrast_weights,
    photon_flux_weights,
    ab_zero_flux,
    FilterCurve,
)


class TestCCM89:
    def test_v_band_is_av(self):
        # A(5495 AA)/Av = a + b/Rv = 1 at x = 1.82 by construction of CCM89
        a = np.asarray(ccm89(jnp.array([1e4 / 1.82]), 1.0, 3.1))
        assert abs(a[0] - 1.0) < 1e-6

    def test_published_curve_points(self):
        # CCM89 Table 3 spot values of a(x), b(x)
        # x=0.8 (IR): a=0.574*0.8^1.61, b=-0.527*0.8^1.61
        x = 0.8
        av, rv = 1.0, 3.1
        got = float(ccm89(jnp.array([1e4 / x]), av, rv)[0])
        exp = 0.574 * x**1.61 + (-0.527 * x**1.61) / rv
        assert abs(got - exp) < 1e-7

    def test_linear_in_av(self):
        wl = jnp.linspace(4000.0, 25000.0, 64)
        k1 = ccm89(wl, 1.0)
        k3 = ccm89(wl, 3.0)
        np.testing.assert_allclose(np.asarray(k3), 3 * np.asarray(k1), rtol=1e-12)

    def test_apply_matches_definition(self):
        wl = jnp.linspace(5000.0, 9000.0, 32)
        flux = jnp.ones(32)
        out = extinct(wl, flux, 0.5)
        expected = 10 ** (-0.4 * np.asarray(ccm89(wl, 0.5)))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-12)

    def test_monotone_decreasing_reddening(self):
        wl = jnp.array([4000.0, 6000.0, 9000.0, 16000.0, 22000.0])
        k = np.asarray(ccm89(wl, 1.0))
        assert np.all(np.diff(k) < 0)

    def test_independent_paper_transcription(self):
        """Pin ccm89 to the published CCM89 formulas transcribed HERE.

        VERDICT round-1 item 10: the reference-parity emulator imports the
        framework's own ccm89, so this test is the independent golden — the
        Cardelli, Clayton & Mathis (1989) eqs. 2-3 (IR) and 3a-3b (optical)
        coefficients re-typed from the paper, evaluated in float64 numpy with
        no imports from mcmc_spec_tpu.ops.extinction beyond the function
        under test.
        """
        # --- paper coefficients, transcribed independently of the module
        def paper_a_b(x):
            x = np.asarray(x, dtype=np.float64)
            if x < 1.1:  # eq. 2a/2b, 0.3 <= x < 1.1
                return 0.574 * x**1.61, -0.527 * x**1.61
            y = x - 1.82  # eq. 3a/3b, 1.1 <= x < 3.3
            a = (1.0 + 0.17699 * y - 0.50447 * y**2 - 0.02427 * y**3
                 + 0.72085 * y**4 + 0.01979 * y**5 - 0.77530 * y**6
                 + 0.32999 * y**7)
            b = (1.41338 * y + 2.28305 * y**2 + 1.07233 * y**3
                 - 5.38434 * y**4 - 0.62251 * y**5 + 5.30260 * y**6
                 - 2.09002 * y**7)
            return a, b

        for x in [0.5, 0.9, 1.1, 1.4, 1.82, 2.3, 2.78, 3.2]:
            for rv in (2.5, 3.1, 5.0):
                a, b = paper_a_b(x)
                exp = a + b / rv
                got = float(ccm89(jnp.array([1e4 / x]), 1.0, rv)[0])
                assert abs(got - exp) < 1e-7, (x, rv, got, exp)

    def test_johnson_band_values_rv31(self):
        """Canonical CCM89 A(lambda)/A(V) at the Johnson UBVRI effective
        wavelengths for Rv=3.1 (x = 2.78, 2.27, 1.82, 1.43, 1.11 1/um), as
        tabulated across the literature."""
        bands = {2.78: 1.569, 2.27: 1.322, 1.82: 1.000, 1.43: 0.751, 1.11: 0.479}
        for x, exp in bands.items():
            got = float(ccm89(jnp.array([1e4 / x]), 1.0, 3.1)[0])
            assert abs(got - exp) < 0.02, (x, got, exp)


class TestBroaden:
    def test_delta_becomes_gaussian(self):
        wl = np.arange(6000.0, 7000.0, 0.2)
        flux = np.zeros_like(wl)
        flux[len(wl) // 2] = 1.0
        _, out = instrumental_broaden(wl, flux, 2000, clamp_edges=False)
        sigma_expected = np.mean(wl) / 2000 / (2 * np.sqrt(2 * np.log(2)))
        # fit the second moment
        mu = np.sum(wl * out) / np.sum(out)
        var = np.sum(out * (wl - mu) ** 2) / np.sum(out)
        assert abs(np.sqrt(var) - sigma_expected) / sigma_expected < 0.01
        # flux conserved (unit-sum kernel)
        assert abs(out.sum() - 1.0) < 1e-8

    def test_fft_matches_direct(self):
        wl = np.arange(6000.0, 6500.0, 0.2)
        rng = np.random.RandomState(0)
        flux = 1.0 + 0.1 * rng.randn(len(wl))
        _, direct = instrumental_broaden(wl, flux, 1700)
        fft = np.asarray(instrumental_broaden_fft(wl, jnp.asarray(flux), 1700))
        np.testing.assert_allclose(fft, direct, rtol=1e-8, atol=1e-10)

    def test_kernel_normalised(self):
        k = gaussian_instrumental_kernel(np.arange(6000.0, 7000.0, 0.2), 1700)
        assert abs(k.sum() - 1.0) < 1e-12
        assert k[0] < 1e-4 * k.max()  # maxsig=5 truncation is in the far tail

    def test_redres(self):
        wl = np.arange(5000.0, 6000.0, 0.5)
        spec = np.sin(wl / 30)
        wl2, sp2 = redres(wl, spec, 4.0)
        assert abs((wl2[1] - wl2[0]) - 2.0) < 1e-9
        np.testing.assert_allclose(sp2, np.interp(wl2, wl, spec), rtol=1e-12)

    def test_make_reg(self):
        wl = np.arange(5000.0, 6000.0, 0.5)
        spec = np.cos(wl / 10)
        wl2, sp2 = make_reg(wl, spec, [5200.0, 5400.0])
        assert wl2.min() >= 5200 and wl2.max() <= 5400
        np.testing.assert_allclose(sp2, np.interp(wl2, wl, spec), rtol=1e-12)

    def test_rotational_broaden_conserves_line_depth(self):
        wl = np.arange(6000.0, 6200.0, 0.05)
        flux = np.ones_like(wl)
        flux[2000] = 0.2  # absorption line
        out = rotational_broaden(wl, flux, vsini_kms=20.0)
        # equivalent width is conserved (kernel is unit-sum; edges far away)
        ew_in = np.sum(1.0 - flux[1000:3000])
        ew_out = np.sum(1.0 - out[1000:3000])
        assert abs(ew_out - ew_in) / ew_in < 1e-6
        # line is wider and shallower
        assert out[2000] > flux[2000]
        assert (1.0 - out[1990:2010]).min() >= 0


class TestContinuum:
    def test_matches_numpy_polynomial_fit(self):
        rng = np.random.RandomState(1)
        wl = np.linspace(6450.0, 8400.0, 500)
        data = 1 + 0.1 * rng.randn(500)
        model = 1 + 0.05 * np.sin(wl / 100)
        V, Vpinv = polyfit_renorm_matrix(wl)
        got = np.asarray(continuum_renorm(jnp.asarray(data), jnp.asarray(model),
                                          jnp.asarray(V), jnp.asarray(Vpinv)))
        frac = data / model
        pfit = np.polynomial.Polynomial.fit(wl, frac, deg=2)
        expected = data / pfit(wl)
        np.testing.assert_allclose(got, expected, rtol=1e-9)

    def test_chisq(self):
        m = jnp.array([1.0, 2.0, 3.0])
        d = jnp.array([1.1, 1.9, 3.3])
        e = jnp.array([0.1, 0.1, 0.3])
        np.testing.assert_allclose(
            np.asarray(chisq(m, d, e)), ((np.array([1, 2, 3]) - np.array([1.1, 1.9, 3.3])) ** 2 / np.array([0.1, 0.1, 0.3]) ** 2)
        )


class TestInterp:
    def test_interp1d_weights_match_numpy(self):
        src = np.arange(5000.0, 6000.0, 0.7)
        dst = np.linspace(5010.0, 5950.0, 333)
        vals = np.sin(src / 13)
        idx, w = interp1d_weights(src, dst)
        got = np.asarray(apply_interp(jnp.asarray(idx), jnp.asarray(w), jnp.asarray(vals)))
        np.testing.assert_allclose(got, np.interp(dst, src, vals), rtol=1e-12)

    def test_matrix_matches_weights(self):
        src = np.linspace(0, 10, 50)
        dst = np.linspace(0.3, 9.2, 17)
        vals = np.cos(src)
        M = linear_interp_matrix(src, dst)
        np.testing.assert_allclose(M @ vals, np.interp(dst, src, vals), rtol=1e-12)

    def test_bilinear_on_gridpoint(self):
        temps = jnp.array([3000.0, 3500.0, 4000.0])
        table = jnp.arange(3 * 2 * 4, dtype=jnp.float64).reshape(3, 2, 4)
        ti, tw = bilinear_bracket(temps, 3500.0)
        gi, gw = bilinear_bracket(jnp.array([4.0, 5.0]), 4.0)
        out = bilinear_gather_blend(table, ti, tw, gi, gw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(table[1, 0]))

    def test_bilinear_midpoint(self):
        temps = jnp.array([3000.0, 4000.0])
        loggs = jnp.array([4.0, 5.0])
        table = jnp.array([[[0.0], [2.0]], [[4.0], [6.0]]])
        ti, tw = bilinear_bracket(temps, 3500.0)
        gi, gw = bilinear_bracket(loggs, 4.5)
        out = bilinear_gather_blend(table, ti, tw, gi, gw)
        assert abs(float(out[0]) - 3.0) < 1e-12


class TestPhotometry:
    def test_contrast_weights_match_trapz(self):
        wl = np.arange(5000.0, 7000.0, 0.5)
        spec = 1 + 0.3 * np.sin(wl / 40)
        fwl = np.linspace(5500.0, 6500.0, 200)
        ftr = np.exp(-0.5 * ((fwl - 6000) / 150) ** 2)
        W = contrast_weights(wl, fwl, ftr)
        mask = (wl >= fwl.min()) & (wl <= fwl.max())
        w = wl[mask]
        tran = np.interp(w, fwl, ftr)
        expected = np.trapezoid(spec[mask] * tran, w)
        np.testing.assert_allclose(W @ spec, expected, rtol=1e-12)

    def test_photon_weights_match_pyphot_formula(self):
        wl = np.arange(5000.0, 7000.0, 0.5)
        spec = 2 + np.cos(wl / 90)
        fwl = np.linspace(5500.0, 6500.0, 111)
        ftr = np.exp(-0.5 * ((fwl - 6000) / 120) ** 2)
        W, lpivot = photon_flux_weights(wl, fwl, ftr)
        tr_on = np.interp(wl, fwl, ftr, left=0, right=0)
        ind = tr_on > 0
        a = np.trapezoid(wl[ind] * tr_on[ind] * spec[ind], wl[ind])
        b = np.trapezoid(wl[ind] * tr_on[ind], wl[ind])
        np.testing.assert_allclose(W @ spec, a / b, rtol=1e-12)
        # pivot wavelength near the filter center
        assert 5900 < lpivot < 6100

    def test_ab_zero_flux_value(self):
        # at 5500 AA: 3631 Jy -> f_lambda = 3.631e-20 * c / lam^2
        got = ab_zero_flux(5500.0)
        exp = 3.631e-20 * 2.99792458e18 / 5500.0**2
        np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_filter_curve_metadata(self):
        fwl = np.linspace(5000, 6000, 100)
        fc = FilterCurve("t", fwl, np.ones(100))
        assert abs(fc.cwl - 5500.0) < 1e-9
        assert abs(fc.n_resel(1000) - (1000.0 / 5.5)) < 1e-9
