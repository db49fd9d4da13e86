"""Real-target integration: the reference's param_koi2298.txt + HET spectrum.

Uses the actual reference inputs — parameter file parsed verbatim, the real
HET/LRS2 spectrum, the real filter transmission curves and Vega spectrum —
with the model family switched to the self-contained synthetic grid (the
BT-Settl files are not bundled with the reference snapshot).  Exercises the
full production path on real data: telluric masking, KIC->SDSS photometric
recalibration, packing, both fit stages, and the report layer.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/param_koi2298.txt"), reason="reference data unavailable"
)


@pytest.fixture(scope="module")
def koi2298(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("koi2298")
    os.chdir(tmp)

    from mcmc_spec_tpu.pipeline import run_mcmc_stage, run_optimize_stage, setup_context
    from mcmc_spec_tpu.utils.config import FitConfig

    cfg = FitConfig.from_file(f"{REF}/param_koi2298.txt")
    # reference inputs, self-contained model family, small test schedule
    cfg.models = "synthetic"
    cfg.filename = f"{REF}/koi2298_HET.txt"
    cfg.bps_dir = f"{REF}/bps"
    cfg.data_dir = REF  # finds Data/vegaspec.fits
    cfg.dirname = str(tmp / "koi2298")
    cfg.nwalk = 16
    cfg.nstep = 30
    cfg.nburn = 20
    cfg.nsteps = 100
    ctx = setup_context(cfg, dtype=jnp.float64)
    return ctx


class TestKoi2298Setup:
    def test_param_file_parsed_verbatim(self, koi2298):
        cfg = koi2298.cfg
        assert cfg.res == 1700
        assert cfg.cmag == [2.08, 1.3]
        assert cfg.cfilt == ["lp600", "Kp"]
        assert cfg.pfilt[0] == "sdss,r"
        assert abs(cfg.plx - 2.0732e-3) < 1e-9
        assert cfg.dist_fit and cfg.mask and cfg.rad_prior

    def test_data_ingest(self, koi2298):
        # telluric-masked, windowed, median-normalised HET spectrum
        wl = koi2298.data_wl_um
        assert 0.645 < wl.min() < 0.66 and 0.82 < wl.max() < 0.84
        # masked bands removed
        for lo, hi in [(0.6861, 0.6879), (0.7601, 0.7659), (0.8211, 0.8239)]:
            assert not np.any((wl > lo) & (wl < hi))
        assert abs(np.median(koi2298.data_flux) - 1.0) < 1e-9

    def test_kic_to_sdss_recalibration(self, koi2298):
        # riz entries shifted by the KIC->SDSS transformation (mft6.py:3546-3560)
        raw = np.asarray(koi2298.cfg.pmag)
        cal = koi2298.phot_vega
        assert not np.allclose(cal[:3], raw[:3])  # sdss r,i,z recalibrated
        np.testing.assert_allclose(cal[3:], raw[3:])  # 2MASS unchanged
        # r' = -0.0383 + 0.0548*(r-i) + r
        expected_r = -0.0383 + 0.0548 * (raw[0] - raw[1]) + raw[0]
        assert abs(cal[0] - expected_r) < 1e-9

    def test_target_shapes(self, koi2298):
        tgt = koi2298.target
        assert tgt.n_contrast == 2 and tgt.n_phot == 6
        assert tgt.rad_prior and tgt.dist_fit
        assert 1500 < tgt.n_data < 2100  # HET spectrum after masking/window


class TestKoi2298Fit:
    def test_stages_and_reports(self, koi2298):
        from mcmc_spec_tpu.pipeline import run_mcmc_stage, run_optimize_stage
        from mcmc_spec_tpu.report.plots import plot_corner, plot_fit, plot_results

        ctx = koi2298
        run_optimize_stage(ctx, record_thin=300)
        samples = run_mcmc_stage(ctx, nthin=20, check_convergence=False)
        assert samples.shape[1] == 6
        assert np.all(np.isfinite(samples))
        # physically sane draws: inside the prior box
        assert samples[:, 0].min() >= 3000 and samples[:, 0].max() <= 5600
        assert samples[:, 5].min() >= 1 / 3000

        plot_fit(ctx)
        plot_corner(ctx, samples)
        plot_results(ctx, samples, n_spec_draws=5, n_kep_draws=50)
        d = ctx.cfg.dirname
        for art in ["plots/2298_corner.pdf", "plots/2298_phot_scatter.pdf",
                    "plots/2298_all_spec.pdf", "params.txt", "kep_contrast.txt"]:
            assert os.path.exists(os.path.join(d, art)), art
