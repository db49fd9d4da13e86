"""utils coverage: run logs, profiling helpers, feature flags."""
import json
import os
import time

import numpy as np
import pytest

from mcmc_spec_tpu.utils.flags import spectrum_kernel_mode, use_pallas_spectrum
from mcmc_spec_tpu.utils.profiling import StageTimer, device_loop_time
from mcmc_spec_tpu.utils.runlog import RunLog, read_run_log


class TestRunLog:
    def test_events_and_timing(self, tmp_path):
        log = RunLog(str(tmp_path))
        log.start("stage_a", nwalk=10)
        time.sleep(0.01)
        log.end("stage_a", result=1.5)
        log.event("custom", value=42)
        events = read_run_log(str(tmp_path))
        assert [e["event"] for e in events] == ["stage_a.start", "stage_a.end", "custom"]
        assert events[1]["wall_s"] >= 0.01
        assert events[2]["value"] == 42

    def test_missing_log(self, tmp_path):
        assert read_run_log(str(tmp_path / "nope")) == []


class TestStageTimer:
    def test_compile_run_split(self):
        t = StageTimer()
        for _ in range(3):
            with t.stage("x"):
                time.sleep(0.005)
        assert "x" in t.first
        assert t.counts["x"] == 2  # first call counted separately
        rep = t.report()
        assert "x" in rep and "steady" in rep


class TestDeviceLoopTime:
    def test_returns_positive_seconds(self):
        import jax.numpy as jnp

        dt = device_loop_time(lambda x: (x * 2.0).sum(), jnp.ones((128, 128)), rep=5)
        assert 0 < dt < 1.0


class TestFlags:
    def test_modes(self, monkeypatch):
        assert spectrum_kernel_mode() == "auto"
        monkeypatch.setenv("MCMC_SPEC_SPECTRUM_KERNEL", "xla")
        assert spectrum_kernel_mode() == "xla"
        import jax.numpy as jnp

        assert not use_pallas_spectrum(jnp.float32)  # forced xla
        monkeypatch.setenv("MCMC_SPEC_SPECTRUM_KERNEL", "pallas")
        assert use_pallas_spectrum(jnp.float64)  # forced on
        monkeypatch.setenv("MCMC_SPEC_SPECTRUM_KERNEL", "bogus")
        with pytest.raises(ValueError):
            spectrum_kernel_mode()
        monkeypatch.delenv("MCMC_SPEC_SPECTRUM_KERNEL")
        # auto on CPU/float64 -> False
        assert not use_pallas_spectrum(jnp.float64)

    def test_persistent_compile_cache(self, tmp_path, monkeypatch):
        import os

        import jax

        from mcmc_spec_tpu.utils.flags import enable_persistent_compile_cache

        prev = jax.config.jax_compilation_cache_dir
        try:
            # explicit directory via the env value
            cache = str(tmp_path / "xla-cache")
            monkeypatch.setenv("MCMC_SPEC_COMPILE_CACHE", cache)
            assert enable_persistent_compile_cache() == cache
            assert os.path.isdir(cache)
            assert jax.config.jax_compilation_cache_dir == cache
            # opt-out
            monkeypatch.setenv("MCMC_SPEC_COMPILE_CACHE", "0")
            assert enable_persistent_compile_cache() is None
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)


class TestConfigParserRobustness:
    """Adversarial param-file variants beyond the verbatim koi2298 fixture:
    tab-separated values, inline comments, blank/comment-only lines, CRLF
    endings, unknown keys (silently ignored, as the reference's dict parser
    does), float-typed ints, and the filename-keyed synth switch."""

    def test_adversarial_param_file(self, tmp_path):
        from mcmc_spec_tpu.utils.config import FitConfig

        path = tmp_path / "param_weird.txt"
        path.write_bytes(
            b"# leading comment\r\n"
            b"\r\n"
            b"models\tsynthetic\t#tab separated\r\n"
            b"res 1700    # trailing comment\n"
            b"tmin 3000\n"
            b"tmax 5600.0\n"           # float-typed int
            b"unknown_key whatever\n"  # ignored like the reference
            b"cmag [1.5,2.5]\n"
            b"cfilt ['lp600','Kp']\n"
            b"mask TRUE\n"
            b"rad_prior f\n"
            b"plx 2e-3\n"
            b"nwalk 16\n"
            b"nsteps  5000\n"          # run of spaces (hand-aligned file)
        )
        cfg = FitConfig.from_file(str(path))
        assert cfg.models == "synthetic"
        assert cfg.res == 1700 and cfg.tmin == 3000 and cfg.tmax == 5600
        assert cfg.nsteps == 5000  # must not be silently dropped to default
        assert cfg.cmag == [1.5, 2.5] and cfg.cfilt == ["lp600", "Kp"]
        assert cfg.mask is True and cfg.rad_prior is False
        assert abs(cfg.plx - 2e-3) < 1e-12 and cfg.nwalk == 16
        assert not cfg.synth

    def test_synth_switch_keys_off_filename(self, tmp_path):
        from mcmc_spec_tpu.utils.config import FitConfig

        p = tmp_path / "param_synth_3850_3225.txt"
        p.write_text("models synthetic\n")
        assert FitConfig.from_file(str(p)).synth  # mft6.py:3553
        q = tmp_path / "param_koi9999.txt"
        q.write_text("models synthetic\n")
        assert not FitConfig.from_file(str(q)).synth
