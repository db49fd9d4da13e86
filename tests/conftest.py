import os

# Tests run on a virtual 8-device CPU mesh; sharding-correctness is validated
# here, perf on the real chip via bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Parity suites validate EXACT np.median semantics against the scalar /
# emulator references; the production default pass count lives in
# utils/flags.py::median_iters (the single source of truth, with the
# measured posterior-impact receipts — scripts/fast_median_impact.py).  The
# fast modes' accuracy envelopes have their own dedicated tests
# (TestFastMedian, TestPackTimeDials set the env explicitly).
os.environ.setdefault("MCMC_SPEC_FAST_MEDIAN", "exact")
# same for the bf16x3 matmul default (measured impact <= 0.006 sigma,
# scripts/matmul_passes_impact.py): parity suites pin the ~2.5e-7 bf16x6 mode
os.environ.setdefault("MCMC_SPEC_MATMUL_PASSES", "exact")
# same for the 2-Newton renorm reciprocal default (<= 8.6e-6 relative chi^2,
# scripts/try_fast_recip.py): parity suites pin true divides
os.environ.setdefault("MCMC_SPEC_FAST_RECIP", "exact")

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU platform via jax.config, which
# wins over JAX_PLATFORMS; override it back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

# float64 on CPU for golden-value comparisons; the TPU path packs float32.
jax.config.update("jax_enable_x64", True)
