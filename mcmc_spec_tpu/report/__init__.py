from mcmc_spec_tpu.report.corner_stats import (  # noqa: F401
    bimodal_decompose,
    gauss,
    bimodal,
    quantile_title,
)
from mcmc_spec_tpu.report.corner_plot import corner_plot  # noqa: F401
from mcmc_spec_tpu.report.composite import composite_full, band_mag_posteriors  # noqa: F401
