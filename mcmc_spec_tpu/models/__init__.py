from mcmc_spec_tpu.models.grid import SpectralGrid  # noqa: F401
from mcmc_spec_tpu.models.synthetic import synthetic_grid, synthetic_spectrum  # noqa: F401
from mcmc_spec_tpu.models.mist import MistTable  # noqa: F401
from mcmc_spec_tpu.models.dust import AvProfile  # noqa: F401
