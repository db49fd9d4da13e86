from mcmc_spec_tpu.inference.target import PackedTarget, pack_target  # noqa: F401
from mcmc_spec_tpu.inference.posterior import (  # noqa: F401
    log_posterior,
    log_likelihood,
    log_prior,
    optimizer_chi2,
    forward_summary,
)
from mcmc_spec_tpu.inference.batched import (  # noqa: F401
    log_posterior_batch,
    log_likelihood_batch,
    log_prior_batch,
    optimizer_chi2_batch,
    forward_batch,
)
from mcmc_spec_tpu.inference.stretch import EnsembleState, run_ensemble, stretch_step  # noqa: F401
from mcmc_spec_tpu.inference.anneal import run_anneal, init_walkers  # noqa: F401
from mcmc_spec_tpu.inference.fleet import (  # noqa: F401
    stack_targets,
    log_posterior_fleet,
    init_fleet_ensemble,
    run_fleet_ensemble,
)
from mcmc_spec_tpu.inference.sampler_api import EnsembleSampler  # noqa: F401
