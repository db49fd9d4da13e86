from mcmc_spec_tpu.parallel.mesh import make_mesh, walker_sharding  # noqa: F401
from mcmc_spec_tpu.parallel.sharding import (  # noqa: F401
    sharded_log_prob,
    sharded_stretch_step,
    run_ensemble_sharded,
    shard_ensemble_state,
)
