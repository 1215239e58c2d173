from difflexmm_tpu.parallel.domain import (  # noqa: F401
    DOMAIN_AXIS,
    domain_mesh,
    domain_shard_solver,
    domain_state_sharding,
    domain_trajectory_sharding,
)
from difflexmm_tpu.parallel.mesh import (  # noqa: F401
    CANDIDATE_AXIS,
    SCENARIO_AXIS,
    init_distributed,
    make_mesh,
    replicated_sharding,
    scenario_sharding,
)
from difflexmm_tpu.parallel.multistart import (  # noqa: F401
    FinalistResult,
    MultistartMMAResult,
    MultistartResult,
    population_value_and_grad,
    random_initial_designs,
    reevaluate_finalists,
    run_multistart_mma,
    run_multistart_optax,
)
from difflexmm_tpu.parallel.scenarios import (  # noqa: F401
    multistart_map,
    scenario_parallel_objective,
)
