from difflexmm_tpu.parallel.mesh import (  # noqa: F401
    CANDIDATE_AXIS,
    SCENARIO_AXIS,
    make_mesh,
    replicated_sharding,
    scenario_sharding,
)
from difflexmm_tpu.parallel.scenarios import (  # noqa: F401
    multistart_map,
    scenario_parallel_objective,
)
