from difflexmm_tpu.optim.loops import (  # noqa: F401
    OptLoopResult,
    naive_gd,
    ravel_pytree,
    run_optimization_optax,
)
from difflexmm_tpu.optim.mma import (  # noqa: F401
    MMAState,
    mma_init,
    mma_update,
    run_mma,
)
