from difflexmm_tpu.solver.dynamics import build_RHS, setup_dynamic_solver  # noqa: F401
from difflexmm_tpu.solver.integrate import (  # noqa: F401
    estimate_stable_dt,
    integrate,
    rk4_step,
    substeps_for,
)
from difflexmm_tpu.solver.modal import (  # noqa: F401
    eigenmode_analysis,
    linear_mode_analysis,
)
