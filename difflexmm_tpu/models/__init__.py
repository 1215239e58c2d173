"""Design-problem model families (the reference's ``problems/`` layer)."""

from difflexmm_tpu.models import (  # noqa: F401
    hinge_characterization,
    kagome_focusing,
    quads_energy_splitting,
    quads_focusing,
    quads_focusing_multi_input,
    quads_focusing_restricted_space,
    quads_spin,
    quads_static_tuning,
    reference_design,
)
