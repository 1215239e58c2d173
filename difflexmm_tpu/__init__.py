"""difflexmm_tpu: a TPU-native differentiable flexible-metamaterial framework.

Simulates 2D networks of rigid polygonal blocks (3 DOFs each) connected by
deformable elastic ligaments with energy-based contact, and differentiates
through the full dynamic simulation for gradient-based inverse design of
geometry, stiffness, damping, loading, and initial conditions.

Feature parity target: bertoldi-collab/DifFlexMM (Bordiga et al., Nature
Materials 23:1486-1494, 2024), rebuilt TPU-first on JAX/XLA/Pallas/pjit.
"""

__version__ = "0.1.0"

from difflexmm_tpu.utils.types import (  # noqa: F401
    BondParams,
    ContactParams,
    ControlParams,
    EigenmodeData,
    GeometricalParams,
    LigamentParams,
    MagneticParams,
    MechanicalParams,
    SolutionData,
    SolutionType,
    StretchingTorsionalSpringParams,
    is_scalar,
    load_data,
    save_data,
)
