from difflexmm_tpu.ops.assembly import (  # noqa: F401
    build_strain_energy,
    combine_block_energies,
    constrain_energy,
    strain_energy_bond,
)
from difflexmm_tpu.ops.bonds import (  # noqa: F401
    ligament_energy,
    ligament_energy_linearized,
    ligament_strains,
    ligament_strains_linearized,
    simple_spring_energy,
    stretching_torsional_spring_energy,
    vdot,
)
from difflexmm_tpu.ops.contact import (  # noqa: F401
    build_contact_energy,
    build_void_edge_distance,
    contact_energy,
    edges_distance,
    point_to_edge_distance,
    void_angles,
)
from difflexmm_tpu.ops.kinematics import (  # noqa: F401
    DOFSet,
    block_to_node_kinematics,
    build_constrained_kinematics,
    current_node_positions,
)
from difflexmm_tpu.ops.grid import build_quad_grid_energy  # noqa: F401
from difflexmm_tpu.ops.magnetic import (  # noqa: F401
    build_magnetic_energy,
    magnetic_dipole_energy,
)
from difflexmm_tpu.ops.loading import (  # noqa: F401
    build_loading,
    build_node_loading,
    build_viscous_damping,
)
from difflexmm_tpu.ops.observables import (  # noqa: F401
    angular_momentum,
    compute_ligament_strains,
    compute_ligament_strains_history,
    kinetic_energy,
)
