from difflexmm_tpu.geometry.base import (  # noqa: F401
    Geometry,
    LatticeGeometry,
    get_point_ids_in_bounding_box,
    get_point_ids_in_circle,
)
from difflexmm_tpu.geometry.edges import (  # noqa: F401
    compute_block_angles,
    compute_edge_angles,
    edge_unit_vectors,
)
from difflexmm_tpu.geometry.kagome import (  # noqa: F401
    KagomeGeometry,
    KagomePeriodicGeometry,
)
from difflexmm_tpu.geometry.polygon import (  # noqa: F401
    compute_edge_lengths,
    compute_inertia,
    compute_xy_limits,
    polygon_area,
    polygon_centroid,
    polygon_polar_moment,
    polygons_geometric_properties,
    signed_angle,
)
from difflexmm_tpu.geometry.quad import (  # noqa: F401
    QuadGeometry,
    RotatedSquareGeometry,
)

# Reference-API alias (difflexmm/geometry.py:221-231).
angle_between_unit_vectors = signed_angle
