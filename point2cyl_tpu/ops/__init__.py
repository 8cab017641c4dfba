from point2cyl_tpu.ops.grouping import (  # noqa: F401
    ball_query,
    index_points,
    sample_and_group,
    sample_and_group_all,
    square_distance,
    three_nn_interpolate,
)
from point2cyl_tpu.ops.sampling import farthest_point_sample  # noqa: F401
from point2cyl_tpu.ops.linalg import (  # noqa: F401
    estimate_extrusion_axis,
    smallest_eigenvector_sym3x3,
)
from point2cyl_tpu.ops.lap import (  # noqa: F401
    solve_lap_max,
    solve_lap_min,
)
from point2cyl_tpu.ops.matching import (  # noqa: F401
    hard_w_encoding,
    hungarian_matching,
    mask_gt_from_labels,
    relaxed_iou_cost,
)
from point2cyl_tpu.ops.geometry import (  # noqa: F401
    add_noise,
    estimate_extrusion_centers,
    extrusion_extents,
    rotation_to_z,
    rotation_to_z_reference,
    sketch_projection,
)
from point2cyl_tpu.ops.chamfer import chamfer_distances  # noqa: F401
