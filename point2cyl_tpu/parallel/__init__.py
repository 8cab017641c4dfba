from point2cyl_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
from point2cyl_tpu.parallel.point_sharding import (  # noqa: F401
    ball_query_sharded,
    farthest_point_sample_sharded,
    index_points_sharded,
    sample_and_group_sharded,
    three_nn_interpolate_sharded,
)
from point2cyl_tpu.parallel.sharded_backbone import (  # noqa: F401
    backbone_apply_point_sharded,
)
