from point2cyl_tpu.models.backbone import Backbone  # noqa: F401
from point2cyl_tpu.models.implicit import (  # noqa: F401
    ImplicitNet,
    PointNetEncoder,
    add_latent,
    sample_off_surface,
)
from point2cyl_tpu.models.layers import PointMLP, TorchBatchNorm  # noqa: F401
