"""point2cyl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
decomposing 3D point clouds of CAD solids into extrusion cylinders.

Capability contract mirrors mikacuy/point2cyl (CVPR 2022): per-point normals,
extrusion-instance + base/barrel segmentation, closed-form differentiable
extrusion-axis / center / extent estimation, implicit (IGR-style SDF) 2D
sketch extraction, and CSG reconstruction via marching cubes — re-designed as
batched, masked, fixed-shape XLA programs over an explicit device mesh.
"""

__version__ = "0.1.0"

from point2cyl_tpu.core.config import (  # noqa: F401
    BackboneConfig,
    DataConfig,
    LossWeights,
    TrainConfig,
)
