from point2cyl_tpu.losses.segmentation import (  # noqa: F401
    compute_miou_loss,
    segmentation_iou,
)
from point2cyl_tpu.losses.normal import (  # noqa: F401
    acos_safe,
    normal_difference,
    normal_loss,
)
from point2cyl_tpu.losses.aggregate import (  # noqa: F401
    base_barrel_ce_loss,
    compute_all_losses,
)
from point2cyl_tpu.losses.sketch import (  # noqa: F401
    sketch_loss,
    sketch_loss_masked,
    weighted_chamfer_loss,
)
