from point2cyl_tpu.data.h5_io import (  # noqa: F401
    PackedDataset,
    load_h5,
    save_h5,
)
from point2cyl_tpu.data.synthetic import generate_dataset  # noqa: F401
from point2cyl_tpu.data.pipeline import InputPipeline  # noqa: F401
