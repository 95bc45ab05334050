from segmentation3d_tpu.ops.geometry import Frame, partition_boxes
from segmentation3d_tpu.ops.resample import (
    resample_to_frame,
    resample_spacing,
    crop_at_world_center,
)
