from segmentation3d_tpu.config.config import EasyDict, default_config
from segmentation3d_tpu.utils.file_io import load_config
