from segmentation3d_tpu.dataloader.dataset import (
    SegmentationDataset, read_train_txt, read_train_csv,
)
from segmentation3d_tpu.dataloader.sampler import EpochConcateSampler
