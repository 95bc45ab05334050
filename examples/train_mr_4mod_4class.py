"""Multi-modality MR segmentation (BraTS-style): 4 input modalities,
4 classes, per-modality adaptive intensity normalization, focal loss.

Case list: 4 image paths + 1 seg path per case (txt format).
"""
from easydict import EasyDict as edict
from segmentation3d.utils.normalizer import AdaptiveNormalizer

__C = edict()
cfg = __C

__C.general = edict()
__C.general.imseg_list = "/data/brats/train.txt"
__C.general.save_dir = "/models/brats"
__C.general.resume_epoch = -1
__C.general.num_gpus = 1
__C.general.seed = 0

__C.dataset = edict()
__C.dataset.num_modality = 4                  # e.g. T1, T1ce, T2, FLAIR
__C.dataset.num_classes = 4
__C.dataset.spacing = [1.0, 1.0, 1.0]
__C.dataset.crop_size = [128, 128, 128]
__C.dataset.sampling_method = "MASK"          # tumor-centered crops
__C.dataset.random_translation = [8.0, 8.0, 8.0]
__C.dataset.interpolation = "LINEAR"
# MR intensities are scanner-dependent: percentile-window per modality
__C.dataset.crop_normalizers = [
    AdaptiveNormalizer(min_p=0.001, max_p=0.999, clip=True) for _ in range(4)]
__C.dataset.random_flip = True

__C.loss = edict()
__C.loss.name = "Focal"                       # class imbalance
__C.loss.obj_weight = None
__C.loss.focal_obj_alpha = [0.25, 0.75, 0.75, 0.75]
__C.loss.focal_gamma = 2.0

__C.net = edict()
__C.net.name = "vnet"

__C.train = edict()
__C.train.epochs = 2000
__C.train.batchsize = 8
__C.train.num_threads = 2
__C.train.lr = 1e-4
__C.train.betas = (0.9, 0.999)
__C.train.save_epochs = 200

__C.debug = edict()
__C.debug.save_inputs = False

__C.tpu = edict()
__C.tpu.dtype = "bfloat16"
__C.tpu.conv_backend = "packed_domain"
__C.tpu.remat = True
