"""CT organ segmentation, single modality, 2 classes.

The TPU fast path: bfloat16 + packed-domain convs (62.4 patches/sec at
96^3 / batch 8 on one v5e — docs/PERFORMANCE.md).
"""
from easydict import EasyDict as edict
from segmentation3d.utils.normalizer import FixedNormalizer

__C = edict()
cfg = __C

__C.general = edict()
__C.general.imseg_list = "/data/ct/train.txt"
__C.general.save_dir = "/models/ct_organ"
__C.general.resume_epoch = -1
__C.general.num_gpus = 1
__C.general.seed = 0

__C.dataset = edict()
__C.dataset.num_modality = 1
__C.dataset.num_classes = 2
__C.dataset.spacing = [1.0, 1.0, 1.0]
__C.dataset.crop_size = [96, 96, 96]
__C.dataset.sampling_method = "MIX"          # 50/50 global / foreground
__C.dataset.random_translation = [5.0, 5.0, 5.0]
__C.dataset.interpolation = "LINEAR"
# soft-tissue window: (x - (-400)) / 600, clipped to [-1, 1]
__C.dataset.crop_normalizers = [FixedNormalizer(mean=-400.0, stddev=600.0, clip=True)]
__C.dataset.random_flip = True

__C.loss = edict()
__C.loss.name = "Dice"
__C.loss.obj_weight = None
__C.loss.focal_obj_alpha = 0.25
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
__C.tpu.mesh = edict()
__C.tpu.mesh.data = -1                       # all local devices
