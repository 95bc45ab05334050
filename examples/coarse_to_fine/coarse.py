"""Coarse pass of the two-pass workflow: a low-resolution whole-volume
localizer. CENTER sampling at a large crop at 4 mm spacing sees (almost)
the whole volume every step.

Train both passes, then infer in one shot:
    seg_infer -i case.nii.gz -m /models/organ_coarse \
              --fine_model /models/organ_fine -o out/
(283 volumes/min/chip measured for the full two-pass 512^3 pipeline —
docs/PERFORMANCE.md.)
"""
from easydict import EasyDict as edict
from segmentation3d.utils.normalizer import FixedNormalizer

__C = edict()
cfg = __C

__C.general = edict()
__C.general.imseg_list = "/data/organ/train.txt"
__C.general.save_dir = "/models/organ_coarse"
__C.general.resume_epoch = -1
__C.general.num_gpus = 1
__C.general.seed = 0

__C.dataset = edict()
__C.dataset.num_modality = 1
__C.dataset.num_classes = 2
__C.dataset.spacing = [4.0, 4.0, 4.0]        # coarse: whole volume in one crop
__C.dataset.crop_size = [128, 128, 128]      # 512 mm field of view
__C.dataset.sampling_method = "CENTER"
__C.dataset.random_translation = [16.0, 16.0, 16.0]
__C.dataset.interpolation = "LINEAR"
__C.dataset.crop_normalizers = [FixedNormalizer(mean=-400.0, stddev=600.0, clip=True)]

__C.loss = edict()
__C.loss.name = "Dice"
__C.loss.obj_weight = None
__C.loss.focal_obj_alpha = 0.25
__C.loss.focal_gamma = 2.0

__C.net = edict()
__C.net.name = "vnet"

__C.train = edict()
__C.train.epochs = 1000
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
