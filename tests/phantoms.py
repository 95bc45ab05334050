"""Synthetic phantom generation for end-to-end tests (SURVEY.md §4)."""
import os

import numpy as np

from segmentation3d_tpu.io import Volume, write_image
from segmentation3d_tpu.ops.geometry import Frame


def make_sphere_case(path_dir, name, shape_zyx=(32, 32, 32), spacing=(1, 1, 1),
                     radius_frac=0.3, center_jitter=0.15, intensity=(200.0, -100.0),
                     noise=5.0, seed=0, num_modality=1):
    """A noisy sphere on a darker background + its label mask; returns
    (image_paths, seg_path)."""
    rng = np.random.default_rng(seed)
    shape = np.asarray(shape_zyx)
    center = shape / 2.0 + rng.uniform(-center_jitter, center_jitter, 3) * shape
    radius = radius_frac * shape.min()
    z, y, x = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    d2 = ((z - center[0]) ** 2 + (y - center[1]) ** 2 + (x - center[2]) ** 2)
    seg = (d2 < radius ** 2).astype(np.uint8)
    frame = Frame.identity(spacing=spacing)
    os.makedirs(path_dir, exist_ok=True)
    img_paths = []
    for m in range(num_modality):
        img = np.where(seg > 0, intensity[0] + 20.0 * m, intensity[1]).astype(np.float32)
        img += rng.normal(0, noise, img.shape).astype(np.float32)
        p = os.path.join(path_dir, f"{name}_mod{m}.nii.gz")
        write_image(Volume(img, frame), p)
        img_paths.append(p)
    seg_path = os.path.join(path_dir, f"{name}_seg.nii.gz")
    write_image(Volume(seg, frame), seg_path)
    return img_paths, seg_path


def make_train_list(path, cases):
    """Write the reference txt case-list format."""
    lines = [str(len(cases))]
    for img_paths, seg_path in cases:
        lines.extend(img_paths)
        lines.append(seg_path)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def write_train_config(path, imseg_list, save_dir, num_modality=1, num_classes=2,
                       crop_size=(32, 32, 32), epochs=10, batchsize=2,
                       loss_name="Dice", lr=1e-3, save_epochs=10,
                       sampling_method="CENTER", extra=""):
    """Emit a python config file exercising the reference config format."""
    norms = ", ".join(
        ["AdaptiveNormalizer(min_p=0.001, max_p=0.999, clip=True)"] * num_modality)
    text = f'''
from easydict import EasyDict as edict
from segmentation3d.utils.normalizer import FixedNormalizer, AdaptiveNormalizer

__C = edict()
cfg = __C

__C.general = edict()
__C.general.imseg_list = r"{imseg_list}"
__C.general.save_dir = r"{save_dir}"
__C.general.resume_epoch = -1
__C.general.num_gpus = 1
__C.general.seed = 0

__C.dataset = edict()
__C.dataset.num_modality = {num_modality}
__C.dataset.num_classes = {num_classes}
__C.dataset.spacing = [1.0, 1.0, 1.0]
__C.dataset.crop_size = {list(crop_size)}
__C.dataset.sampling_method = "{sampling_method}"
__C.dataset.random_translation = [2.0, 2.0, 2.0]
__C.dataset.interpolation = "LINEAR"
__C.dataset.crop_normalizers = [{norms}]

__C.loss = edict()
__C.loss.name = "{loss_name}"
__C.loss.obj_weight = None
__C.loss.focal_obj_alpha = 0.25
__C.loss.focal_gamma = 2.0

__C.net = edict()
__C.net.name = "vnet"

__C.train = edict()
__C.train.epochs = {epochs}
__C.train.batchsize = {batchsize}
__C.train.num_threads = 1
__C.train.lr = {lr}
__C.train.betas = (0.9, 0.999)
__C.train.save_epochs = {save_epochs}

__C.debug = edict()
__C.debug.save_inputs = False
{extra}
'''
    with open(path, "w") as f:
        f.write(text)
    return path
