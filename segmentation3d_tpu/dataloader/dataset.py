"""Patch-sampling dataset — device-side crop/normalize/augment pipeline.

Re-implements ``segmentation3d/dataloader/dataset.py`` (case-list readers
``read_train_txt``/``read_train_csv`` ≈L10-45 and ``SegmentationDataset``
≈L50-200) with a TPU-first split of responsibilities:

- the **host** only does file -> numpy array (volumes are cached in RAM) and
  picks crop centers (GLOBAL / MASK / CENTER / MIX sampling + world-space
  ``random_translation`` jitter, exactly the reference's per-item logic);
- the **device** does the hot work the reference burned DataLoader workers
  on: fixed-spacing trilinear/NN crop-resample, per-modality normalization
  and (optional) axis-flip augmentation, all jitted XLA ops
  (:mod:`segmentation3d_tpu.ops.resample`).

Behavioral contracts kept from the reference (SURVEY.md §3.5): crops are
taken at fixed world spacing regardless of native spacing; seg crops use NN
interpolation; normalizers are per-modality; each item returns
``(image[D,H,W,C], seg[D,H,W], frame, name)``.
"""
from __future__ import annotations

import csv as _csv
import os

import numpy as np

from segmentation3d_tpu.io import read_image
from segmentation3d_tpu.ops.geometry import Frame
from segmentation3d_tpu.ops.resample import crop_at_world_center, LINEAR, NN

GLOBAL, MASK, CENTER, MIX = "GLOBAL", "MASK", "CENTER", "MIX"


def read_train_txt(path):
    """txt format: line 0 = case count; then per case ``num_modality`` image
    paths followed by one segmentation path (one path per line)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    num_cases = int(lines[0])
    body = lines[1:]
    if len(body) % num_cases != 0:
        raise ValueError(f"{path}: {len(body)} paths not divisible by {num_cases} cases")
    per_case = len(body) // num_cases
    num_modality = per_case - 1
    ims, segs = [], []
    for i in range(num_cases):
        chunk = body[i * per_case:(i + 1) * per_case]
        ims.append(chunk[:num_modality])
        segs.append(chunk[num_modality])
    return ims, segs


def read_train_csv(path):
    """csv format: header ``image_path,segmentation_path`` (multi-modality:
    several image columns, segmentation last)."""
    ims, segs = [], []
    with open(path, newline="") as f:
        reader = _csv.reader(f)
        header = next(reader)
        for row in reader:
            row = [c.strip() for c in row if c.strip()]
            if not row:
                continue
            ims.append(row[:-1])
            segs.append(row[-1])
    return ims, segs


class _Case:
    """Lazy-loaded, RAM-cached case: modality volumes + seg + sampling aux.

    ``stage(budget)`` additionally keeps the voxel arrays device-resident
    (HBM) so per-step crops skip the host->device upload — through the axon
    relay that upload dominates step time otherwise.
    """

    __slots__ = ("im_paths", "seg_path", "images", "seg", "fg_indices", "name",
                 "dev_images", "dev_seg", "nbytes")

    def __init__(self, im_paths, seg_path):
        self.im_paths = list(im_paths)
        self.seg_path = seg_path
        self.images = None
        self.seg = None
        self.fg_indices = None
        self.dev_images = None
        self.dev_seg = None
        self.nbytes = 0
        base = os.path.basename(im_paths[0])
        for suf in (".nii.gz", ".nii", ".mha", ".mhd", ".nrrd", ".nhdr"):
            if base.endswith(suf):
                base = base[: -len(suf)]
                break
        self.name = os.path.basename(os.path.dirname(im_paths[0])) or base

    def load(self):
        if self.images is None:
            self.images = [read_image(p, dtype=np.float32) for p in self.im_paths]
            self.seg = read_image(self.seg_path)
            if not np.issubdtype(self.seg.data.dtype, np.integer):
                self.seg.data = np.rint(self.seg.data).astype(np.int32)
            fg = np.nonzero(self.seg.data > 0)
            self.fg_indices = np.stack(fg, axis=-1) if fg[0].size else None
            self.nbytes = (sum(v.data.nbytes for v in self.images)
                           + self.seg.data.nbytes)
        return self

    def stage(self, budget: list) -> tuple:
        """Return (image_arrays, seg_array) for cropping — device-resident
        when they fit the remaining ``budget[0]`` bytes."""
        if self.dev_images is not None:
            return self.dev_images, self.dev_seg
        if budget[0] >= self.nbytes:
            import jax.numpy as jnp
            self.dev_images = [jnp.asarray(v.data) for v in self.images]
            self.dev_seg = jnp.asarray(self.seg.data.astype(np.int32))
            budget[0] -= self.nbytes
            return self.dev_images, self.dev_seg
        return [v.data for v in self.images], self.seg.data.astype(np.int32)


class SegmentationDataset:
    """Reference-parity patch sampler with device-side cropping."""

    def __init__(self, imseg_list, num_classes, spacing, crop_size,
                 sampling_method=CENTER, random_translation=(0, 0, 0),
                 interpolation=LINEAR, crop_normalizers=None,
                 random_flip=False, seed=0, device_cache_gb=2.0,
                 random_rot90=False, random_intensity_scale=None,
                 random_intensity_shift=None, random_noise_std=0.0,
                 random_elastic_magnitude=0.0, random_elastic_grid=4,
                 random_elastic_prob=1.0):
        if isinstance(imseg_list, str):
            if imseg_list.endswith(".csv"):
                ims, segs = read_train_csv(imseg_list)
            else:
                ims, segs = read_train_txt(imseg_list)
        else:
            ims, segs = imseg_list
        self.cases = [_Case(i, s) for i, s in zip(ims, segs)]
        self.num_classes = int(num_classes)
        self.spacing = np.asarray(spacing, np.float64)
        self.crop_size = np.asarray(crop_size, np.int64)
        assert sampling_method in (GLOBAL, MASK, CENTER, MIX), sampling_method
        self.sampling_method = sampling_method
        self.random_translation = np.asarray(random_translation, np.float64)
        self.interpolation = interpolation
        self.crop_normalizers = crop_normalizers
        self.random_flip = bool(random_flip)
        # ADDITIVE augmentations beyond the reference's flip (all device-
        # side, XLA-program-count-bounded): in-plane k*90° rotations (needs
        # a square y/x crop), multiplicative/additive intensity jitter of
        # the NORMALIZED image, and gaussian noise. Random draws are passed
        # as device ARRAYS / PRNG keys, never baked as trace constants — a
        # fresh float constant per crop would recompile every step.
        self.random_rot90 = bool(random_rot90)
        if self.random_rot90 and crop_size[0] != crop_size[1]:
            raise ValueError(
                f"random_rot90 needs a square in-plane crop (x == y), got "
                f"crop_size {list(crop_size)}")
        self.random_intensity_scale = tuple(random_intensity_scale) \
            if random_intensity_scale else None
        self.random_intensity_shift = tuple(random_intensity_shift) \
            if random_intensity_shift else None
        self.random_noise_std = float(random_noise_std or 0.0)
        # elastic deformation (ops/elastic.py): coarse control-point
        # displacement grid in VOXELS, upsampled + gather-warped on device;
        # the random coefficients ride in as a device array (ONE compiled
        # warp program per crop shape)
        self.random_elastic_magnitude = float(random_elastic_magnitude or 0.0)
        self.random_elastic_grid = int(random_elastic_grid or 4)
        if self.random_elastic_magnitude > 0.0 and self.random_elastic_grid < 2:
            raise ValueError("random_elastic_grid must be >= 2")
        self.random_elastic_prob = float(random_elastic_prob
                                         if random_elastic_prob is not None
                                         else 1.0)
        self._noise_key = None
        if self.random_noise_std > 0.0:
            import jax
            self._noise_key = jax.random.PRNGKey(int(seed) + 7)
        self.rng = np.random.default_rng(seed)
        self.num_modality = len(ims[0]) if ims else 1
        # remaining HBM bytes allowed for device-resident source volumes
        self._dev_budget = [int(float(device_cache_gb) * 1e9)]

    def __len__(self):
        return len(self.cases)

    # ---- center selection (host, cheap) ------------------------------------
    def _select_center_world(self, case: _Case) -> np.ndarray:
        im = case.images[0]
        method = self.sampling_method
        if method == MIX:
            method = MASK if self.rng.random() < 0.5 else GLOBAL
        if method == CENTER:
            center = im.frame.voxel_center_world(im.size_xyz)
        elif method == MASK and case.fg_indices is not None:
            zyx = case.fg_indices[self.rng.integers(len(case.fg_indices))]
            center = case.seg.frame.index_to_world(zyx[::-1])
        else:  # GLOBAL (also MASK fallback on empty segmentation)
            idx = self.rng.uniform(0, im.size_xyz - 1)
            center = im.frame.index_to_world(idx)
        jitter = self.rng.uniform(-self.random_translation, self.random_translation)
        return np.asarray(center, np.float64) + jitter

    # ---- item assembly (device crops) --------------------------------------
    def __getitem__(self, idx: int):
        import jax.numpy as jnp

        case = self.cases[idx].load()
        center = self._select_center_world(case)
        img_arrays, seg_array = case.stage(self._dev_budget)
        crops = []
        crop_frame = None
        for mi, im in enumerate(case.images):
            crop, crop_frame = crop_at_world_center(
                img_arrays[mi], im.frame, center, self.crop_size, self.spacing,
                interp=self.interpolation)
            if self.crop_normalizers is not None and self.crop_normalizers[mi] is not None:
                crop = self.crop_normalizers[mi](crop)
            crops.append(crop)
        image = jnp.stack(crops, axis=-1)  # [D,H,W,C]
        seg, _ = crop_at_world_center(
            seg_array, case.seg.frame, center,
            self.crop_size, self.spacing, interp=NN)
        seg = jnp.clip(seg, 0, self.num_classes - 1)
        if self.random_flip:
            # axis flips are label-preserving for symmetric crop grids
            for ax in range(3):
                if self.rng.random() < 0.5:
                    image = jnp.flip(image, axis=ax)
                    seg = jnp.flip(seg, axis=ax)
        if self.random_rot90:
            # in-plane (y, x) k*90° rotation; k is a PYTHON branch (4
            # variants -> bounded program count, like the flips)
            k = int(self.rng.integers(4))
            if k:
                image = jnp.rot90(image, k, axes=(1, 2))
                seg = jnp.rot90(seg, k, axes=(1, 2))
        if self.random_elastic_magnitude > 0.0 \
                and self.rng.random() < self.random_elastic_prob:
            from segmentation3d_tpu.ops.elastic import elastic_warp
            g = self.random_elastic_grid
            disp = self.rng.normal(
                0.0, self.random_elastic_magnitude, (g, g, g, 3))
            image, seg = elastic_warp(image, seg,
                                      jnp.asarray(disp, jnp.float32))
        if self.random_intensity_scale is not None:
            lo, hi = self.random_intensity_scale
            image = image * jnp.asarray(self.rng.uniform(lo, hi),
                            jnp.float32)
        if self.random_intensity_shift is not None:
            lo, hi = self.random_intensity_shift
            image = image + jnp.asarray(self.rng.uniform(lo, hi),
                            jnp.float32)
        if self._noise_key is not None:
            import jax
            self._noise_key, sub = jax.random.split(self._noise_key)
            noise = jax.random.normal(sub, image.shape, image.dtype)
            image = image + noise * jnp.asarray(self.random_noise_std,
                                                jnp.float32)
        return image, seg, crop_frame, case.name

    def batch(self, indices):
        """Assemble a batch -> (images [B,D,H,W,C], segs [B,D,H,W], frames, names)."""
        import jax.numpy as jnp
        items = [self[i] for i in indices]
        images = jnp.stack([it[0] for it in items])
        segs = jnp.stack([it[1] for it in items])
        return images, segs, [it[2] for it in items], [it[3] for it in items]
