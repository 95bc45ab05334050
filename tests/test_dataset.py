import numpy as np
import pytest

from segmentation3d_tpu.dataloader import (
    SegmentationDataset, EpochConcateSampler, read_train_txt, read_train_csv,
)
from phantoms import make_sphere_case, make_train_list


@pytest.fixture(scope="module")
def cases(tmp_path_factory):
    d = tmp_path_factory.mktemp("cases")
    return d, [make_sphere_case(str(d), f"case{i}", seed=i) for i in range(3)]


def test_read_train_txt(tmp_path, cases):
    _, cs = cases
    lst = make_train_list(str(tmp_path / "list.txt"), cs)
    ims, segs = read_train_txt(lst)
    assert len(ims) == 3 and len(segs) == 3
    assert len(ims[0]) == 1


def test_read_train_csv(tmp_path, cases):
    _, cs = cases
    p = tmp_path / "list.csv"
    with open(p, "w") as f:
        f.write("image_path,segmentation_path\n")
        for img_paths, seg in cs:
            f.write(f"{img_paths[0]},{seg}\n")
    ims, segs = read_train_csv(str(p))
    assert len(ims) == 3 and len(ims[0]) == 1


def test_sampler_epoch_semantics():
    s = EpochConcateSampler(5, 3, seed=1)
    idx = list(s)
    assert len(s) == 15 and len(idx) == 15
    for e in range(3):
        assert sorted(idx[e * 5:(e + 1) * 5]) == [0, 1, 2, 3, 4]
    # shuffled differently across epochs (with overwhelming probability)
    assert idx[:5] != idx[5:10] or idx[5:10] != idx[10:15]


def _make_ds(cases, method, **kw):
    _, cs = cases
    ims = [c[0] for c in cs]
    segs = [c[1] for c in cs]
    from segmentation3d_tpu.utils.normalizer import FixedNormalizer
    return SegmentationDataset(
        imseg_list=(ims, segs), num_classes=2, spacing=(1, 1, 1),
        crop_size=(16, 16, 16), sampling_method=method,
        random_translation=(1, 1, 1),
        crop_normalizers=[FixedNormalizer(0.0, 200.0)], **kw)


@pytest.mark.parametrize("method", ["GLOBAL", "MASK", "CENTER", "MIX"])
def test_getitem_shapes(cases, method):
    ds = _make_ds(cases, method)
    image, seg, frame, name = ds[0]
    assert image.shape == (16, 16, 16, 1)
    assert seg.shape == (16, 16, 16)
    assert np.asarray(seg).max() <= 1
    assert name == "case0_mod0" or isinstance(name, str)


def test_mask_sampling_hits_foreground(cases):
    ds = _make_ds(cases, "MASK")
    ds.random_translation = np.zeros(3)
    image, seg, _, _ = ds[0]
    # center voxel of a MASK-sampled crop is a foreground voxel (no jitter)
    assert np.asarray(seg)[8, 8, 8] == 1


def test_batch_assembly(cases):
    ds = _make_ds(cases, "CENTER")
    images, segs, frames, names = ds.batch([0, 1, 2])
    assert images.shape == (3, 16, 16, 16, 1)
    assert segs.shape == (3, 16, 16, 16)
    assert len(frames) == 3 and len(names) == 3


def test_random_flip(cases):
    ds = _make_ds(cases, "CENTER", random_flip=True, seed=3)
    outs = [np.asarray(ds[0][0]) for _ in range(6)]
    assert any(not np.allclose(outs[0], o) for o in outs[1:])
