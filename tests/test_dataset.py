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


def test_random_rot90(cases):
    """rot90 is label-preserving: the (image > threshold) sphere mask and
    the seg crop stay aligned under every drawn k."""
    ds = _make_ds(cases, "CENTER", random_rot90=True, seed=5)
    ds.random_translation = np.zeros(3)
    base = np.asarray(_make_ds(cases, "CENTER")[0][0])
    got_rotation = False
    for _ in range(8):
        image, seg, _, _ = ds[0]
        img, sg = np.asarray(image), np.asarray(seg)
        # image/seg alignment survives the rotation (sphere is bright)
        fg_from_img = img[..., 0] > 0.5  # normalized: sphere ~1, bg ~ -0.5
        agree = (fg_from_img == (sg > 0)).mean()
        assert agree > 0.95, agree
        if not np.allclose(img, base):
            got_rotation = True
    assert got_rotation
    # non-square in-plane crops are rejected loudly
    with pytest.raises(ValueError, match="square"):
        _, cs = cases
        SegmentationDataset(
            imseg_list=([c[0] for c in cs], [c[1] for c in cs]),
            num_classes=2, spacing=(1, 1, 1), crop_size=(16, 8, 16),
            random_rot90=True)


def test_intensity_and_noise_augs(cases):
    """Scale/shift/noise perturb the image, never the seg; draws vary
    between items; augmentation stays off by default."""
    kw = dict(random_intensity_scale=(0.8, 1.2),
              random_intensity_shift=(-0.2, 0.2), random_noise_std=0.05)
    ds = _make_ds(cases, "CENTER", seed=11, **kw)
    ds.random_translation = np.zeros(3)
    ref_ds = _make_ds(cases, "CENTER")
    ref_ds.random_translation = np.zeros(3)
    ref_img, ref_seg = (np.asarray(a) for a in ref_ds[0][:2])
    a1, s1 = (np.asarray(v) for v in ds[0][:2])
    a2, s2 = (np.asarray(v) for v in ds[0][:2])
    np.testing.assert_array_equal(s1, ref_seg)  # labels untouched
    np.testing.assert_array_equal(s2, ref_seg)
    assert not np.allclose(a1, ref_img)
    assert not np.allclose(a1, a2)  # fresh draws per item
    # bounded perturbation: correlation with the clean crop stays high
    c = np.corrcoef(a1.reshape(-1), ref_img.reshape(-1))[0, 1]
    assert c > 0.95, c


def test_elastic_warp_identity_and_shift():
    """ops.elastic.elastic_warp: zero displacement is the identity; a
    constant integer displacement is an exact (edge-clamped) shift for
    BOTH image and labels — image/label consistency by construction."""
    import jax.numpy as jnp
    from segmentation3d_tpu.ops.elastic import elastic_warp
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(12, 12, 12, 2)), jnp.float32)
    seg = jnp.asarray(rng.integers(0, 3, (12, 12, 12)), jnp.int32)
    wi, ws = elastic_warp(img, seg, jnp.zeros((4, 4, 4, 3), jnp.float32))
    np.testing.assert_allclose(np.asarray(wi), np.asarray(img), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ws), np.asarray(seg))
    # constant displacement +2 voxels along z: out[z] = in[z+2] (clamped)
    disp = jnp.zeros((4, 4, 4, 3), jnp.float32).at[..., 0].set(2.0)
    wi, ws = elastic_warp(img, seg, disp)
    np.testing.assert_allclose(np.asarray(wi)[:10], np.asarray(img)[2:],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ws)[:10], np.asarray(seg)[2:])
    np.testing.assert_array_equal(np.asarray(ws)[10:],
                                  np.asarray(seg)[11:][[0, 0]])


def test_elastic_warp_determinism_and_smoothness():
    """Same displacement -> identical output; a random field changes the
    crop but keeps labels in the valid set and structures mostly intact."""
    import jax.numpy as jnp
    from segmentation3d_tpu.ops.elastic import elastic_warp
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(16, 16, 16, 1)), jnp.float32)
    seg = jnp.asarray((rng.random((16, 16, 16)) > 0.5), jnp.int32)
    disp = jnp.asarray(rng.normal(0, 1.5, (4, 4, 4, 3)), jnp.float32)
    a1 = elastic_warp(img, seg, disp)
    a2 = elastic_warp(img, seg, disp)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
    assert not np.allclose(np.asarray(a1[0]), np.asarray(img))
    assert set(np.unique(np.asarray(a1[1]))) <= {0, 1}


def test_elastic_dataset_wiring(cases):
    """random_elastic_magnitude warps image AND seg consistently (the
    sphere moves in both), off by default, and label values stay valid."""
    ds = _make_ds(cases, "CENTER", seed=3, random_elastic_magnitude=2.0,
                  random_elastic_grid=4)
    ds.random_translation = np.zeros(3)
    ref = _make_ds(cases, "CENTER")
    ref.random_translation = np.zeros(3)
    ref_img, ref_seg = (np.asarray(v) for v in ref[0][:2])
    img, seg = (np.asarray(v) for v in ds[0][:2])
    assert img.shape == ref_img.shape and seg.shape == ref_seg.shape
    assert not np.array_equal(seg, ref_seg)  # the label field moved too
    assert set(np.unique(seg)) <= {0, 1}
    # the warped foreground stays the same object: voxel count within 30%
    assert 0.7 < seg.sum() / max(ref_seg.sum(), 1) < 1.3
    # prob=0 disables
    ds0 = _make_ds(cases, "CENTER", seed=3, random_elastic_magnitude=2.0,
                   random_elastic_prob=0.0)
    ds0.random_translation = np.zeros(3)
    img0, seg0 = (np.asarray(v) for v in ds0[0][:2])
    np.testing.assert_array_equal(seg0, ref_seg)


@pytest.mark.slow
def test_aug_config_wiring(tmp_path):
    """cfg.dataset.random_rot90/... reach the dataset through train()'s
    construction (smoke: 2 epochs with every augmentation on)."""
    import os
    from phantoms import write_train_config
    d = tmp_path / "data"
    cs = [make_sphere_case(str(d), f"c{i}", shape_zyx=(32, 32, 32), seed=i)
          for i in range(2)]
    lst = make_train_list(str(tmp_path / "t.txt"), cs)
    cfg = write_train_config(
        str(tmp_path / "cfg.py"), lst, str(tmp_path / "model"),
        crop_size=(32, 32, 32), epochs=2, batchsize=2, save_epochs=2,
        extra=("__C.net.base_channels = 2\n"
               "__C.dataset.random_flip = True\n"
               "__C.dataset.random_rot90 = True\n"
               "__C.dataset.random_intensity_scale = (0.9, 1.1)\n"
               "__C.dataset.random_intensity_shift = (-0.1, 0.1)\n"
               "__C.dataset.random_noise_std = 0.02\n"
               "__C.dataset.random_elastic_magnitude = 1.5\n"
               "__C.dataset.random_elastic_grid = 4\n"
               "__C.dataset.random_elastic_prob = 0.5\n"))
    from segmentation3d_tpu.core.seg_train import train
    train(cfg)
    assert os.path.isdir(os.path.join(str(tmp_path / "model"),
                                      "checkpoints", "chk_2"))
