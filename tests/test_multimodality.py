"""4-channel BraTS-style acceptance (driver config #4, scaled down for CPU):
multi-modality training with adaptive normalization + multi-modality
inference through the txt case-list path."""
import os

import numpy as np
import pytest

from phantoms import make_sphere_case, make_train_list, write_train_config

import pytest as _pytest
pytestmark = _pytest.mark.slow  # expensive integration tier (VERDICT r4 #7)


def _dice(a, b):
    a, b = a > 0, b > 0
    return 2.0 * np.logical_and(a, b).sum() / max(a.sum() + b.sum(), 1)


@pytest.fixture(scope="module")
def mm_model(tmp_path_factory):
    root = tmp_path_factory.mktemp("mm")
    data = root / "data"
    cases = [make_sphere_case(str(data), f"case{i}", shape_zyx=(32, 32, 32),
                              seed=i, num_modality=4) for i in range(2)]
    lst = make_train_list(str(root / "train.txt"), cases)
    save_dir = str(root / "model")
    cfg = write_train_config(
        str(root / "config.py"), lst, save_dir, num_modality=4, num_classes=2,
        crop_size=(32, 32, 32), epochs=60, batchsize=2, lr=3e-3,
        save_epochs=30, sampling_method="CENTER",
        extra="__C.net.base_channels = 4\n")
    from segmentation3d_tpu.core.seg_train import train
    train(cfg)
    return root, cases, save_dir


def test_multimodality_checkpoint_metadata(mm_model):
    root, cases, save_dir = mm_model
    from segmentation3d_tpu.utils import model_io
    chk = model_io.latest_checkpoint(save_dir)
    payload = model_io.load_checkpoint_payload(chk)
    assert payload["in_channels"] == 4
    assert len(payload["crop_normalizers"]) == 4
    assert payload["crop_normalizers"][0]["type"] == 1  # adaptive


def test_multimodality_inference_via_txt(mm_model, tmp_path):
    root, cases, save_dir = mm_model
    # test txt: count line then 4 image paths per case
    lst = tmp_path / "test.txt"
    with open(lst, "w") as f:
        f.write("1\n" + "\n".join(cases[0][0]) + "\n")
    from segmentation3d_tpu.core.seg_infer import segmentation
    from segmentation3d_tpu.io import read_image
    out = str(tmp_path / "out")
    results = segmentation(str(lst), save_dir, out, seg_name="seg.nii.gz",
                           batch_size=1, shape_bucket=32)
    assert len(results) == 1
    pred = read_image(os.path.join(out, results[0][0], "seg.nii.gz"))
    truth = read_image(cases[0][1])
    d = _dice(pred.data, truth.data)
    assert d >= 0.85, f"4-mod Dice {d:.3f}"


def test_modalities_register_in_world_space(mm_model, tmp_path):
    """A modality whose native frame is shifted in world space must land
    registered on modality 0's iso grid (not be silently treated as if the
    grids coincided): channels of a world-shifted copy differ from the
    unshifted array, and shifting BACK by sampling reproduces alignment."""
    import jax.numpy as jnp
    from segmentation3d_tpu.core.seg_infer import (
        load_seg_model, segmentation_one_case, SlidingWindowInferer)
    from segmentation3d_tpu.io import Volume, read_image, write_image
    from segmentation3d_tpu.ops.geometry import Frame

    root, cases, save_dir = mm_model
    model = load_seg_model(save_dir)

    # modality 0 + three copies; copy #1 shifted 5 mm along z in world space
    v0 = read_image(cases[0][0][0])
    paths = [str(tmp_path / f"m{i}.nii.gz") for i in range(4)]
    write_image(v0, paths[0])
    shifted = Frame(origin=np.asarray(v0.frame.origin) + [0, 0, 5.0],
                    spacing=v0.frame.spacing, direction=v0.frame.direction)
    write_image(Volume(v0.data, shifted), paths[1])
    write_image(v0, paths[2])
    write_image(v0, paths[3])

    captured = {}
    inferer = SlidingWindowInferer(model.net, (32, 32, 32), 2, batch_size=1)
    orig_call = SlidingWindowInferer.__call__

    def spy(self, variables, vol, **kw):
        captured["vol"] = np.asarray(vol)
        return orig_call(self, variables, vol, **kw)

    SlidingWindowInferer.__call__ = spy
    try:
        segmentation_one_case(model, paths, inferer, shape_bucket=32)
    finally:
        SlidingWindowInferer.__call__ = orig_call

    vol = captured["vol"]
    # identical-frame copies == channel 0 exactly; the 5 mm-shifted one must
    # differ (its content slides 5 voxels at 1 mm spacing)
    np.testing.assert_array_equal(vol[..., 2], vol[..., 0])
    assert not np.allclose(vol[..., 1], vol[..., 0]), (
        "world-shifted modality was resampled onto its own grid — "
        "misregistration silently discarded")
    # interior agreement after shifting back by 5 voxels proves registration
    np.testing.assert_allclose(vol[5:-6, ..., 1], vol[:-11, ..., 0], atol=2e-2)


def test_modality_count_mismatch_raises(mm_model, tmp_path):
    root, cases, save_dir = mm_model
    from segmentation3d_tpu.core.seg_infer import segmentation
    with pytest.raises(AssertionError, match="modalities"):
        segmentation(cases[0][0][0], save_dir, str(tmp_path / "o"),
                     batch_size=1, shape_bucket=32)
