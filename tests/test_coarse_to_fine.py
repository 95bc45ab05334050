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
def c2f_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("c2f")
    data = root / "data"
    cases = [make_sphere_case(str(data), f"case{i}", shape_zyx=(48, 48, 48), seed=i)
             for i in range(2)]
    lst = make_train_list(str(root / "train.txt"), cases)
    save_dir = str(root / "model")
    cfg = write_train_config(
        str(root / "config.py"), lst, save_dir,
        crop_size=(32, 32, 32), epochs=40, batchsize=2, lr=3e-3,
        save_epochs=20, sampling_method="CENTER",
        extra="__C.net.base_channels = 4\n")
    from segmentation3d_tpu.core.seg_train import train
    train(cfg)
    return root, cases, save_dir


def test_roi_from_mask():
    from segmentation3d_tpu.core.coarse_to_fine import roi_from_mask
    from segmentation3d_tpu.ops.geometry import Frame
    mask = np.zeros((20, 20, 20), np.uint8)
    mask[5:10, 6:11, 7:12] = 1
    frame = Frame.identity(spacing=(2.0, 2.0, 2.0))
    lo, hi = roi_from_mask(mask, frame, margin_mm=4.0)
    np.testing.assert_allclose(lo, [7 * 2 - 4, 6 * 2 - 4, 5 * 2 - 4])
    np.testing.assert_allclose(hi, [11 * 2 + 4, 10 * 2 + 4, 9 * 2 + 4])
    assert roi_from_mask(np.zeros((4, 4, 4)), frame) is None


def test_coarse_to_fine_pipeline(c2f_setup):
    """Same model as coarse+fine: the two-pass pipeline must reproduce the
    sphere with good Dice and correct output layout."""
    root, cases, save_dir = c2f_setup
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    from segmentation3d_tpu.io import read_image
    out = str(root / "out")
    results = segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, out, seg_name="seg.nii.gz",
        partition_size=(32, 32, 32), batch_size=1, margin_mm=8.0)
    assert len(results) == 1
    pred = read_image(os.path.join(out, results[0][0], "seg.nii.gz"))
    truth = read_image(cases[0][1])
    assert pred.data.shape == truth.data.shape
    d = _dice(pred.data, truth.data)
    assert d >= 0.85, f"coarse-to-fine Dice {d:.3f}"


def test_coarse_to_fine_cli(c2f_setup):
    root, cases, save_dir = c2f_setup
    from segmentation3d_tpu.cli.seg_infer import main
    out = str(root / "out_cli")
    main(["-i", cases[1][0][0], "-m", save_dir, "--fine_model", save_dir,
          "-o", out, "-n", "seg.nii.gz",
          "--partition_size", "32", "32", "32", "--batch_size", "1"])
    sub = os.listdir(out)
    assert len(sub) == 1
    assert os.path.isfile(os.path.join(out, sub[0], "seg.nii.gz"))


def test_corrupt_case_skipped(tmp_path):
    """One unreadable case must not abort a coarse-to-fine batch run."""
    import numpy as np
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from phantoms import make_sphere_case, make_train_list, write_train_config
    from segmentation3d_tpu.core.seg_train import train

    data = tmp_path / "data"
    cases = [make_sphere_case(str(data), f"c{i}", shape_zyx=(32, 32, 32),
                              seed=i) for i in range(2)]
    lst = make_train_list(str(tmp_path / "list.txt"), cases)
    model = str(tmp_path / "model")
    cfg = write_train_config(str(tmp_path / "cfg.py"), lst, model,
                             crop_size=(32, 32, 32), epochs=2, batchsize=2,
                             save_epochs=2)
    train(cfg)

    bad = tmp_path / "in" / "bad.nii.gz"
    bad.parent.mkdir()
    bad.write_bytes(b"not a nifti file")
    import shutil
    shutil.copy(cases[0][0][0], tmp_path / "in" / "good.nii.gz")

    out = str(tmp_path / "out")
    results = segmentation_coarse_to_fine(
        str(tmp_path / "in"), model, model, out, seg_name="seg.nii.gz",
        partition_size=(32, 32, 32))
    assert [r[0] for r in results] == ["good"]
    assert os.path.isfile(os.path.join(out, "good", "seg.nii.gz"))


def test_c2f_session_reuse(c2f_setup):
    """Repeat coarse-to-fine calls with the same models/options reuse the
    built session (models + fine inferer + coarse program cache) — the
    round-3 session cache that avoids per-call retrace/recompile."""
    root, cases, save_dir = c2f_setup
    from segmentation3d_tpu.core import coarse_to_fine as c2f
    c2f._C2F_SESSIONS.clear()
    kwargs = dict(seg_name="seg.nii.gz", partition_size=(32, 32, 32),
                  batch_size=1, margin_mm=8.0)
    c2f.segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, str(root / "sr1"), **kwargs)
    assert len(c2f._C2F_SESSIONS) == 1
    (key, sess), = c2f._C2F_SESSIONS.items()
    coarse1, inferer1 = sess["coarse"], sess["fine_inferer"]
    c2f.segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, str(root / "sr2"), **kwargs)
    assert len(c2f._C2F_SESSIONS) == 1
    assert c2f._C2F_SESSIONS[key]["coarse"] is coarse1
    assert c2f._C2F_SESSIONS[key]["fine_inferer"] is inferer1
    c2f._C2F_SESSIONS.clear()


def test_quant_misconfiguration_raises(c2f_setup):
    """quant='int8' without bf16-on-TPU must raise, not silently run the
    full-precision forward (the round-2 silent-fallback lesson)."""
    root, cases, save_dir = c2f_setup
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    with pytest.raises(ValueError, match="quant"):
        segmentation_coarse_to_fine(
            input_path=cases[0][0][0], coarse_model_dir=save_dir,
            fine_model_dir=save_dir, output_dir=str(root / "q8"),
            partition_size=(16, 16, 16), quant="int8")


def test_calib_without_quant_raises(c2f_setup):
    """--int8_calib is only meaningful with --int8; passing it alone must
    raise (mirrors segmentation()'s check) instead of being ignored."""
    root, cases, save_dir = c2f_setup
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    with pytest.raises(ValueError, match="calib_image"):
        segmentation_coarse_to_fine(
            input_path=cases[0][0][0], coarse_model_dir=save_dir,
            fine_model_dir=save_dir, output_dir=str(root / "cal"),
            partition_size=(16, 16, 16), calib_image=cases[0][0][0])
