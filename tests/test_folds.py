"""K-fold cross-validation management (core/folds.py, seg_train --folds)."""
import os

import numpy as np
import pytest

from segmentation3d_tpu.core.folds import prepare_fold, split_folds
from phantoms import make_sphere_case, make_train_list, write_train_config


def test_split_folds_deterministic_partition():
    a = split_folds(10, 3, seed=4)
    b = split_folds(10, 3, seed=4)
    assert a == b
    # a PARTITION: disjoint, covering, sizes within 1
    flat = sorted(i for f in a for i in f)
    assert flat == list(range(10))
    sizes = [len(f) for f in a]
    assert max(sizes) - min(sizes) <= 1
    assert split_folds(10, 3, seed=5) != a  # seed moves the split
    with pytest.raises(ValueError, match="folds"):
        split_folds(10, 1)
    with pytest.raises(ValueError, match="split"):
        split_folds(2, 3)


def test_prepare_fold_artifacts(tmp_path):
    """prepare_fold writes reference-format fold lists + a wrapper config
    that load_config resolves with the overridden fields."""
    from segmentation3d_tpu.dataloader.dataset import read_train_txt
    from segmentation3d_tpu.utils.file_io import load_config
    d = tmp_path / "data"
    cases = [make_sphere_case(str(d), f"c{i}", shape_zyx=(16, 16, 16), seed=i)
             for i in range(5)]
    lst = make_train_list(str(tmp_path / "all.txt"), cases)
    cfg_path = write_train_config(str(tmp_path / "cfg.py"), lst,
                                  str(tmp_path / "model"))
    wrappers = [prepare_fold(cfg_path, 5, k) for k in range(5)]
    seen_val = []
    for k, w in enumerate(wrappers):
        cfg = load_config(w)
        assert cfg.general.save_dir == str(tmp_path / "model") + f"_fold{k}"
        tr_i, tr_s = read_train_txt(cfg.general.imseg_list)
        va_i, va_s = read_train_txt(cfg.train.val_list)
        assert len(tr_i) == 4 and len(va_i) == 1
        assert set(tr_s).isdisjoint(va_s)
        seen_val.extend(va_s)
        # untouched fields survive the wrapper
        assert cfg.dataset.num_classes == 2
    # across folds, every case is the val case exactly once
    assert sorted(seen_val) == sorted(c[1] for c in cases)
    with pytest.raises(ValueError, match="out of range"):
        prepare_fold(cfg_path, 5, 5)


@pytest.mark.slow
def test_folds_train_and_ensemble_e2e(tmp_path):
    """seg_train --folds 2 trains two models with per-fold validation;
    seg_infer ensembles them (the nnU-Net-style workflow end to end)."""
    from segmentation3d_tpu.cli.seg_train import main as train_main
    from segmentation3d_tpu.core.seg_infer import segmentation
    from segmentation3d_tpu.io import read_image
    d = tmp_path / "data"
    cases = [make_sphere_case(str(d), f"c{i}", shape_zyx=(32, 32, 32), seed=i)
             for i in range(4)]
    lst = make_train_list(str(tmp_path / "all.txt"), cases)
    save_dir = str(tmp_path / "model")
    cfg_path = write_train_config(
        str(tmp_path / "cfg.py"), lst, save_dir,
        crop_size=(32, 32, 32), epochs=60, batchsize=2, lr=3e-3,
        save_epochs=60, sampling_method="CENTER",
        extra="__C.net.base_channels = 4\n")
    train_main(["-i", cfg_path, "--folds", "2"])
    dirs = [f"{save_dir}_fold{k}" for k in range(2)]
    for fd in dirs:
        assert os.path.isdir(os.path.join(fd, "checkpoints", "chk_60")), fd
        assert os.path.isfile(os.path.join(fd, "val_dice.csv")), fd
    out = str(tmp_path / "out")
    results = segmentation(cases[0][0][0], dirs, out, seg_name="seg.nii.gz",
                           batch_size=1)
    pred = read_image(os.path.join(out, results[0][0], "seg.nii.gz")).data
    truth = read_image(cases[0][1]).data
    inter = np.logical_and(pred > 0, truth > 0).sum()
    dice = 2 * inter / max((pred > 0).sum() + (truth > 0).sum(), 1)
    assert dice >= 0.8, dice
