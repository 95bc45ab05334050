"""Evaluation metrics + seg_eval / seg_convert CLI tests (SURVEY.md §4:
the reference scores Dice externally; these are the first-party equivalents).
"""
import csv
import math
import os

import numpy as np
import pytest
from scipy import ndimage
from scipy.spatial.distance import cdist

from segmentation3d_tpu.io import Volume, write_image
from segmentation3d_tpu.ops.geometry import Frame
from segmentation3d_tpu.utils.metrics import (
    dice_coefficient, evaluate_masks, surface_distances)


def _ball(shape, center, r):
    z, y, x = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    return ((z - center[0]) ** 2 + (y - center[1]) ** 2
            + (x - center[2]) ** 2) < r ** 2


def test_dice_basics():
    a = np.zeros((4, 4, 4), bool)
    assert dice_coefficient(a, a) == 1.0  # both empty
    b = a.copy()
    b[0, 0, 0] = True
    assert dice_coefficient(a, b) == 0.0
    assert dice_coefficient(b, b) == 1.0
    c = np.zeros((4, 4, 4), bool)
    c[0, 0, :2] = True  # |P|=2, |G|=1, overlap 1 -> 2/3
    assert dice_coefficient(c, b) == pytest.approx(2 / 3)


def _brute_surface_distances(pred, gt, sp):
    struct = ndimage.generate_binary_structure(3, 1)

    def surf(m):
        return m & ~ndimage.binary_erosion(m, structure=struct, border_value=0)

    pc = np.argwhere(surf(pred)) * np.asarray(sp)
    gc = np.argwhere(surf(gt)) * np.asarray(sp)
    d = cdist(pc, gc)
    all_d = np.concatenate([d.min(1), d.min(0)])
    return float(all_d.mean()), float(np.percentile(all_d, 95))


def test_surface_distances_vs_bruteforce():
    rng = np.random.default_rng(0)
    pred = _ball((24, 24, 24), (12, 12, 12), 7)
    gt = _ball((24, 24, 24), (12, 13, 10), 6)
    for sp in [(1.0, 1.0, 1.0), (2.5, 0.8, 1.2)]:
        got = surface_distances(pred, gt, sp)
        want = _brute_surface_distances(pred, gt, sp)
        assert got[0] == pytest.approx(want[0], rel=1e-6)
        assert got[1] == pytest.approx(want[1], rel=1e-6)
    # identical masks -> exactly zero
    assert surface_distances(gt, gt, (1, 1, 1)) == (0.0, 0.0)
    # empty mask -> undefined
    assert all(math.isnan(v)
               for v in surface_distances(np.zeros_like(gt), gt, (1, 1, 1)))


def test_evaluate_masks_multiclass():
    gt = np.zeros((16, 16, 16), np.int64)
    gt[_ball(gt.shape, (8, 8, 8), 5)] = 1
    gt[_ball(gt.shape, (3, 3, 3), 2)] = 2
    pred = gt.copy()
    pred[_ball(gt.shape, (8, 8, 8), 4)] = 1  # no-op: subset already 1
    pred[gt == 2] = 0  # class 2 entirely missed
    res = evaluate_masks(pred, gt, spacing_zyx=(1, 1, 1), surface=True)
    assert set(res) == {1, 2}
    assert res[1]["dice"] == pytest.approx(1.0)
    assert res[1]["assd"] == 0.0
    assert res[2]["dice"] == 0.0
    assert math.isnan(res[2]["hd95"])
    with pytest.raises(ValueError, match="shape mismatch"):
        evaluate_masks(pred[:8], gt)


def _write_mask(path, data, spacing=(1.0, 1.0, 1.0)):
    write_image(Volume(data.astype(np.uint8), Frame.identity(spacing=spacing)),
                str(path))


def test_seg_eval_cli(tmp_path, capsys):
    from segmentation3d_tpu.cli.seg_eval import main
    gt = np.zeros((16, 16, 16), np.int64)
    gt[_ball(gt.shape, (8, 8, 8), 5)] = 1
    pred = np.zeros_like(gt)
    pred[_ball(gt.shape, (8, 8, 9), 5)] = 1
    _write_mask(tmp_path / "gt.nii.gz", gt)
    _write_mask(tmp_path / "pred.nii.gz", pred)

    main(["-p", str(tmp_path / "pred.nii.gz"), "-g", str(tmp_path / "gt.nii.gz")])
    out = capsys.readouterr().out
    assert "class 1: dice=" in out
    want = dice_coefficient(pred == 1, gt == 1)
    assert f"dice={want:.4f}" in out

    # csv-of-pairs mode with --surface and an output csv
    pairs = tmp_path / "pairs.csv"
    pairs.write_text("pred,gt\n"
                     f"{tmp_path/'pred.nii.gz'},{tmp_path/'gt.nii.gz'}\n"
                     f"{tmp_path/'gt.nii.gz'},{tmp_path/'gt.nii.gz'}\n")
    out_csv = tmp_path / "metrics.csv"
    main(["-i", str(pairs), "-o", str(out_csv), "--surface"])
    rows = list(csv.reader(open(out_csv)))
    assert rows[0] == ["pred", "gt", "class", "dice", "assd", "hd95"]
    assert len(rows) == 3
    assert float(rows[2][3]) == 1.0  # gt vs gt
    assert float(rows[2][4]) == 0.0
    assert "ALL (2 cases) class 1" in capsys.readouterr().out


def test_seg_eval_cli_per_case_isolation(tmp_path, capsys):
    from segmentation3d_tpu.cli.seg_eval import main
    gt = np.zeros((8, 8, 8), np.int64)
    gt[2:5, 2:5, 2:5] = 1
    _write_mask(tmp_path / "gt.nii.gz", gt)
    _write_mask(tmp_path / "pred.nii.gz", gt)
    pairs = tmp_path / "pairs.csv"
    pairs.write_text("pred,gt\n"
                     f"{tmp_path/'missing.nii.gz'},{tmp_path/'gt.nii.gz'}\n"
                     f"{tmp_path/'pred.nii.gz'},{tmp_path/'gt.nii.gz'}\n")
    with pytest.raises(SystemExit):
        main(["-i", str(pairs)])
    captured = capsys.readouterr()
    assert "FAILED" in captured.err
    assert "dice=1.0000" in captured.out  # the good case still ran


def test_seg_convert_cli(tmp_path):
    """Foreign torch checkpoint -> native layout; converted model loads
    without the positional importer and reproduces the torch forward."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from torch_vnet_ref import TorchVNet
    from segmentation3d_tpu.cli.seg_convert import main
    from segmentation3d_tpu.core.seg_infer import load_seg_model
    from segmentation3d_tpu.utils import model_io

    torch.manual_seed(2)
    tnet = TorchVNet(in_ch=1, out_ch=2, base=4).eval()
    payload = {
        "epoch_idx": 7, "batch_idx": 123, "net": "vnet", "max_stride": 16,
        "state_dict": tnet.state_dict(),
        "spacing": [1.0, 1.0, 1.0], "interpolation": "LINEAR",
        "in_channels": 1, "out_channels": 2,
        "crop_normalizers": [{"type": 0, "mean": 0.0, "stddev": 1.0,
                              "clip": True}],
        "net_kwargs": {"base_channels": 4},
    }
    chk = tmp_path / "refmodel" / "checkpoints" / "chk_7"
    chk.mkdir(parents=True)
    torch.save(payload, str(chk / "params.pth"))

    out_dir = tmp_path / "native"
    main(["-i", str(tmp_path / "refmodel"), "-o", str(out_dir)])

    out_chk = os.path.join(str(out_dir), "checkpoints", "chk_7")
    converted = model_io.load_checkpoint_payload(out_chk)
    assert "_kernel_layouts" in converted  # native self-describing layout
    assert converted["net_kwargs"] == {"base_channels": 4}

    model = load_seg_model(str(out_dir))
    assert model.epoch_idx == 7
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    ours = np.asarray(model.net.apply(model.variables, jnp.asarray(x),
                                      train=False))
    with torch.no_grad():
        theirs = tnet(torch.tensor(x.transpose(0, 4, 1, 2, 3)))
    theirs = theirs.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_seg_eval_csv_malformed_row_clear_error(tmp_path):
    """A row shorter than the pred/gt columns fails with a clear ValueError
    naming the row, not a bare IndexError."""
    from segmentation3d_tpu.cli.seg_eval import _read_pairs_csv
    p = tmp_path / "pairs.csv"
    p.write_text("case,pred,gt\ncase7\n")
    with pytest.raises(ValueError, match="case7"):
        _read_pairs_csv(str(p))
    # blank lines are fine
    p.write_text("pred,gt\na.nii,b.nii\n\n")
    assert _read_pairs_csv(str(p)) == [("a.nii", "b.nii")]
