"""Coarse-to-fine production parity with the flat driver (round-4: the
batch driver shares segmentation()'s host machinery and feature surface —
save_prob, CC post-processing, per-model checkpoint selection, fine-fold
ensembles, device meshes; VERDICT round-3 item 1)."""
import inspect
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
def c2f_model(tmp_path_factory):
    """One tiny trained model with numeric AND best-val checkpoints."""
    root = tmp_path_factory.mktemp("c2fp")
    data = root / "data"
    cases = [make_sphere_case(str(data), f"case{i}", shape_zyx=(48, 48, 48),
                              seed=i) for i in range(3)]
    lst = make_train_list(str(root / "train.txt"), cases[:2])
    val = make_train_list(str(root / "val.txt"), cases[2:])
    save_dir = str(root / "model")
    cfg = write_train_config(
        str(root / "config.py"), lst, save_dir,
        crop_size=(32, 32, 32), epochs=40, batchsize=2, lr=3e-3,
        save_epochs=20, sampling_method="CENTER",
        extra=("__C.net.base_channels = 4\n"
               f"__C.train.val_list = r'{val}'\n"
               "__C.train.save_best = True\n"))
    from segmentation3d_tpu.core.seg_train import train
    train(cfg)
    return root, cases, save_dir


def test_feature_surface_matches_flat_driver():
    """Every engine-independent feature parameter of segmentation() is
    accepted by segmentation_coarse_to_fine (the feature-matrix contract:
    a reference user switching drivers finds the same surface)."""
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    shared = {"input_path", "output_dir", "seg_name", "save_image",
              "save_prob", "post_processing", "batch_size", "blend",
              "num_devices", "dtype", "quant", "act_clip", "calib_image",
              "tta", "partition_size", "partition_stride", "shape_bucket"}
    params = set(inspect.signature(segmentation_coarse_to_fine).parameters)
    missing = shared - params
    assert not missing, f"c2f driver missing flat-driver features: {missing}"
    # checkpoint selection exists per model (the flat driver's single
    # `checkpoint` is ambiguous between the two models)
    assert {"coarse_checkpoint", "fine_checkpoint"} <= params


def test_save_prob_and_post_processing(c2f_model):
    root, cases, save_dir = c2f_model
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    from segmentation3d_tpu.io import read_image
    out = str(root / "out_prob")
    results = segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, out, seg_name="seg.nii.gz",
        partition_size=(32, 32, 32), batch_size=1, margin_mm=8.0,
        save_prob=True, save_image=True,
        post_processing={"type": "largest_cc"})
    assert len(results) == 1
    case_dir = os.path.join(out, results[0][0])
    pred = read_image(os.path.join(case_dir, "seg.nii.gz"))
    truth = read_image(cases[0][1])
    assert pred.data.shape == truth.data.shape
    assert _dice(pred.data, truth.data) >= 0.85
    # largest-CC post-processing ran: exactly one connected component
    from scipy import ndimage
    _, n = ndimage.label(pred.data > 0)
    assert n == 1
    # per-class probability maps written, ROI-exact (prob_1 high inside)
    assert os.path.isfile(os.path.join(case_dir, "org.mha"))
    p1 = read_image(os.path.join(case_dir, "prob_1.mha")).data
    assert p1.shape == truth.data.shape
    assert float(p1[truth.data > 0].mean()) > 0.6
    p0 = read_image(os.path.join(case_dir, "prob_0.mha")).data
    assert float(p0[truth.data > 0].mean()) < 0.4
    # the prob maps are a valid DISTRIBUTION everywhere — including any
    # voxels outside the fine ROI grid, where the launch version's
    # resampler fill made every class read 0 (round-4 fix: background
    # resamples as p0-1 with the 1 added back)
    np.testing.assert_allclose(p0 + p1, 1.0, atol=0.05)
    assert float(p0[0, 0, 0]) > 0.5  # corner is background-dominated


def test_fine_ensemble_matches_single(c2f_model):
    """A fine-fold 'ensemble' of the SAME model twice must be voxel-exact
    with the single-model run (probability averaging identity)."""
    root, cases, save_dir = c2f_model
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    from segmentation3d_tpu.io import read_image
    kw = dict(seg_name="seg.nii.gz", partition_size=(32, 32, 32),
              batch_size=1, margin_mm=8.0)
    segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, str(root / "ens1"), **kw)
    segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, [save_dir, save_dir],
        str(root / "ens2"), **kw)
    a = read_image(os.path.join(str(root / "ens1"), "case0_mod0",
                                "seg.nii.gz")).data
    b = read_image(os.path.join(str(root / "ens2"), "case0_mod0",
                                "seg.nii.gz")).data
    np.testing.assert_array_equal(a, b)


def test_checkpoint_selection(c2f_model):
    root, cases, save_dir = c2f_model
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    from segmentation3d_tpu.io import read_image
    out = str(root / "out_ck")
    results = segmentation_coarse_to_fine(
        cases[1][0][0], save_dir, save_dir, out, seg_name="seg.nii.gz",
        partition_size=(32, 32, 32), batch_size=1, margin_mm=8.0,
        coarse_checkpoint=20, fine_checkpoint="best")
    assert len(results) == 1
    truth = read_image(cases[1][1])
    pred = read_image(os.path.join(out, results[0][0], "seg.nii.gz"))
    assert _dice(pred.data, truth.data) >= 0.7
    # a missing epoch fails fast, before any case runs
    with pytest.raises(FileNotFoundError):
        segmentation_coarse_to_fine(
            cases[1][0][0], save_dir, save_dir, out,
            partition_size=(32, 32, 32), fine_checkpoint=999)


def test_num_devices_mesh(c2f_model):
    """num_devices=-1 shards the fine pass's patch batches over the CPU×8
    mesh; the result must match the single-device run voxel-exactly."""
    root, cases, save_dir = c2f_model
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    from segmentation3d_tpu.io import read_image
    kw = dict(seg_name="seg.nii.gz", partition_size=(32, 32, 32),
              partition_stride=(16, 16, 16), batch_size=8, margin_mm=8.0)
    segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, str(root / "mesh1"), **kw)
    segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, str(root / "mesh8"),
        num_devices=-1, **kw)
    a = read_image(os.path.join(str(root / "mesh1"), "case0_mod0",
                                "seg.nii.gz")).data
    b = read_image(os.path.join(str(root / "mesh8"), "case0_mod0",
                                "seg.nii.gz")).data
    assert (a != b).mean() < 1e-3  # reduction-order noise at blend seams only


def test_roi_bounds_device_matches_host():
    """The on-device 7-int bbox reduction agrees with the host nonzero scan
    (including world-space corners through roi_from_mask)."""
    import jax.numpy as jnp
    from segmentation3d_tpu.core.coarse_to_fine import (
        _roi_bounds, _roi_world, roi_from_mask)
    from segmentation3d_tpu.ops.geometry import Frame
    rng = np.random.default_rng(0)
    mask = np.zeros((20, 24, 28), np.uint8)
    mask[3:9, 5:12, 7:20] = (rng.random((6, 7, 13)) > 0.5)
    frame = Frame.identity(spacing=(1.5, 2.0, 2.5))
    b = np.asarray(_roi_bounds(jnp.asarray(mask)))
    assert b[0] == 1
    nz = np.nonzero(mask > 0)
    assert (b[1], b[3], b[5]) == (nz[0].min(), nz[1].min(), nz[2].min())
    assert (b[2], b[4], b[6]) == (nz[0].max(), nz[1].max(), nz[2].max())
    lo_d, hi_d = _roi_world(np.array([b[5], b[3], b[1]], np.float64),
                            np.array([b[6], b[4], b[2]], np.float64),
                            frame, 4.0)
    lo_h, hi_h = roi_from_mask(mask, frame, margin_mm=4.0)
    np.testing.assert_allclose(lo_d, lo_h)
    np.testing.assert_allclose(hi_d, hi_h)
    # empty mask
    assert np.asarray(_roi_bounds(jnp.zeros((4, 4, 4), jnp.uint8)))[0] == 0


def test_cli_flags(c2f_model):
    """The seg_infer CLI passes the new c2f surface through (--save_prob,
    --post, --fine_checkpoint, repeated --fine_model)."""
    root, cases, save_dir = c2f_model
    from segmentation3d_tpu.cli.seg_infer import main
    out = str(root / "out_cli2")
    main(["-i", cases[1][0][0], "-m", save_dir,
          "--fine_model", save_dir, "--fine_model", save_dir,
          "-o", out, "-n", "seg.nii.gz", "--partition_size", "32", "32", "32",
          "--batch_size", "1", "--save_prob", "--post", "largest_cc",
          "--fine_checkpoint", "best"])
    sub = os.listdir(out)
    assert len(sub) == 1
    assert os.path.isfile(os.path.join(out, sub[0], "seg.nii.gz"))
    assert os.path.isfile(os.path.join(out, sub[0], "prob_1.mha"))
    # --checkpoint stays rejected as ambiguous
    with pytest.raises(SystemExit):
        main(["-i", cases[1][0][0], "-m", save_dir, "--fine_model", save_dir,
              "-o", out, "--checkpoint", "best"])


def test_empty_roi_writes_background_mask_and_probs(tmp_path):
    """A coarse pass that finds NO foreground still produces a full-size
    background mask (and class-0=1 prob maps) instead of failing — the
    deferred write path included."""
    import jax.numpy as jnp
    from segmentation3d_tpu.core.coarse_to_fine import (
        segment_case_coarse_to_fine)
    from segmentation3d_tpu.core.seg_infer import SegModel
    from segmentation3d_tpu.io import Volume, write_image
    from segmentation3d_tpu.ops.geometry import Frame

    class _BgNet:
        """Duck net: always predicts background."""
        def __init__(self):
            self.out_channels = 2

        def apply(self, variables, x, train=False):
            import jax
            cls = jnp.zeros(x.shape[:-1], jnp.int32)
            return jax.nn.one_hot(cls, 2, dtype=jnp.float32)

    net = _BgNet()
    m = SegModel(net=net, variables={}, spacing=[1.0, 1.0, 1.0],
                 max_stride=16, interpolation="LINEAR", normalizers=[None],
                 in_channels=1, out_channels=2, net_name="duck", epoch_idx=0)
    img = np.zeros((24, 24, 24), np.float32)
    p = str(tmp_path / "c.nii.gz")
    write_image(Volume(img, Frame.identity()), p)
    mask_vol, prob_out, native, secs, roi = segment_case_coarse_to_fine(
        m, [m], [p], {}, [None], (16, 16, 16), defer_host=True,
        save_prob=True)
    assert roi is None
    mv = mask_vol.materialize()
    assert mv.data.shape == (24, 24, 24) and mv.data.max() == 0
    probs = {c: v.materialize().data for c, v in prob_out}
    np.testing.assert_allclose(probs[0], 1.0)
    np.testing.assert_allclose(probs[1], 0.0)


def test_c2f_multimodality(tmp_path):
    """Two-modality case through the production c2f driver (packed uploads
    resample BOTH modalities onto each pass's grid)."""
    from segmentation3d_tpu.core.coarse_to_fine import segmentation_coarse_to_fine
    from segmentation3d_tpu.core.seg_train import train
    from segmentation3d_tpu.io import read_image
    data = tmp_path / "data"
    cases = [make_sphere_case(str(data), f"m{i}", shape_zyx=(32, 32, 32),
                              seed=i, num_modality=2) for i in range(2)]
    lst = make_train_list(str(tmp_path / "train.txt"), cases)
    model = str(tmp_path / "model")
    cfg = write_train_config(str(tmp_path / "cfg.py"), lst, model,
                             num_modality=2, crop_size=(32, 32, 32),
                             epochs=50, batchsize=2, lr=3e-3, save_epochs=50,
                             sampling_method="CENTER",
                             extra="__C.net.base_channels = 4\n")
    train(cfg)
    test_txt = str(tmp_path / "test.txt")
    with open(test_txt, "w") as f:
        f.write("1\n" + "\n".join(cases[0][0]) + "\n")
    out = str(tmp_path / "out")
    results = segmentation_coarse_to_fine(
        test_txt, model, model, out, seg_name="seg.nii.gz",
        partition_size=(32, 32, 32), batch_size=1, margin_mm=8.0)
    assert len(results) == 1
    pred = read_image(os.path.join(out, results[0][0], "seg.nii.gz"))
    truth = read_image(cases[0][1])
    # tiny 4-channel net on 2 cases: the bar checks the two-modality
    # pipeline is wired (both modalities resampled onto both pass grids),
    # not model quality
    assert _dice(pred.data, truth.data) >= 0.7


def test_cli_c2f_checkpoint_flags_require_fine_model(tmp_path):
    """--coarse_checkpoint/--fine_checkpoint without --fine_model error out
    instead of being silently ignored (the flat driver uses --checkpoint)."""
    from segmentation3d_tpu.cli.seg_infer import main
    with pytest.raises(SystemExit, match="fine_model"):
        main(["-i", "x.nii.gz", "-m", "m", "-o", str(tmp_path),
              "--fine_checkpoint", "best"])
    with pytest.raises(SystemExit, match="fine_model"):
        main(["-i", "x.nii.gz", "-m", "m", "-o", str(tmp_path),
              "--coarse_checkpoint", "3"])


def test_fine_grid_covers_roi_for_any_direction():
    """The fine grid must cover the ROI world box for flipped/permuted
    direction matrices (round-4 review fix: the world-min-corner origin
    pointed the grid AWAY from the ROI under diag(-1,-1,1) — the direction
    every RAS-sform NIfTI gets after LPS conversion)."""
    from segmentation3d_tpu.core.coarse_to_fine import _fine_grid_for_roi
    from segmentation3d_tpu.io import Volume
    from segmentation3d_tpu.ops.geometry import Frame
    rng = np.random.default_rng(0)
    perm = np.eye(3)[[1, 0, 2]]  # x/y swap
    for D in (np.eye(3), np.diag([-1.0, -1.0, 1.0]),
              np.diag([1.0, -1.0, -1.0]), perm, perm @ np.diag([-1, 1, -1.0])):
        native = Volume(np.zeros((40, 40, 40), np.float32),
                        Frame(np.array([5.0, -3.0, 2.0]),
                              np.array([1.0, 1.0, 1.0]), D))
        nat = np.asarray([native.frame.index_to_world([i, j, k])
                          for i in (0, 39) for j in (0, 39) for k in (0, 39)])
        lo_box = nat.min(axis=0) + 8.0
        hi_box = lo_box + np.array([10.0, 14.0, 6.0])
        frame, size, raw = _fine_grid_for_roi(lo_box, hi_box, native,
                                              [1.0, 1.0, 1.0], 16)
        corners = np.asarray([frame.index_to_world([i, j, k])
                              for i in (0, size[0] - 1)
                              for j in (0, size[1] - 1)
                              for k in (0, size[2] - 1)])
        glo, ghi = corners.min(axis=0), corners.max(axis=0)
        assert (glo <= lo_box + 1e-6).all() and (ghi >= hi_box - 1e-6).all(), \
            (D, glo, lo_box, ghi, hi_box)


def test_case_name_collisions_disambiguated(tmp_path):
    """Cases sharing a filename (per-case-folder layout: every case is
    image.nii.gz) must not overwrite one output directory."""
    from segmentation3d_tpu.core.seg_infer import _case_names
    cases = [[str(tmp_path / "caseA" / "image.nii.gz")],
             [str(tmp_path / "caseB" / "image.nii.gz")],
             [str(tmp_path / "other.nii.gz")]]
    names = _case_names(cases)
    assert len(set(names)) == 3
    assert names[2] == "other"
    assert "caseA" in names[0] and "caseB" in names[1]
    # unique basenames stay plain
    assert _case_names([[str(tmp_path / "a.nii.gz")],
                        [str(tmp_path / "b.nii.gz")]]) == ["a", "b"]


def test_c2f_prepared_input(c2f_model):
    """The round-5 serving prep path (prepare_cases -> prepared=) drives
    the c2f batch driver to the same result as the unprepared call."""
    root, cases, save_dir = c2f_model
    from segmentation3d_tpu.core.coarse_to_fine import (
        segmentation_coarse_to_fine)
    from segmentation3d_tpu.core.seg_infer import prepare_cases
    from segmentation3d_tpu.io import read_image
    kw = dict(seg_name="seg.nii.gz", partition_size=(32, 32, 32),
              batch_size=1, margin_mm=8.0)
    segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, str(root / "prep_off"), **kw)
    segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, str(root / "prep_on"),
        prepared=prepare_cases(cases[0][0][0]), **kw)
    a = read_image(os.path.join(str(root / "prep_off"), "case0_mod0",
                                "seg.nii.gz")).data
    b = read_image(os.path.join(str(root / "prep_on"), "case0_mod0",
                                "seg.nii.gz")).data
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a mismatched prepared input raises before any case runs
    with pytest.raises(ValueError, match="prepared input"):
        segmentation_coarse_to_fine(
            cases[1][0][0], save_dir, save_dir, str(root / "prep_bad"),
            prepared=prepare_cases(cases[0][0][0]), **kw)


def test_prep_channels_centered_valid_window():
    """The 6-tuple (offset+size) valid spec reads adaptive-normalizer stats
    from the CENTERED window — the c2f fine grid splits bucket padding
    symmetrically around the ROI, so a corner-anchored stats crop would mix
    fill voxels in and real content out (round-4 ADVICE)."""
    import types
    import jax.numpy as jnp
    from segmentation3d_tpu.core.seg_infer import prep_channels
    from segmentation3d_tpu.io import Volume
    from segmentation3d_tpu.ops.geometry import Frame
    from segmentation3d_tpu.utils.normalizer import AdaptiveNormalizer
    rng = np.random.default_rng(0)
    data = np.full((8, 8, 8), -1000.0, np.float32)  # fill everywhere...
    content = rng.uniform(0.0, 100.0, (4, 4, 4)).astype(np.float32)
    data[2:6, 2:6, 2:6] = content                   # ...except the center
    v = Volume(data, Frame.identity())
    norm = AdaptiveNormalizer(0.0, 1.0, clip=False)  # min/max window
    model = types.SimpleNamespace(normalizers=[norm], interpolation="LINEAR")
    dst_size = np.asarray([8, 8, 8])
    centered = prep_channels(model, [v], None, v.frame, dst_size,
                             np.asarray([2, 2, 2, 4, 4, 4]), 0.0)
    corner = prep_channels(model, [v], None, v.frame, dst_size,
                           np.asarray([4, 4, 4]), 0.0)
    # centered: window == [content.min(), content.max()] -> the content's
    # max voxel normalizes to exactly +1
    exp = (data - content.min()) / (content.max() - content.min()) * 2 - 1
    np.testing.assert_allclose(np.asarray(centered)[..., 0], exp, atol=1e-4)
    # the corner-anchored window includes -1000 fill: different result
    assert not np.allclose(np.asarray(corner), np.asarray(centered))


def test_case_names_global_before_process_slice(tmp_path):
    """Multi-host: name disambiguation happens on the GLOBAL case list
    BEFORE the round-robin slice (round-4 ADVICE) — two colliding cases on
    different processes must not both claim the same output dir. The fixed
    composition is _process_slice(_case_names(cases))."""
    from segmentation3d_tpu.core.seg_infer import _case_names, _process_slice
    # both cases are <dir>/image.nii.gz with the SAME parent-dir basename
    # ("s"), so parent-dir disambiguation also collides -> numeric suffix
    cases = [[str(tmp_path / "a" / "s" / "image.nii.gz")],
             [str(tmp_path / "b" / "s" / "image.nii.gz")]]
    names = _case_names(cases)
    assert len(set(names)) == 2
    seen = set()
    for pi in range(2):  # simulate the two processes' slices
        seen |= set(_process_slice(names, process_index=pi, process_count=2))
    assert len(seen) == 2
    # the OLD composition (names computed per-slice) collides:
    old = [_case_names(_process_slice(cases, process_index=pi,
                                      process_count=2))[0] for pi in range(2)]
    assert old[0] == old[1]  # documents the bug the fix removes


def test_read_test_txt_miscounted_list_raises(tmp_path):
    from segmentation3d_tpu.core.seg_infer import read_test_txt
    p = str(tmp_path / "bad.txt")
    open(p, "w").write("2\none.nii.gz\ntwo.nii.gz\nthree.nii.gz\n")
    with pytest.raises(ValueError, match="divide"):
        read_test_txt(p)


def test_partition_rounds_to_model_stride(c2f_model):
    """A partition_size that is not a multiple of the fine model's
    max_stride rounds UP (reference SIZE semantics) instead of failing
    every case deep in the net."""
    root, cases, save_dir = c2f_model
    from segmentation3d_tpu.core import coarse_to_fine as c2f
    from segmentation3d_tpu.io import read_image
    out = str(root / "out_rnd")
    results = c2f.segmentation_coarse_to_fine(
        cases[0][0][0], save_dir, save_dir, out, seg_name="seg.nii.gz",
        partition_size=(40, 40, 40), batch_size=1, margin_mm=8.0)
    assert len(results) == 1
    truth = read_image(cases[0][1])
    pred = read_image(os.path.join(out, results[0][0], "seg.nii.gz"))
    assert _dice(pred.data, truth.data) >= 0.8
    # the live session rounded 40 -> 48
    assert any(s.get("patch") == (48, 48, 48)
               for s in c2f._C2F_SESSIONS.values())
