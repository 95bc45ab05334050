"""In-training validation (core/validation.py): shape-bucket program reuse
and per-class Dice math."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from segmentation3d_tpu.core.validation import validate_cases
from segmentation3d_tpu.io import Volume, write_image
from segmentation3d_tpu.ops.geometry import Frame
from phantoms import make_train_list


class _RoundNet:
    """Duck-typed net whose prediction is round(image channel 0) — lets the
    validation path be tested without training."""

    def __init__(self, num_classes):
        self.num_classes = num_classes

    def apply(self, variables, x, train=False):
        cls = jnp.clip(jnp.round(x[..., 0]).astype(jnp.int32), 0,
                       self.num_classes - 1)
        return jax.nn.one_hot(cls, self.num_classes, dtype=jnp.float32)


def _write_case(dirpath, name, img, seg):
    os.makedirs(dirpath, exist_ok=True)
    frame = Frame.identity()
    ip = os.path.join(dirpath, f"{name}_img.nii.gz")
    sp = os.path.join(dirpath, f"{name}_seg.nii.gz")
    write_image(Volume(img.astype(np.float32), frame), ip)
    write_image(Volume(seg.astype(np.uint8), frame), sp)
    return [ip], sp


def test_shape_bucketing_shares_one_program(tmp_path):
    """Cases of different native shapes within one bucket produce exactly
    ONE cached inferer (i.e. one compiled program — the round-2 validate()
    retraced per case shape, which costs minutes per shape on the relay)."""
    rng = np.random.default_rng(0)
    cases = []
    for i, shape in enumerate([(26, 28, 30), (30, 26, 28), (32, 32, 32)]):
        seg = (rng.random(shape) > 0.7).astype(np.uint8)
        img = seg.astype(np.float32)
        cases.append(_write_case(str(tmp_path / "d"), f"c{i}", img, seg))
    lst = make_train_list(str(tmp_path / "val.txt"), cases)
    cache = {}
    mean, per_class, n = validate_cases(
        _RoundNet(2), {}, lst, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR", normalizers=[None], num_classes=2,
        max_stride=16, shape_bucket=32, inferer_cache=cache)
    assert n == 3
    buckets = [k for k in cache if isinstance(k, tuple)]
    assert len(buckets) == 1, f"expected one shape bucket, got {buckets}"
    assert mean > 0.9  # round-trip of the image IS the label
    # the fixed validation set's preprocessed device volumes are cached
    # across save points (round-5: a warm save point re-reads nothing)
    assert len(cache["__cases__"]) == 4  # 3 cases + the budget counter
    mean2, _, _ = validate_cases(
        _RoundNet(2), {}, lst, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR", normalizers=[None], num_classes=2,
        max_stride=16, shape_bucket=32, inferer_cache=cache)
    assert mean2 == mean


def test_per_class_dice_values(tmp_path):
    """dice_c1/dice_c2 match a hand-computed value on a known mismatch."""
    shape = (32, 32, 32)
    seg = np.zeros(shape, np.uint8)
    seg[4:12, 4:12, 4:12] = 1
    seg[20:28, 20:28, 20:28] = 2
    img = seg.astype(np.float32)
    img[20:28, 20:28, 20:24] = 0.0  # half the class-2 region predicted 0
    cases = [_write_case(str(tmp_path / "d"), "c0", img, seg)]
    lst = make_train_list(str(tmp_path / "val.txt"), cases)
    mean, per_class, n = validate_cases(
        _RoundNet(3), {}, lst, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR", normalizers=[None], num_classes=3,
        max_stride=16, shape_bucket=32)
    assert n == 1 and len(per_class) == 2
    np.testing.assert_allclose(per_class[0], 1.0, atol=1e-6)
    g2 = float((seg == 2).sum())          # 512
    p2 = float((img == 2).sum())          # 256
    expected_c2 = 2 * p2 / (g2 + p2)
    np.testing.assert_allclose(per_class[1], expected_c2, atol=1e-6)
    np.testing.assert_allclose(mean, (1.0 + expected_c2) / 2, atol=1e-6)


def test_on_device_dice_matches_host_scoring(tmp_path):
    """SlidingWindowInferer.dice (the round-5 on-device scoring — only
    2*(NC-1) floats cross the link) returns EXACTLY the per-class Dice the
    host-side numpy scoring computes from the full mask readback, including
    the valid-region exclusion."""
    from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer
    rng = np.random.default_rng(3)
    shape = (32, 32, 32)        # padded bucket shape
    valid = (26, 28, 30)        # unpadded region (zyx)
    nc = 3
    img = rng.integers(0, nc, shape).astype(np.float32)
    gt = rng.integers(0, nc, shape).astype(np.int32)
    net = _RoundNet(nc)
    inf = SlidingWindowInferer(net, shape, nc, batch_size=1,
                               blend="constant")
    vol = jnp.asarray(img)[..., None]
    dev = inf.dice({}, vol, jnp.asarray(gt, jnp.float32), valid)
    # host scoring from the full mask (the pre-round-5 path)
    pred = np.asarray(inf({}, vol))
    p = pred[:valid[0], :valid[1], :valid[2]]
    g = gt[:valid[0], :valid[1], :valid[2]]
    for c in range(1, nc):
        inter = float(((p == c) & (g == c)).sum())
        denom = float((p == c).sum() + (g == c).sum())
        np.testing.assert_allclose(dev[c - 1], 2 * inter / max(denom, 1.0),
                                   rtol=1e-6)


def test_plot_val_curve(tmp_path):
    from segmentation3d_tpu.utils.plotting import plot_val_curve
    # absent / empty csv: no-op
    assert plot_val_curve(str(tmp_path / "missing.csv")) is None
    csv = tmp_path / "val_dice.csv"
    csv.write_text("epoch,val_dice,dice_c1,dice_c2\n"
                   "2,0.5,0.4,0.6\n4,0.8,0.75,0.85\n")
    out = plot_val_curve(str(csv))
    import os
    assert out is not None and os.path.isfile(out) \
        and out.endswith("val_dice.png")


def test_slab_fallback_above_size_cap(tmp_path):
    """A case whose padded volume exceeds size_cap^3 runs SLAB-partitioned
    (bounded HBM) and repeat save-point calls reuse the ONE cached program
    — no new inferer per save point (round-3 VERDICT weak #2)."""
    rng = np.random.default_rng(1)
    shape = (48, 32, 32)
    seg = (rng.random(shape) > 0.7).astype(np.uint8)
    cases = [_write_case(str(tmp_path / "d"), "big", seg.astype(np.float32),
                         seg)]
    lst = make_train_list(str(tmp_path / "val.txt"), cases)
    cache = {}
    kw = dict(spacing=[1.0, 1.0, 1.0], interpolation="LINEAR",
              normalizers=[None], num_classes=2, max_stride=16,
              shape_bucket=16, inferer_cache=cache,
              size_cap=32, slab_z=32, slab_overlap=16)
    mean1, _, _ = validate_cases(_RoundNet(2), {}, lst, **kw)
    assert mean1 > 0.9
    keys = [k for k in cache if isinstance(k, tuple)]
    assert len(keys) == 1
    (patch, stride), = keys
    assert patch[0] == 32 and patch[1:] == shape[1:], (patch, shape)
    assert stride[0] == 16  # overlapping slabs, not whole-volume
    inf1 = cache[keys[0]]["inferer"]
    # second save point (new params in real training): same cached program
    mean2, _, _ = validate_cases(_RoundNet(2), {}, lst, **kw)
    assert mean2 == mean1
    assert cache[keys[0]]["inferer"] is inf1
    assert len([k for k in cache if isinstance(k, tuple)]) == 1


def test_small_case_still_whole_volume(tmp_path):
    """Below the cap, validation keeps the whole-volume single-patch mode."""
    seg = np.zeros((24, 24, 24), np.uint8)
    seg[6:18, 6:18, 6:18] = 1
    cases = [_write_case(str(tmp_path / "d"), "sm", seg.astype(np.float32),
                         seg)]
    lst = make_train_list(str(tmp_path / "val.txt"), cases)
    cache = {}
    mean, _, _ = validate_cases(
        _RoundNet(2), {}, lst, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR", normalizers=[None], num_classes=2,
        max_stride=16, shape_bucket=32, inferer_cache=cache, size_cap=256)
    assert mean > 0.9
    ((patch, stride),) = [k for k in cache if isinstance(k, tuple)]
    assert patch == stride == (32, 32, 32)


def test_dice_excludes_bucket_padding(tmp_path):
    """Dice is scored on the VALID region only: a predictor that is perfect
    on the case must score 1.0 even when bucket padding adds voxels it
    labels foreground (round-4 review fix — padded-region scoring biased
    chk_best selection low)."""
    class _AllOneNet:
        def apply(self, variables, x, train=False):
            import jax
            cls = jnp.ones(x.shape[:-1], jnp.int32)
            return jax.nn.one_hot(cls, 2, dtype=jnp.float32)

    seg = np.ones((24, 24, 24), np.uint8)
    cases = [_write_case(str(tmp_path / "d"), "pad", seg.astype(np.float32),
                         seg)]
    lst = make_train_list(str(tmp_path / "val.txt"), cases)
    mean, per_class, n = validate_cases(
        _AllOneNet(), {}, lst, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR", normalizers=[None], num_classes=2,
        max_stride=16, shape_bucket=32)  # padded 24^3 -> 32^3
    np.testing.assert_allclose(mean, 1.0, atol=1e-9)
