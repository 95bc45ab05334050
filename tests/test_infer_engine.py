import numpy as np
import jax
import jax.numpy as jnp

from segmentation3d_tpu.core.infer_engine import SlidingWindowInferer, make_weight_map


class _IdentityNet:
    """Fake net: per-voxel 'probabilities' derived from the input voxel value,
    so blending arithmetic can be checked exactly."""

    def apply(self, variables, x, train=False):
        v = x[..., :1]
        return jnp.concatenate([1.0 - v, v], axis=-1)


def test_weight_map_shapes():
    w = make_weight_map((8, 8, 8), "constant")
    assert w.shape == (8, 8, 8, 1) and np.all(w == 1.0)
    g = make_weight_map((8, 8, 8), "gaussian")
    assert g.shape == (8, 8, 8, 1)
    assert g.max() <= 1.0 and g[4, 4, 4, 0] == g.max()
    assert g[0, 0, 0, 0] < g[4, 4, 4, 0]


def test_boxes_cover_volume():
    inf = SlidingWindowInferer(_IdentityNet(), (8, 8, 8), 2, batch_size=4)
    boxes = inf.boxes_for((16, 16, 16), (4, 4, 4))
    assert boxes.shape[1] == 3
    covered = np.zeros((16, 16, 16), bool)
    for b in boxes:
        covered[b[0]:b[0] + 8, b[1]:b[1] + 8, b[2]:b[2] + 8] = True
    assert covered.all()


def test_blend_constant_exact():
    """With an identity 'net', overlap-averaged probs must equal the input."""
    rng = np.random.default_rng(0)
    vol = rng.uniform(0.2, 0.8, size=(16, 16, 16, 1)).astype(np.float32)
    inf = SlidingWindowInferer(_IdentityNet(), (8, 8, 8), 2, batch_size=3,
                               blend="constant")
    seg, prob = inf(None, jnp.asarray(vol), stride_zyx=(4, 4, 4), return_prob=True)
    np.testing.assert_allclose(np.asarray(prob[..., 1]), vol[..., 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, atol=1e-5)
    expect = (vol[..., 0] > 0.5).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(seg), expect)


def test_blend_gaussian_exact_for_identity():
    """Weighted average of identical contributions is still the input."""
    rng = np.random.default_rng(1)
    vol = rng.uniform(0, 1, size=(12, 12, 12, 1)).astype(np.float32)
    inf = SlidingWindowInferer(_IdentityNet(), (8, 8, 8), 2, batch_size=2,
                               blend="gaussian")
    _, prob = inf(None, jnp.asarray(vol), stride_zyx=(4, 4, 4), return_prob=True)
    np.testing.assert_allclose(np.asarray(prob[..., 1]), vol[..., 0], atol=1e-4)


def test_whole_volume_single_patch():
    vol = np.random.default_rng(2).uniform(size=(16, 16, 16, 1)).astype(np.float32)
    inf = SlidingWindowInferer(_IdentityNet(), (16, 16, 16), 2, batch_size=1,
                               blend="constant")
    seg = inf(None, jnp.asarray(vol))
    assert seg.shape == (16, 16, 16)


def test_padded_box_batches_do_not_pollute():
    """Box count not divisible by batch: sentinel boxes carry zero weight."""
    vol = np.random.default_rng(3).uniform(0.2, 0.8, (16, 16, 16, 1)).astype(np.float32)
    inf = SlidingWindowInferer(_IdentityNet(), (8, 8, 8), 2, batch_size=5,
                               blend="constant")
    # 3^3=27 boxes at stride 4 -> pads to 30
    _, prob = inf(None, jnp.asarray(vol), stride_zyx=(4, 4, 4), return_prob=True)
    np.testing.assert_allclose(np.asarray(prob[..., 1]), vol[..., 0], atol=1e-5)


def test_real_vnet_through_engine():
    from segmentation3d_tpu.models.vnet import SegmentationNet
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    inf = SlidingWindowInferer(net, (16, 16, 16), 2, batch_size=2)
    vol = jnp.asarray(np.random.default_rng(0).normal(size=(32, 32, 32, 1)),
                      jnp.float32)
    seg, prob = inf(variables, vol, stride_zyx=(16, 16, 16), return_prob=True)
    assert seg.shape == (32, 32, 32)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, atol=1e-4)


def test_tta_axes_normalization():
    from segmentation3d_tpu.core.infer_engine import tta_axes, tta_flip_combos
    assert tta_axes(None) == () and tta_axes("") == () and tta_axes("none") == ()
    assert tta_axes("all") == ("z", "y", "x")
    assert tta_axes("x,z") == ("z", "x") and tta_axes(["X", "y"]) == ("y", "x")
    import pytest
    with pytest.raises(ValueError, match="tta axes"):
        tta_axes("q")
    assert tta_flip_combos("x") == ((3,),)
    combos = tta_flip_combos("zyx")
    assert len(combos) == 7 and (1, 2, 3) in combos


class _AsymNet:
    """Fake net whose output depends on position within the patch, so
    mirror averaging is NOT a no-op: prob_1 = mean(x over patch) * ramp."""

    def apply(self, variables, x, train=False):
        n = x.shape[3]
        ramp = jnp.linspace(0.1, 0.9, n).reshape(1, 1, 1, n, 1)
        v = jnp.clip(x[..., :1] * ramp, 0.0, 1.0)
        return jnp.concatenate([1.0 - v, v], axis=-1)


def test_tta_matches_manual_flip_average():
    """tta='x' must equal the hand-computed mean of the plain forward and
    the flip-forward-unflip forward, patch by patch."""
    rng = np.random.default_rng(3)
    vol = rng.uniform(0.2, 0.8, size=(8, 8, 16, 1)).astype(np.float32)
    net = _AsymNet()
    patch = (8, 8, 8)
    plain = SlidingWindowInferer(net, patch, 2, batch_size=2, blend="constant")
    tta = SlidingWindowInferer(net, patch, 2, batch_size=2, blend="constant",
                               tta="x")
    _, p_tta = tta(None, jnp.asarray(vol), stride_zyx=(8, 8, 8),
                   return_prob=True)

    # expected: run the plain engine on vol and on x-flipped vol, average
    _, p0 = plain(None, jnp.asarray(vol), stride_zyx=(8, 8, 8),
                  return_prob=True)
    _, p1 = plain(None, jnp.asarray(vol[:, :, ::-1].copy()),
                  stride_zyx=(8, 8, 8), return_prob=True)
    # per-patch flip == whole-volume flip here because the patch grid is
    # x-symmetric (16 = 2 full patches)
    expect = (np.asarray(p0) + np.asarray(p1)[:, :, ::-1]) / 2.0
    np.testing.assert_allclose(np.asarray(p_tta), expect, atol=1e-5)


def test_tta_all_is_mean_of_8_forwards():
    rng = np.random.default_rng(4)
    vol = rng.uniform(size=(8, 8, 8, 1)).astype(np.float32)
    net = _AsymNet()
    inf = SlidingWindowInferer(net, (8, 8, 8), 2, batch_size=1, tta="all")
    _, prob = inf(None, jnp.asarray(vol), return_prob=True)
    acc = np.zeros((8, 8, 8, 2), np.float32)
    x = jnp.asarray(vol)[None]
    for bits in range(8):
        dims = tuple(d for i, d in enumerate((1, 2, 3)) if bits >> i & 1)
        out = net.apply(None, jnp.flip(x, dims) if dims else x)
        out = jnp.flip(out, dims) if dims else out
        acc += np.asarray(out[0])
    np.testing.assert_allclose(np.asarray(prob), acc / 8.0, atol=1e-5)


def test_tta_rejects_packed_tail():
    import pytest
    with pytest.raises(ValueError, match="tta"):
        SlidingWindowInferer(_AsymNet(), (8, 8, 8), 2, packed_tail=True,
                             tta="x")
