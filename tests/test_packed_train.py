"""Packed-domain TRAINING forward (models/packed_train.py): parity with
the flax forward in both modes, matching BN stat updates, usable grads."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.models.packed_train import build_packed_train_apply

rng = np.random.default_rng(0)


def _setup(in_ch=1, out_ch=2, base=16, act="relu", shape=(16, 16, 32),
           remat=False):
    net = SegmentationNet(in_channels=in_ch, out_channels=out_ch,
                          base_channels=base, act=act, remat=remat)
    x = jnp.asarray(rng.normal(size=(2,) + shape + (in_ch,)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    return net, x, variables


def test_eval_parity():
    net, x, variables = _setup()
    ref = np.asarray(net.apply(variables, x, train=False))
    apply_fn = build_packed_train_apply(net)
    out = np.asarray(apply_fn(variables, x, train=False))
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_train_parity_and_stats():
    net, x, variables = _setup(out_ch=3)
    ref, mut = net.apply(variables, x, train=True, mutable=["batch_stats"])
    apply_fn = build_packed_train_apply(net)
    out, mut2 = apply_fn(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
    # every BN running stat updated identically
    flat_ref = jax.tree_util.tree_leaves_with_path(mut["batch_stats"])
    flat_new = dict(jax.tree_util.tree_leaves_with_path(mut2["batch_stats"]))
    assert len(flat_ref) == len(flat_new)
    for path, leaf in flat_ref:
        got = flat_new[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=str(path))


def test_prelu_parity():
    net, x, variables = _setup(act="prelu")
    ref = np.asarray(net.apply(variables, x, train=False))
    apply_fn = build_packed_train_apply(net)
    out = np.asarray(apply_fn(variables, x, train=False))
    np.testing.assert_allclose(out, ref, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("remat", [False, True])
def test_grads_match_flax(remat):
    net, x, variables = _setup(shape=(16, 16, 32), base=8, remat=remat)
    seg = jnp.asarray(rng.integers(0, 2, size=x.shape[:4]), jnp.int32)
    from segmentation3d_tpu.losses import MultiDiceLoss
    loss_fn = MultiDiceLoss(num_class=2)
    apply_fn = build_packed_train_apply(net)

    def loss_of(apply, p):
        probs, _ = apply({"params": p,
                          "batch_stats": variables["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return loss_fn(probs, seg)

    l1, g1 = jax.value_and_grad(
        lambda p: loss_of(net.apply, p))(variables["params"])
    l2, g2 = jax.value_and_grad(
        lambda p: loss_of(apply_fn, p))(variables["params"])
    assert abs(float(l1) - float(l2)) < 1e-3
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, leaf in flat1:
        np.testing.assert_allclose(np.asarray(flat2[path]),
                                   np.asarray(leaf), rtol=0.05, atol=1e-3,
                                   err_msg=str(path))


def test_adaptive_head_packing_w48():
    """Crop widths that are max_stride-legal but not %32 (48, 80, 112, ...)
    now run the packed training forward via the W-adaptive head packing
    (Ph=16 for W=48) instead of requiring the window fallback — parity with
    the flax forward and a packed-loss scalar matching the unpacked one."""
    net, _, _ = _setup()
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 48, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(net.apply(variables, x, train=False))
    apply_fn = build_packed_train_apply(net)
    out = np.asarray(apply_fn(variables, x, train=False))
    np.testing.assert_allclose(out, ref, atol=2e-3)

    # packed-probs head at the adaptive Ph + shape-inferred packed loss
    from segmentation3d_tpu.losses import MultiDiceLoss
    from segmentation3d_tpu.losses.packed import make_packed_loss
    from segmentation3d_tpu.ops.packed_conv import head_p_for
    assert head_p_for(48, 2) == 16
    seg = jnp.asarray(rng.integers(0, 2, size=x.shape[:4]), jnp.int32)
    loss_fn = MultiDiceLoss(num_class=2)
    packed_apply = build_packed_train_apply(net, packed_probs=True)
    probs_packed = packed_apply(variables, x, train=False)
    assert probs_packed.shape == (2, 16, 16, 3, 16 * 2)
    ploss = make_packed_loss(loss_fn, None, 2)
    ref_loss = float(loss_fn(jnp.asarray(ref), seg))
    assert abs(float(ploss(probs_packed, seg)) - ref_loss) < 2e-3


def test_bf16_train_parity():
    """Under dtype=bf16 the packed training forward emits bf16 conv outputs
    (no f32 activation materialization; bias added in f32 inside the BN
    fusions). Must stay close to the flax bf16 forward: argmax agreement +
    BN running stats within bf16 rounding."""
    net = SegmentationNet(in_channels=1, out_channels=3, base_channels=16,
                          dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    ref, mut = net.apply(variables, x, train=True, mutable=["batch_stats"])
    apply_fn = build_packed_train_apply(net)
    out, mut2 = apply_fn(variables, x, train=True, mutable=["batch_stats"])
    agree = np.mean(np.argmax(np.asarray(out), -1)
                    == np.argmax(np.asarray(ref), -1))
    assert agree > 0.98
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05)
    flat_ref = jax.tree_util.tree_leaves_with_path(mut["batch_stats"])
    flat_new = dict(jax.tree_util.tree_leaves_with_path(mut2["batch_stats"]))
    for path, leaf in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_new[path]),
                                   np.asarray(leaf), rtol=0.02, atol=5e-3,
                                   err_msg=str(path))


@pytest.mark.slow
def test_bf16_grads_usable():
    """bf16 packed training grads: finite, and a few steps reduce the loss
    (the bf16 conv-output lowering keeps the transpose rule dtype-consistent
    — no f32/bf16 mixing under jax.grad)."""
    net, x, variables = _setup(base=8)
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=8,
                          dtype=jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    seg = jnp.asarray(rng.integers(0, 2, size=x.shape[:4]), jnp.int32)
    from segmentation3d_tpu.losses import MultiDiceLoss
    loss_fn = MultiDiceLoss(num_class=2)
    apply_fn = build_packed_train_apply(net)

    def loss_of(p):
        probs, _ = apply_fn({"params": p,
                             "batch_stats": variables["batch_stats"]},
                            x, train=True, mutable=["batch_stats"])
        return loss_fn(probs, seg)

    loss, g = jax.value_and_grad(loss_of)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.slow
def test_train_step_integration():
    """make_train_step with the packed apply: losses fall on a phantom."""
    import optax
    from segmentation3d_tpu.core.seg_train import make_train_step
    from segmentation3d_tpu.losses import MultiDiceLoss
    net, x, variables = _setup(base=8)
    z, y, w = x.shape[1:4]
    zz, yy, xx = np.mgrid[0:z, 0:y, 0:w]
    sphere = (((zz - z / 2) ** 2 + (yy - y / 2) ** 2 + (xx - w / 2) ** 2)
              < (0.3 * min(z, y, w)) ** 2)
    seg = jnp.asarray(np.broadcast_to(sphere, x.shape[:4]), jnp.int32)
    xs = jnp.asarray(np.where(np.asarray(seg) > 0, 1.0, -1.0))[..., None]
    apply_fn = build_packed_train_apply(net)
    opt = optax.adam(3e-3)
    params, stats = variables["params"], variables["batch_stats"]
    ostate = opt.init(params)
    step = make_train_step(net, MultiDiceLoss(num_class=2), opt,
                           apply_fn=apply_fn)
    losses = []
    for _ in range(25):
        params, stats, ostate, loss = step(params, stats, ostate, xs, seg)
        losses.append(float(loss))
    # steady decline (convergence smoke, not a benchmark)
    assert losses[-1] < losses[0] * 0.75, losses
    assert losses[-1] == min(losses), losses
