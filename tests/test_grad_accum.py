"""Gradient accumulation (cfg.train.grad_accum_steps): one optimizer step
over A microbatches must apply exactly the mean of the per-microbatch
gradients (BN stats threading sequentially, torch-style accumulation
semantics), and the train-loop wiring must train end-to-end."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from phantoms import make_sphere_case, make_train_list, write_train_config
from segmentation3d_tpu.core.seg_train import (
    make_train_step, make_accum_train_step)
from segmentation3d_tpu.losses import MultiDiceLoss
from segmentation3d_tpu.models.vnet import SegmentationNet

import pytest as _pytest
pytestmark = _pytest.mark.slow  # expensive integration tier (VERDICT r4 #7)

rng = np.random.default_rng(0)


def _setup(batch=4, shape=(16, 16, 32)):
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x0 = jnp.zeros((batch,) + shape + (1,), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    images = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
    segs = jnp.asarray(rng.integers(0, 2, size=x0.shape[:4]), jnp.int32)
    return net, variables, images, segs


def test_accum_step_is_mean_microbatch_gradient():
    """With SGD(lr=1) the parameter delta IS the (negated) applied gradient,
    so the accumulation math can be checked exactly against a hand loop."""
    accum, batch = 2, 4
    net, variables, images, segs = _setup(batch=batch)
    loss_fn = MultiDiceLoss(num_class=2)
    opt = optax.sgd(1.0)

    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)
    p0, s0 = variables["params"], variables["batch_stats"]

    # hand reference: grads at p0 per microbatch, BN stats threaded
    mb = batch // accum
    stats = copy(s0)
    gsum = jax.tree_util.tree_map(jnp.zeros_like, p0)
    losses = []

    def loss_of(p, bs, x, y):
        probs, mutated = net.apply({"params": p, "batch_stats": bs}, x,
                                   train=True, mutable=["batch_stats"])
        return loss_fn(probs, y), mutated["batch_stats"]

    for a in range(accum):
        x = images[a * mb:(a + 1) * mb]
        y = segs[a * mb:(a + 1) * mb]
        (loss, stats), g = jax.value_and_grad(
            loss_of, has_aux=True)(p0, stats, x, y)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        losses.append(float(loss))
    ref_params = jax.tree_util.tree_map(lambda p, g: p - g / accum, p0, gsum)

    step = make_accum_train_step(net, loss_fn, opt, accum)
    p2, s2, _, loss2 = step(copy(p0), copy(s0), opt.init(copy(p0)),
                            images, segs)

    assert abs(float(loss2) - float(np.mean(losses))) < 1e-6
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_params):
        got = dict(jax.tree_util.tree_leaves_with_path(p2))[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))
    for path, leaf in jax.tree_util.tree_leaves_with_path(stats):
        got = dict(jax.tree_util.tree_leaves_with_path(s2))[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))


def test_accum_one_matches_plain_step():
    # SGD, not Adam: conv biases feeding a BatchNorm have mathematically-zero
    # gradients, and Adam amplifies their compilation-dependent float noise
    # to lr scale (see test_multi_step.py); SGD keeps the comparison exact.
    net, variables, images, segs = _setup(batch=2)
    loss_fn = MultiDiceLoss(num_class=2)
    opt = optax.sgd(1e-2)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)

    p1, s1, _, l1 = make_train_step(net, loss_fn, opt)(
        copy(variables["params"]), copy(variables["batch_stats"]),
        opt.init(copy(variables["params"])), images, segs)
    p2, s2, _, l2 = make_accum_train_step(net, loss_fn, opt, 1)(
        copy(variables["params"]), copy(variables["batch_stats"]),
        opt.init(copy(variables["params"])), images, segs)

    assert abs(float(l1) - float(l2)) < 1e-6
    for path, leaf in jax.tree_util.tree_leaves_with_path(p1):
        got = dict(jax.tree_util.tree_leaves_with_path(p2))[path]
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))


def test_train_loop_grad_accum_end_to_end(tmp_path):
    """train() with grad_accum_steps=2 runs the full loop (same log/csv
    contract) and actually learns the phantom."""
    data = tmp_path / "data"
    cases = [make_sphere_case(str(data), f"c{i}", shape_zyx=(32, 32, 32),
                              seed=i) for i in range(2)]
    lst = make_train_list(str(tmp_path / "train.txt"), cases)
    save_dir = str(tmp_path / "model")
    cfg_path = write_train_config(
        str(tmp_path / "config.py"), lst, save_dir,
        crop_size=(32, 32, 32), epochs=10, batchsize=2, lr=3e-3,
        save_epochs=10, sampling_method="CENTER",
        extra="__C.net.base_channels = 4\n"
              "__C.train.grad_accum_steps = 2\n")
    from segmentation3d_tpu.core.seg_train import train
    train(cfg_path)

    rows = open(os.path.join(save_dir, "train_loss.csv")).read().splitlines()
    losses = [float(r.split(",")[2]) for r in rows[1:]]
    assert len(losses) == 10  # (2 cases * 10 epochs) / batch 2
    # microbatch size is 1 here, so BN statistics are noisy — the loss falls
    # (0.47 -> 0.36 measured) but more slowly than full-batch training
    first, last = np.mean(losses[:3]), np.mean(losses[-3:])
    assert last < 0.85 * first, (first, last)
    assert os.path.isdir(os.path.join(save_dir, "checkpoints", "chk_10"))


def test_grad_accum_rejects_bad_combinations(tmp_path):
    data = tmp_path / "data"
    cases = [make_sphere_case(str(data), "c0", shape_zyx=(32, 32, 32))]
    lst = make_train_list(str(tmp_path / "train.txt"), cases)

    def cfg_with(extra):
        return write_train_config(
            str(tmp_path / f"config_{abs(hash(extra))}.py"), lst,
            str(tmp_path / "model"), crop_size=(32, 32, 32), epochs=1,
            batchsize=2, extra="__C.net.base_channels = 4\n" + extra)

    from segmentation3d_tpu.core.seg_train import train
    with pytest.raises(ValueError, match="grad_accum"):
        train(cfg_with("__C.train.grad_accum_steps = 3\n"))
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        train(cfg_with("__C.train.grad_accum_steps = 2\n"
                       "__C.tpu = edict()\n"
                       "__C.tpu.steps_per_dispatch = 2\n"))


def test_accum_step_sharded_matches_single_device():
    """The accum step on an 8-device data mesh == single-device accum step
    (round-3 advisor: the reshape to [accum, mb, ...] carries an explicit
    sharding constraint pinning 'data' to the microbatch axis — without it
    GSPMD may reshard onto the scanned accum axis)."""
    from segmentation3d_tpu.parallel import make_mesh, shard_batch, replicate
    accum = 2
    net, variables, images, segs = _setup(batch=8)
    loss_fn = MultiDiceLoss(num_class=2)
    opt = optax.sgd(1e-2)

    def run(mesh_size):
        mesh = make_mesh(mesh_size)
        params = replicate(jax.tree_util.tree_map(jnp.copy,
                                                  variables["params"]), mesh)
        stats = replicate(jax.tree_util.tree_map(jnp.copy,
                                                 variables["batch_stats"]), mesh)
        opt_state = replicate(opt.init(params), mesh)
        step = make_accum_train_step(net, loss_fn, opt, accum,
                                     mesh=mesh if mesh_size > 1 else None)
        im, sg = shard_batch((images, segs), mesh)
        params, stats, opt_state, loss = step(params, stats, opt_state, im, sg)
        return jax.device_get(params), float(loss)

    p1, l1 = run(1)
    p4, l4 = run(4)  # microbatch 4 over 4 devices: 1 row per device
    assert abs(l1 - l4) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
