"""Spatially-sharded TRAINING (``cfg.tpu.mesh.spatial`` — round-5, VERDICT
round-4 next #2): the crop z-axis shards over a 2-D ``(data, spatial)``
mesh; GSPMD inserts the conv halo exchanges and psums the BN/loss
reductions, so crops whose activations OOM one chip train across the mesh.
Exactness is asserted against the single-device step (the repo's
established CPU×8 equivalence pattern, tests/test_parallel.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from segmentation3d_tpu.parallel import make_mesh, shard_batch, replicate

import pytest as _pytest
pytestmark = _pytest.mark.slow  # expensive integration tier (VERDICT r4 #7)


def test_spatial_mesh_axes():
    m = make_mesh(-1, spatial=4)
    assert m.axis_names == ("data", "spatial")
    assert m.shape["data"] == 2 and m.shape["spatial"] == 4
    assert make_mesh(8, spatial=1).axis_names == ("data",)
    with pytest.raises(ValueError, match="divide"):
        make_mesh(8, spatial=3)


def test_spatial_batch_sharding_spec():
    from segmentation3d_tpu.parallel import data_sharding
    m = make_mesh(8, spatial=4)
    x = jnp.zeros((2, 32, 8, 8, 1))
    xs = shard_batch(x, m)
    assert xs.sharding == data_sharding(m)
    # each device holds a [1, 8, 8, 8, 1] shard: batch/2 x z/4
    shard_shape = xs.sharding.shard_shape(x.shape)
    assert shard_shape == (1, 8, 8, 8, 1)


def _tiny_setup(crop_z=64):
    from segmentation3d_tpu.models.vnet import SegmentationNet
    from segmentation3d_tpu.losses import MultiDiceLoss
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=2)
    x0 = jnp.zeros((1, crop_z, 16, 16, 1))
    variables = net.init(jax.random.PRNGKey(0), x0, train=False)
    optimizer = optax.sgd(1e-2)  # SGD: param delta IS the mean gradient
    loss_fn = MultiDiceLoss(num_class=2)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, crop_z, 16, 16, 1)), jnp.float32)
    segs = jnp.asarray(rng.integers(0, 2, size=(2, crop_z, 16, 16)), jnp.int32)
    return net, variables, optimizer, loss_fn, images, segs


def test_spatial_sharded_step_matches_single_device():
    """(data=2, spatial=4) step == single-device step: same loss, same
    params (up to float reduction order). The crop z (64) shards to 16
    planes/device at full res, 1 plane/device at the deepest level."""
    from segmentation3d_tpu.core.seg_train import make_train_step
    net, variables, optimizer, loss_fn, images, segs = _tiny_setup()

    def run(mesh):
        params = replicate(jax.tree_util.tree_map(jnp.copy,
                                                  variables["params"]), mesh)
        stats = replicate(jax.tree_util.tree_map(jnp.copy,
                                                 variables["batch_stats"]), mesh)
        opt_state = replicate(optimizer.init(params), mesh)
        step = make_train_step(net, loss_fn, optimizer, mesh=mesh)
        im, sg = shard_batch((images, segs), mesh)
        params, stats, opt_state, loss = step(params, stats, opt_state, im, sg)
        return jax.device_get(params), jax.device_get(stats), float(loss)

    p1, s1, l1 = run(make_mesh(1))
    p8, s8, l8 = run(make_mesh(8, spatial=4))
    assert abs(l1 - l8) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_spatial_step_partitions_convs():
    """The compiled sharded step REALLY partitions spatially: the HLO
    carries halo-exchange collectives (collective-permute; XLA may lower
    small halos as all-gathers on CPU, accept either) and no parameter
    gradient psum is lost (all-reduce present)."""
    from segmentation3d_tpu.core.seg_train import _make_step_body
    net, variables, optimizer, loss_fn, images, segs = _tiny_setup()
    mesh = make_mesh(8, spatial=4)
    body = _make_step_body(net, loss_fn, None, None, optimizer, mesh=mesh)
    step = jax.jit(body)
    params = replicate(variables["params"], mesh)
    stats = replicate(variables["batch_stats"], mesh)
    opt_state = replicate(optimizer.init(variables["params"]), mesh)
    im, sg = shard_batch((images, segs), mesh)
    hlo = step.lower(params, stats, opt_state, im, sg).compile().as_text()
    assert "all-reduce" in hlo  # gradient/BN psums
    assert ("collective-permute" in hlo) or ("all-gather" in hlo)
    # the big full-res activations must stay sharded: no all-gather may
    # materialize the full [2, 64, 16, 16, C>=2] f32 activation per device
    import re
    for m in re.finditer(r"f32\[([0-9,]+)\][^=]* all-gather", hlo):
        dims = [int(d) for d in m.group(1).split(",")]
        assert not (len(dims) == 5 and dims[:4] == [2, 64, 16, 16]), (
            f"full-volume all-gather found: {m.group(0)[:120]}")


def test_train_cfg_spatial_gates(tmp_path):
    """Config-level errors: packed_domain + spatial raises; a crop z that
    does not divide by spatial*max_stride raises."""
    from phantoms import make_sphere_case, make_train_list, write_train_config
    from segmentation3d_tpu.core.seg_train import train
    data = tmp_path / "data"
    cases = [make_sphere_case(str(data), "c0", shape_zyx=(32, 32, 32), seed=0)]
    lst = make_train_list(str(tmp_path / "train.txt"), cases)

    cfg1 = write_train_config(
        str(tmp_path / "cfg1.py"), lst, str(tmp_path / "m1"),
        crop_size=(32, 32, 32), epochs=1, batchsize=1,
        extra="__C.tpu = edict()\n__C.tpu.mesh = edict()\n"
              "__C.tpu.mesh.spatial = 2\n"
              "__C.tpu.conv_backend = 'packed_domain'\n")
    with pytest.raises(ValueError, match="spatial"):
        train(cfg1)

    cfg2 = write_train_config(
        str(tmp_path / "cfg2.py"), lst, str(tmp_path / "m2"),
        crop_size=(32, 32, 32), epochs=1, batchsize=1,
        extra="__C.tpu = edict()\n__C.tpu.mesh = edict()\n"
              "__C.tpu.mesh.spatial = 4\n")  # z=32 % (4*16) != 0
    with pytest.raises(ValueError, match="crop_size z"):
        train(cfg2)


def test_train_e2e_spatial(tmp_path):
    """The full train() loop runs with cfg.tpu.mesh.spatial = 2 (mesh
    (1, 2) on the virtual CPU devices): loss decreases and a checkpoint
    lands in the reference layout."""
    from phantoms import make_sphere_case, make_train_list, write_train_config
    from segmentation3d_tpu.core.seg_train import train
    data = tmp_path / "data"
    cases = [make_sphere_case(str(data), f"c{i}", shape_zyx=(32, 32, 32),
                              seed=i) for i in range(2)]
    lst = make_train_list(str(tmp_path / "train.txt"), cases)
    save_dir = str(tmp_path / "model")
    cfg = write_train_config(
        str(tmp_path / "cfg.py"), lst, save_dir,
        crop_size=(32, 32, 32), epochs=10, batchsize=2, lr=3e-3,
        save_epochs=10, sampling_method="CENTER",
        extra="__C.net.base_channels = 4\n"
              "__C.tpu = edict()\n__C.tpu.mesh = edict()\n"
              "__C.tpu.mesh.spatial = 2\n")
    train(cfg)
    csv = os.path.join(save_dir, "train_loss.csv")
    rows = open(csv).read().strip().splitlines()
    assert float(rows[-1].split(",")[2]) < float(rows[1].split(",")[2])
    assert os.path.isdir(os.path.join(save_dir, "checkpoints", "chk_10"))
