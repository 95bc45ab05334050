import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.utils import model_io
from segmentation3d_tpu.utils.normalizer import FixedNormalizer, AdaptiveNormalizer


@pytest.fixture(scope="module")
def net_and_vars():
    net = SegmentationNet(in_channels=2, out_channels=3, base_channels=4)
    x = jnp.zeros((1, 16, 16, 16, 2))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    return net, variables, x


def test_flatten_roundtrip(net_and_vars):
    net, variables, x = net_and_vars
    state, layouts = model_io.flatten_variables(variables)
    # torch-style names and layouts
    assert any(k.endswith(".running_mean") for k in state)
    conv_keys = [k for k, l in layouts.items() if l == "conv"]
    assert conv_keys
    w = state[conv_keys[0]]
    assert w.ndim == 5  # [O, I, kD, kH, kW]
    back = model_io.unflatten_state_dict(state, layouts)
    orig_out = net.apply(variables, x, train=False)
    back = jax.tree_util.tree_map(jnp.asarray, back)
    new_out = net.apply(back, x, train=False)
    np.testing.assert_allclose(np.asarray(orig_out), np.asarray(new_out), atol=1e-6)


def test_save_load_checkpoint(tmp_path, net_and_vars):
    net, variables, x = net_and_vars
    save_dir = str(tmp_path / "run")
    chk = model_io.save_checkpoint(
        save_dir, epoch_idx=7, batch_idx=123, variables=variables,
        net_name="vnet", max_stride=16, in_channels=2, out_channels=3,
        spacing=[1.0, 1.0, 2.0], interpolation="LINEAR",
        crop_normalizers=[FixedNormalizer(0, 1), AdaptiveNormalizer()])
    assert chk.endswith("chk_7")
    loaded, payload = model_io.load_checkpoint(chk)
    assert payload["epoch_idx"] == 7 and payload["batch_idx"] == 123
    assert payload["net"] == "vnet" and payload["max_stride"] == 16
    assert payload["spacing"] == [1.0, 1.0, 2.0]
    assert payload["in_channels"] == 2 and payload["out_channels"] == 3
    assert len(payload["crop_normalizers"]) == 2
    loaded = jax.tree_util.tree_map(jnp.asarray, loaded)
    np.testing.assert_allclose(
        np.asarray(net.apply(loaded, x, train=False)),
        np.asarray(net.apply(variables, x, train=False)), atol=1e-6)


def test_latest_checkpoint_scan(tmp_path, net_and_vars):
    _, variables, _ = net_and_vars
    save_dir = str(tmp_path / "run2")
    for e in (0, 10, 5):
        model_io.save_checkpoint(save_dir, e, e, variables, "vnet", 16, 2, 3,
                                 [1, 1, 1], "LINEAR", [])
    assert model_io.latest_checkpoint(save_dir).endswith("chk_10")
    with pytest.raises(FileNotFoundError):
        model_io.latest_checkpoint(str(tmp_path / "nope"))


def test_torch_can_read_checkpoint(tmp_path, net_and_vars):
    """The .pth payload must be loadable by torch.load (interop contract)."""
    import torch
    _, variables, _ = net_and_vars
    save_dir = str(tmp_path / "run3")
    chk = model_io.save_checkpoint(save_dir, 0, 0, variables, "vnet", 16, 2, 3,
                                   [1, 1, 1], "LINEAR", [FixedNormalizer(0, 1)])
    payload = torch.load(f"{chk}/params.pth", map_location="cpu", weights_only=False)
    assert payload["net"] == "vnet"
    sd = payload["state_dict"]
    # real torch tensors, so the reference's strict load_state_dict accepts
    # them directly (see test_torch_import.test_reverse_interop_strict_torch_load)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())


def test_torch_saved_checkpoint_loads(tmp_path, net_and_vars):
    """A checkpoint written by torch.save (reference-style) loads back."""
    import torch
    net, variables, x = net_and_vars
    state, layouts = model_io.flatten_variables(variables)
    payload = {
        "epoch_idx": 3, "batch_idx": 9, "net": "vnet", "max_stride": 16,
        "state_dict": {k: torch.tensor(v) for k, v in state.items()},
        "_kernel_layouts": layouts,
        "spacing": [1.0, 1.0, 1.0], "interpolation": "LINEAR",
        "in_channels": 2, "out_channels": 3, "crop_normalizers": [],
    }
    chk = tmp_path / "tref" / "checkpoints" / "chk_3"
    chk.mkdir(parents=True)
    torch.save(payload, str(chk / "params.pth"))
    loaded, meta = model_io.load_checkpoint(str(chk))
    assert meta["epoch_idx"] == 3
    loaded = jax.tree_util.tree_map(jnp.asarray, loaded)
    np.testing.assert_allclose(
        np.asarray(net.apply(loaded, x, train=False)),
        np.asarray(net.apply(variables, x, train=False)), atol=1e-6)


def test_save_is_atomic_under_write_failure(tmp_path, net_and_vars, monkeypatch):
    """A crash mid-save must never leave a truncated params.pth: the write
    goes to a .tmp sibling and is os.replace'd only when complete, so an
    existing checkpoint under the same name survives the failed overwrite."""
    import torch
    _, variables, _ = net_and_vars
    save_dir = str(tmp_path / "run_atomic")
    norms = [FixedNormalizer(0, 1), AdaptiveNormalizer()]
    chk = model_io.save_checkpoint(save_dir, 3, 30, variables, "vnet", 16,
                                   2, 3, [1.0, 1.0, 1.0], "LINEAR", norms)
    before = open(f"{chk}/params.pth", "rb").read()

    real_save = torch.save

    def dying_save(obj, path, *a, **kw):
        real_save(obj, path, *a, **kw)  # the tmp file IS written...
        with open(path, "r+b") as f:    # ...then truncated mid-flush
            f.truncate(10)
        raise OSError("simulated crash during checkpoint write")

    monkeypatch.setattr(torch, "save", dying_save)
    with pytest.raises(OSError, match="simulated crash"):
        model_io.save_checkpoint(save_dir, 3, 31, variables, "vnet", 16,
                                 2, 3, [1.0, 1.0, 1.0], "LINEAR", norms)
    monkeypatch.undo()

    # the visible checkpoint is byte-identical to the pre-crash save and
    # still the latest-scan result; only the .tmp residue differs
    assert open(f"{chk}/params.pth", "rb").read() == before
    assert model_io.latest_checkpoint(save_dir) == chk
    loaded, payload = model_io.load_checkpoint(chk)
    assert payload["batch_idx"] == 30


def test_prune_checkpoints_keeps_newest_and_best(tmp_path, net_and_vars):
    _, variables, _ = net_and_vars
    save_dir = str(tmp_path / "run_prune")
    norms = [FixedNormalizer(0, 1), AdaptiveNormalizer()]
    for e in (0, 5, 10, 15):
        model_io.save_checkpoint(save_dir, e, e, variables, "vnet", 16,
                                 2, 3, [1.0, 1.0, 1.0], "LINEAR", norms)
    model_io.save_checkpoint(save_dir, 10, 10, variables, "vnet", 16,
                             2, 3, [1.0, 1.0, 1.0], "LINEAR", norms,
                             dir_name="chk_best")

    assert model_io.prune_checkpoints(save_dir, 0) == []  # default: keep all
    removed = model_io.prune_checkpoints(save_dir, 2)
    assert sorted(os.path.basename(d) for d in removed) == ["chk_0", "chk_5"]
    left = sorted(os.listdir(os.path.join(save_dir, "checkpoints")))
    assert left == ["chk_10", "chk_15", "chk_best"]
    assert model_io.latest_checkpoint(save_dir).endswith("chk_15")
    # keep larger than what exists: no-op
    assert model_io.prune_checkpoints(save_dir, 10) == []


def test_prune_ignores_crash_residue(tmp_path, net_and_vars):
    """A chk_<n> dir without params.pth (crash residue, e.g. a lone
    params.pth.tmp) must not occupy a keep slot and displace an older but
    LOADABLE checkpoint (round-3 advisor finding)."""
    _, variables, _ = net_and_vars
    save_dir = str(tmp_path / "run_residue")
    norms = [FixedNormalizer(0, 1), AdaptiveNormalizer()]
    for e in (0, 5, 10):
        model_io.save_checkpoint(save_dir, e, e, variables, "vnet", 16,
                                 2, 3, [1.0, 1.0, 1.0], "LINEAR", norms)
    residue = os.path.join(save_dir, "checkpoints", "chk_20")
    os.makedirs(residue)
    with open(os.path.join(residue, "params.pth.tmp"), "wb") as f:
        f.write(b"truncated")
    removed = model_io.prune_checkpoints(save_dir, 2)
    # keep=2 counts only loadable checkpoints: chk_5 + chk_10 survive,
    # chk_0 is pruned, the residue is not a candidate (neither kept nor
    # deleted — it is not a checkpoint)
    assert sorted(os.path.basename(d) for d in removed) == ["chk_0"]
    left = sorted(os.listdir(os.path.join(save_dir, "checkpoints")))
    assert left == ["chk_10", "chk_20", "chk_5"]
    assert model_io.latest_checkpoint(save_dir).endswith("chk_10")
