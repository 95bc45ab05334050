import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.compat.torch_import import import_torch_state_dict
from segmentation3d_tpu.utils import model_io


def test_positional_import_roundtrip():
    """Rename all keys to reference-style arbitrary names; positional import
    must reconstruct an equivalent net."""
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    state, _ = model_io.flatten_variables(variables)
    renamed = {f"module.layer{i}.whatever_{k.split('.')[-1]}": torch.tensor(v)
               for i, (k, v) in enumerate(state.items())}
    imported = import_torch_state_dict(renamed, net, (1, 16, 16, 16, 1))
    imported = jax.tree_util.tree_map(jnp.asarray, imported)
    np.testing.assert_allclose(
        np.asarray(net.apply(imported, x, train=False)),
        np.asarray(net.apply(variables, x, train=False)), atol=1e-6)


def test_import_genuine_torch_vnet():
    """A REAL torch V-Net's state_dict imports and reproduces the torch
    forward within bf16-free f32 tolerance — the Dice-parity contract."""
    from torch_vnet_ref import TorchVNet
    torch.manual_seed(0)
    tnet = TorchVNet(in_ch=1, out_ch=2, base=4).eval()
    # randomize running stats so BN import is actually exercised
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    variables = import_torch_state_dict(tnet.state_dict(), net,
                                        (1, 16, 16, 16, 1))
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    ours = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tnet(torch.tensor(x.transpose(0, 4, 1, 2, 3)))
    theirs = theirs.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
    agree = np.mean(np.argmax(ours, -1) == np.argmax(theirs, -1))
    assert agree == 1.0, f"argmax agreement {agree}"


def test_load_seg_model_with_reference_named_checkpoint(tmp_path):
    """A reference-style checkpoint (torch-saved, foreign module names) loads
    through load_seg_model's positional-import fallback and runs inference."""
    from torch_vnet_ref import TorchVNet
    torch.manual_seed(1)
    tnet = TorchVNet(in_ch=1, out_ch=2, base=4).eval()
    payload = {
        "epoch_idx": 100, "batch_idx": 999, "net": "vnet", "max_stride": 16,
        "state_dict": tnet.state_dict(),
        "spacing": [1.0, 1.0, 1.0], "interpolation": "LINEAR",
        "in_channels": 1, "out_channels": 2,
        "crop_normalizers": [{"type": 0, "mean": 0.0, "stddev": 1.0, "clip": True}],
        "net_kwargs": {"base_channels": 4},
    }
    chk = tmp_path / "refmodel" / "checkpoints" / "chk_100"
    chk.mkdir(parents=True)
    torch.save(payload, str(chk / "params.pth"))

    from segmentation3d_tpu.core.seg_infer import load_seg_model
    model = load_seg_model(str(tmp_path / "refmodel"))
    assert model.epoch_idx == 100
    x = np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)).astype(np.float32)
    ours = np.asarray(model.net.apply(model.variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = tnet(torch.tensor(x.transpose(0, 4, 1, 2, 3)))
    theirs = theirs.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_import_rejects_wrong_count_and_shape():
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x_shape = (1, 16, 16, 16, 1)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros(x_shape), train=False)
    state, _ = model_io.flatten_variables(variables)
    items = list(state.items())
    with pytest.raises(ValueError, match="structural mismatch"):
        # drop a param entry (the last entries are BN counters, which the
        # importer legitimately ignores — drop the first, a conv weight)
        import_torch_state_dict(dict(items[1:]), net, x_shape)
    bad = dict(items)
    k0 = items[0][0]
    bad[k0] = np.zeros((1, 2, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_torch_state_dict(bad, net, x_shape)


def test_reverse_interop_strict_torch_load(tmp_path):
    """OUR checkpoint restores into a torch V-Net with
    ``load_state_dict(strict=True)`` — values are real torch tensors, BN
    ``num_batches_tracked`` counters are present, layouts convert — and the
    torch forward matches the flax forward (ours -> reference direction of
    SURVEY.md C13; see NamedTorchVNet for the naming caveat)."""
    from torch_vnet_ref import NamedTorchVNet
    from segmentation3d_tpu.utils.normalizer import FixedNormalizer

    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=4)
    x0 = jnp.zeros((1, 16, 16, 16, 1))
    variables = net.init(jax.random.PRNGKey(3), x0, train=False)
    # randomize BN running stats so the BN restore is actually exercised
    rng = np.random.default_rng(0)
    variables = jax.device_get(variables)
    def _randomize(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return rng.uniform(-0.5, 0.5, np.shape(leaf)).astype(np.float32)
        if name == "var":
            return rng.uniform(0.5, 2.0, np.shape(leaf)).astype(np.float32)
        return leaf
    variables["batch_stats"] = jax.tree_util.tree_map_with_path(
        _randomize, variables["batch_stats"])

    model_io.save_checkpoint(
        str(tmp_path), 0, 0, variables, net_name="vnet", max_stride=16,
        in_channels=1, out_channels=2, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR",
        crop_normalizers=[FixedNormalizer(mean=0.0, stddev=1.0)])

    payload = torch.load(str(tmp_path / "checkpoints" / "chk_0" / "params.pth"),
                         map_location="cpu", weights_only=False)
    sd = payload["state_dict"]
    assert all(isinstance(v, torch.Tensor) for v in sd.values()), (
        "state_dict values must be torch tensors for reference-side restore")
    assert any(k.endswith("num_batches_tracked") for k in sd)

    tnet = NamedTorchVNet(1, 2, base=4).eval()
    tnet.load_state_dict(sd, strict=True)  # raises on ANY name/shape mismatch

    x = rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x)).numpy()  # [B,C,D,H,W]
    j_out = np.asarray(net.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1)), train=False))
    np.testing.assert_allclose(np.transpose(j_out, (0, 4, 1, 2, 3)), t_out,
                               atol=1e-5)
