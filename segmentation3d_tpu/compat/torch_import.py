"""Structural import of reference-trained PyTorch checkpoints.

The reference's ``params.pth`` stores a torch ``state_dict`` whose exact
module names may differ from this framework's canonical names. PyTorch
state_dicts preserve module definition order, and the reference V-Net and
ours share the same topology (in_block -> 4 down stages -> 4 up stages ->
out_block, SURVEY.md §3.3), so tensors can be matched **positionally** with
shape/layout validation:

- 5-D tensors are conv kernels ([O,I,kD,kH,kW] -> flax [kD,kH,kW,I,O];
  transposed convs [I,O,kD,kH,kW] are recognized by the 2x2x2 kernel +
  position),
- 1-D tensors appear in BatchNorm groups (weight, bias, running_mean,
  running_var) or as conv biases, disambiguated by the following keys'
  names where available and group arity otherwise.
"""
from __future__ import annotations

import numpy as np

from segmentation3d_tpu.utils import model_io


def template_entries(net, example_shape):
    """Ordered (key, shape, layout) template from a freshly-initialized net."""
    import jax
    import jax.numpy as jnp
    x = jnp.zeros(example_shape, jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    state, layouts = model_io.flatten_variables(variables)
    # num_batches_tracked is emitted for reference-side strict restores but
    # has no flax equivalent — not part of the positional template
    return [(k, np.asarray(v).shape, layouts[k]) for k, v in state.items()
            if not k.endswith("num_batches_tracked")], variables


def _is_stat(key: str) -> bool:
    return key.endswith("running_mean") or key.endswith("running_var")


def import_torch_state_dict(torch_sd: dict, net, example_shape):
    """Map an arbitrary-named torch state_dict onto our net by position.

    Parameters and BatchNorm running statistics are matched as two separate
    ordered streams: PyTorch interleaves ``running_mean``/``running_var``
    after each BN's weight/bias while our flat template lists all params
    first — but the RELATIVE order within each stream is the module
    definition order on both sides, so positional matching per stream is
    exact. Returns flax ``variables``; raises ValueError on a structural
    mismatch.
    """
    entries, _ = template_entries(net, example_shape)
    src = [(k, np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v))
           for k, v in torch_sd.items() if not k.endswith("num_batches_tracked")]

    ours_params = [e for e in entries if not _is_stat(e[0])]
    ours_stats = [e for e in entries if _is_stat(e[0])]
    src_params = [e for e in src if not _is_stat(e[0])]
    src_stats = [e for e in src if _is_stat(e[0])]
    if len(src_params) != len(ours_params) or len(src_stats) != len(ours_stats):
        raise ValueError(
            f"structural mismatch: checkpoint has {len(src_params)} params + "
            f"{len(src_stats)} running stats, net expects {len(ours_params)} + "
            f"{len(ours_stats)}")

    mapped, layouts = {}, {}
    for (our_key, our_shape, layout), (their_key, arr) in zip(
            ours_params + ours_stats, src_params + src_stats):
        if tuple(arr.shape) != tuple(our_shape):
            raise ValueError(
                f"shape mismatch at {our_key} <- {their_key}: "
                f"got {arr.shape}, expected {our_shape}")
        mapped[our_key] = arr
        layouts[our_key] = layout
    return model_io.unflatten_state_dict(mapped, layouts)
