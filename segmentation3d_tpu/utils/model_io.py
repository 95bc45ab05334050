"""Checkpoint I/O — reference-compatible layout and self-describing payload.

Re-implements ``segmentation3d/utils/model_io.py``: ``save_checkpoint``
(≈L10-50), ``load_checkpoint`` (≈L55-80) and the latest-checkpoint scan
(≈L85-110), preserving the load-bearing contract (SURVEY.md §3.4):

- on-disk layout ``<save_dir>/checkpoints/chk_<epoch>/params.pth`` plus a
  copy of the training config .py in the same directory;
- the ``params.pth`` dict is **self-describing**: it embeds ``epoch_idx``,
  ``batch_idx``, ``net`` (registry name), ``max_stride``, ``state_dict``,
  ``spacing``, ``interpolation``, ``in_channels``, ``out_channels`` and
  ``crop_normalizers`` (normalizer ``to_dict()`` payloads), so ``seg_infer``
  reconstructs everything from the model dir alone — it never reads the
  training config.

The ``state_dict`` stores numpy arrays under torch-style names/layouts
(conv ``weight`` as [O,I,kD,kH,kW], BN ``running_mean``/``running_var``), so
the file is a plain pickle readable by ``torch.load`` and by this framework
alike. A ``_kernel_layouts`` side table records each tensor's role, making
the flax<->torch layout conversion lossless and generic.
"""
from __future__ import annotations

import glob
import os
import pickle
import re
import shutil

import numpy as np


# ---------------------------------------------------------------------------
# flax variables <-> torch-style flat state_dict
# ---------------------------------------------------------------------------

def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict) or hasattr(v, "items"):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def flatten_variables(variables) -> tuple[dict, dict]:
    """Flax ``{'params': ..., 'batch_stats': ...}`` -> (state_dict, layouts).

    Layout tags: ``conv`` (HWIO->OIDHW... here DHWIO->OIDHW), ``conv_transpose``
    (DHWIO->IODHW), ``tensor`` (stored as-is).
    """
    state, layouts = {}, {}
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})

    for path, leaf in _walk(params):
        mods, leaf_name = path[:-1], path[-1]
        arr = np.asarray(leaf)
        name = ".".join(mods)
        if leaf_name == "kernel" and arr.ndim == 5:
            is_transpose = any("up_conv" in m for m in mods)
            if is_transpose:
                # flax ConvTranspose correlates; torch ConvTranspose3d
                # convolves — spatial axes flip between the two layouts
                state[f"{name}.weight"] = np.ascontiguousarray(
                    arr[::-1, ::-1, ::-1].transpose(3, 4, 0, 1, 2))
                layouts[f"{name}.weight"] = "conv_transpose"
            else:
                state[f"{name}.weight"] = np.ascontiguousarray(arr.transpose(4, 3, 0, 1, 2))
                layouts[f"{name}.weight"] = "conv"
        elif leaf_name == "kernel":
            state[f"{name}.weight"] = np.ascontiguousarray(arr.T)
            layouts[f"{name}.weight"] = "linear"
        elif leaf_name == "scale":
            state[f"{name}.weight"] = arr
            layouts[f"{name}.weight"] = "tensor"
        elif leaf_name == "bias":
            state[f"{name}.bias"] = arr
            layouts[f"{name}.bias"] = "tensor"
        else:  # e.g. prelu alpha
            state[f"{name}.{leaf_name}"] = arr
            layouts[f"{name}.{leaf_name}"] = "tensor"

    for path, leaf in _walk(stats):
        mods, leaf_name = path[:-1], path[-1]
        name = ".".join(mods)
        suffix = {"mean": "running_mean", "var": "running_var"}.get(leaf_name, leaf_name)
        state[f"{name}.{suffix}"] = np.asarray(leaf)
        layouts[f"{name}.{suffix}"] = "tensor"
        if suffix == "running_var":
            # torch BN modules carry this counter; the reference's strict
            # net.load_state_dict rejects checkpoints without it (SURVEY.md
            # C13) — emit it so OUR checkpoints restore into the reference
            state[f"{name}.num_batches_tracked"] = np.asarray(0, np.int64)
            layouts[f"{name}.num_batches_tracked"] = "tensor"
    return state, layouts


def unflatten_state_dict(state: dict, layouts: dict | None = None):
    """Inverse of :func:`flatten_variables` -> flax variables dict."""
    layouts = layouts or {}
    params, stats = {}, {}

    def insert(root, path, leaf_name, value):
        node = root
        for p in path:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    for key, arr in state.items():
        if key.startswith("_") or key.endswith("num_batches_tracked"):
            continue  # torch-only BN counter, no flax equivalent
        parts = key.split(".")
        mods, suffix = parts[:-1], parts[-1]
        arr = np.asarray(arr)
        layout = layouts.get(key)
        if suffix == "running_mean":
            insert(stats, mods, "mean", arr)
        elif suffix == "running_var":
            insert(stats, mods, "var", arr)
        elif suffix == "weight":
            if layout == "conv" or (layout is None and arr.ndim == 5
                                    and not any("up_conv" in m for m in mods)):
                insert(params, mods, "kernel", np.ascontiguousarray(arr.transpose(2, 3, 4, 1, 0)))
            elif layout == "conv_transpose" or (layout is None and arr.ndim == 5):
                insert(params, mods, "kernel", np.ascontiguousarray(
                    arr.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1]))
            elif layout == "linear" or (layout is None and arr.ndim == 2):
                insert(params, mods, "kernel", np.ascontiguousarray(arr.T))
            else:  # BN scale / 1-D weight
                insert(params, mods, "scale", arr)
        elif suffix == "bias":
            insert(params, mods, "bias", arr)
        else:
            insert(params, mods, suffix, arr)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


# ---------------------------------------------------------------------------
# save / load / scan
# ---------------------------------------------------------------------------

def checkpoint_dir(save_dir: str, epoch_idx: int) -> str:
    return os.path.join(save_dir, "checkpoints", f"chk_{epoch_idx}")


def save_checkpoint(save_dir: str, epoch_idx: int, batch_idx: int, variables,
                    net_name: str, max_stride: int, in_channels: int,
                    out_channels: int, spacing, interpolation: str,
                    crop_normalizers, config_file: str | None = None,
                    opt_state=None, extra: dict | None = None,
                    dir_name: str | None = None) -> str:
    """Write ``chk_<epoch>/params.pth`` (+ config copy). Returns the chk dir.

    ``dir_name`` overrides the directory name (e.g. ``chk_best`` for the
    best-validation checkpoint — non-numeric names are invisible to
    :func:`latest_checkpoint`, so the reference layout contract holds)."""
    chk = os.path.join(save_dir, "checkpoints", dir_name) if dir_name \
        else checkpoint_dir(save_dir, epoch_idx)
    os.makedirs(chk, exist_ok=True)
    state_dict, layouts = flatten_variables(variables)
    payload = {
        "epoch_idx": int(epoch_idx),
        "batch_idx": int(batch_idx),
        "net": net_name,
        "max_stride": int(max_stride),
        "state_dict": state_dict,
        "_kernel_layouts": layouts,
        "spacing": [float(s) for s in spacing],
        "interpolation": interpolation,
        "in_channels": int(in_channels),
        "out_channels": int(out_channels),
        "crop_normalizers": [n.to_dict() for n in crop_normalizers],
    }
    if extra:
        payload.update(extra)
    # Writes are ATOMIC (tmp file + os.replace): the latest-checkpoint scan
    # accepts any chk_<n> dir containing a params.pth, so a crash mid-save
    # must never leave a truncated file under that name.
    params_path = os.path.join(chk, "params.pth")
    tmp_path = params_path + ".tmp"
    try:
        # torch.save with REAL torch tensors in state_dict: the reference
        # toolkit's `net.load_state_dict(torch.load(...)['state_dict'])`
        # (strict by default) then works on our checkpoints verbatim.
        import torch
        payload = dict(payload)
        payload["state_dict"] = {
            k: torch.as_tensor(np.ascontiguousarray(v))
            for k, v in state_dict.items()}
        torch.save(payload, tmp_path)
    except ImportError:
        with open(tmp_path, "wb") as f:
            pickle.dump(payload, f, protocol=4)
    os.replace(tmp_path, params_path)
    if opt_state is not None:
        opt_path = os.path.join(chk, "opt_state.pkl")
        with open(opt_path + ".tmp", "wb") as f:
            pickle.dump(opt_state, f, protocol=4)
        os.replace(opt_path + ".tmp", opt_path)
    if config_file and os.path.isfile(config_file):
        shutil.copy(config_file, os.path.join(chk, os.path.basename(config_file)))
    return chk


def prune_checkpoints(save_dir: str, keep: int) -> list[str]:
    """Delete all but the newest ``keep`` numeric ``chk_<n>`` directories
    (``cfg.train.keep_checkpoints`` — ADDITIVE; the reference keeps every
    checkpoint, which stays the default). Non-numeric names (``chk_best``)
    are never touched. Returns the removed directories."""
    if not keep or keep <= 0:
        return []
    candidates = []
    for d in glob.glob(os.path.join(save_dir, "checkpoints", "chk_*")):
        m = re.match(r".*chk_(\d+)$", d)
        # only LOADABLE checkpoints occupy keep slots (same params.pth
        # filter as latest_checkpoint): crash residue like a lone
        # params.pth.tmp must not displace an older but valid checkpoint
        if m and os.path.isfile(os.path.join(d, "params.pth")):
            candidates.append((int(m.group(1)), d))
    candidates.sort()
    doomed = [d for _, d in candidates[:-keep]]
    for d in doomed:
        shutil.rmtree(d)
    return doomed


def load_checkpoint_payload(chk_dir: str) -> dict:
    """Read a ``params.pth`` dict (ours, or a torch-saved one via torch.load).

    Tensor values (from torch-saved files) come back as numpy arrays."""
    path = os.path.join(chk_dir, "params.pth")
    try:
        with open(path, "rb") as f:
            payload = pickle.load(f)
    except (pickle.UnpicklingError, ModuleNotFoundError, AttributeError,
            EOFError, ValueError) as pickle_err:
        # torch-saved file (zip container / torch tensor classes): needs torch
        try:
            import torch
        except ImportError:
            raise RuntimeError(
                f"{path} is not a plain pickle (likely torch-saved); install "
                f"torch to load it, or re-save with the pickle backend"
            ) from pickle_err
        payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", {})
    payload["state_dict"] = {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in sd.items()
    }
    return payload


def load_checkpoint(chk_dir: str):
    """-> (flax variables, payload metadata dict)."""
    payload = load_checkpoint_payload(chk_dir)
    variables = unflatten_state_dict(payload["state_dict"],
                                     payload.get("_kernel_layouts"))
    return variables, payload


def load_opt_state(chk_dir: str):
    path = os.path.join(chk_dir, "opt_state.pkl")
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def resolve_checkpoint(model_dir: str, which=None) -> str:
    """Checkpoint dir for a selector: ``None``/``'latest'`` -> highest
    epoch; ``'best'`` -> ``chk_best`` (written by ``cfg.train.save_best``);
    an int or digit string -> ``chk_<n>``."""
    if which is None or which == "latest":
        return latest_checkpoint(model_dir)
    if which == "best":
        chk = os.path.join(model_dir, "checkpoints", "chk_best")
        if not os.path.isfile(os.path.join(chk, "params.pth")):
            raise FileNotFoundError(
                f"{chk} not found — train with cfg.train.save_best = True "
                "(and a val_list) to produce a best-validation checkpoint")
        return chk
    try:
        epoch = int(which)
    except (TypeError, ValueError):
        raise ValueError(f"checkpoint selector must be 'latest', 'best' or "
                         f"an epoch number, got {which!r}") from None
    chk = checkpoint_dir(model_dir, epoch)
    if not os.path.isfile(os.path.join(chk, "params.pth")):
        raise FileNotFoundError(f"no checkpoint at {chk}")
    return chk


def latest_checkpoint(model_dir: str) -> str:
    """Scan ``<model_dir>/checkpoints/chk_*`` for the highest epoch."""
    pattern = os.path.join(model_dir, "checkpoints", "chk_*")
    candidates = []
    for d in glob.glob(pattern):
        m = re.match(r".*chk_(\d+)$", d)
        if m and os.path.isfile(os.path.join(d, "params.pth")):
            candidates.append((int(m.group(1)), d))
    if not candidates:
        raise FileNotFoundError(f"no checkpoints found under {pattern}")
    return max(candidates)[1]
