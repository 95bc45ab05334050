"""``seg_convert`` console script — import a reference-trained PyTorch
checkpoint into this framework's native checkpoint layout, once.

``seg_infer`` already loads foreign torch checkpoints transparently via the
positional structural importer (``compat/torch_import.py``, SURVEY.md C13),
but that re-runs the import on every load and needs torch installed.
Converting once writes a native self-describing ``chk_<epoch>/params.pth``
(still torch-loadable, see ``utils/model_io.py:save_checkpoint``):

    seg_convert -i <model_dir | chk_dir | params.pth> -o <out_model_dir>

The source payload must be self-describing (the reference's own
``save_checkpoint`` layout: net name, in/out channels, spacing,
interpolation, crop_normalizers) — exactly what its model zoo ships.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from segmentation3d_tpu.models import get_network_module
from segmentation3d_tpu.utils import model_io
from segmentation3d_tpu.utils.normalizer import normalizer_from_dict


def convert_checkpoint(input_path: str, out_model_dir: str) -> str:
    """Convert one checkpoint; returns the written chk dir."""
    if os.path.isfile(input_path):  # a bare params.pth
        chk = os.path.dirname(os.path.abspath(input_path))
    elif os.path.isfile(os.path.join(input_path, "params.pth")):
        chk = input_path
    else:  # a model dir: pick the latest epoch like seg_infer does
        chk = model_io.latest_checkpoint(input_path)
    payload = model_io.load_checkpoint_payload(chk)

    for key in ("net", "in_channels", "out_channels", "spacing",
                "crop_normalizers", "max_stride"):
        if key not in payload:
            raise ValueError(
                f"{chk}/params.pth is not a self-describing segmentation "
                f"checkpoint: missing '{key}'")

    net_mod = get_network_module(payload["net"])
    net_kwargs = dict(payload.get("net_kwargs") or {})
    net_kwargs.pop("dtype", None)
    net = net_mod.SegmentationNet(
        in_channels=int(payload["in_channels"]),
        out_channels=int(payload["out_channels"]),
        **net_kwargs)

    if "_kernel_layouts" in payload:  # already native
        variables = model_io.unflatten_state_dict(
            payload["state_dict"], payload["_kernel_layouts"])
        print(f"{chk}: already in native layout; re-saving")
    else:
        from segmentation3d_tpu.compat.torch_import import import_torch_state_dict
        ms = int(payload["max_stride"])
        example = (1, ms, ms, ms, int(payload["in_channels"]))
        variables = import_torch_state_dict(payload["state_dict"], net, example)

    normalizers = [normalizer_from_dict(d) for d in payload["crop_normalizers"]]
    out_chk = model_io.save_checkpoint(
        save_dir=out_model_dir,
        epoch_idx=int(payload.get("epoch_idx", 0)),
        batch_idx=int(payload.get("batch_idx", 0)),
        variables=variables,
        net_name=payload["net"],
        max_stride=int(payload["max_stride"]),
        in_channels=int(payload["in_channels"]),
        out_channels=int(payload["out_channels"]),
        spacing=[float(s) for s in payload["spacing"]],
        interpolation=payload.get("interpolation", "LINEAR"),
        crop_normalizers=normalizers,
        extra={"net_kwargs": net_kwargs} if net_kwargs else None,
    )
    n_params = sum(int(np.asarray(v).size)
                   for v in model_io.flatten_variables(variables)[0].values())
    print(f"converted {chk} -> {out_chk} ({n_params:,} tensor elements)")
    return out_chk


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert a PyTorch-reference checkpoint to native layout")
    parser.add_argument("-i", "--input", required=True,
                        help="model dir, chk_<epoch> dir, or params.pth file")
    parser.add_argument("-o", "--output", required=True,
                        help="output model directory")
    args = parser.parse_args(argv)
    convert_checkpoint(args.input, args.output)


if __name__ == "__main__":
    main()
