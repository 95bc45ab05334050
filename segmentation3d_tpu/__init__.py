"""segmentation3d_tpu — TPU-native 3D medical image segmentation framework.

A ground-up JAX/XLA/Pallas rebuild with the full capability surface of the
PyTorch reference toolkit ``qinliuliuqin/Medical-Segmentation3d-Toolkit``
(see SURVEY.md at the repo root for the component inventory this implements):

- world-frame geometry + first-party NIfTI/MHA volume I/O (``io``, ``ops.geometry``)
- device-side fixed-spacing resampling / cropping / partitioning (``ops``)
- V-Net model family in flax (``models``), string registry by config name
- soft-Dice / Focal losses (``losses``)
- python-file config system compatible with the reference (``config``)
- patch-sampling data pipeline (``dataloader``)
- jitted train loop + sliding-window inference engine (``core``)
- self-describing ``chk_<epoch>/params.pth`` checkpoints (``utils.model_io``)
- mesh/data-parallel utilities (``parallel``)
- ``seg_train`` / ``seg_infer`` CLIs (``cli``)
"""

__version__ = "0.1.0"
