"""Config loading + logging utilities.

Re-implements ``segmentation3d/utils/file_io.py``: ``load_config`` (≈L10-25,
exec of a python config file) and ``setup_logger`` (≈L30-55, file+stdout
logger writing ``<save_dir>/train_log.txt``).

``load_config`` installs import shims first so that configs written for the
PyTorch reference — ``from easydict import EasyDict`` and
``from segmentation3d.utils.normalizer import FixedNormalizer ...`` — execute
unmodified against this framework.
"""
from __future__ import annotations

import importlib
import importlib.util
import logging
import os
import sys
import types


def _install_compat_shims() -> None:
    """Register ``easydict`` and ``segmentation3d.*`` aliases in sys.modules."""
    if "easydict" not in sys.modules:
        try:
            importlib.import_module("easydict")
        except ImportError:
            shim = types.ModuleType("easydict")
            from segmentation3d_tpu.config.config import EasyDict
            shim.EasyDict = EasyDict
            sys.modules["easydict"] = shim
    if "segmentation3d" not in sys.modules:
        try:
            importlib.import_module("segmentation3d")
        except ImportError:
            alias_map = {
                "segmentation3d": "segmentation3d_tpu",
                "segmentation3d.utils": "segmentation3d_tpu.utils",
                "segmentation3d.utils.normalizer": "segmentation3d_tpu.utils.normalizer",
                "segmentation3d.utils.file_io": "segmentation3d_tpu.utils.file_io",
                "segmentation3d.utils.image_tools": "segmentation3d_tpu.utils.image_tools",
                "segmentation3d.loss": "segmentation3d_tpu.losses",
                "segmentation3d.network": "segmentation3d_tpu.models",
            }
            for alias, target in alias_map.items():
                try:
                    sys.modules[alias] = importlib.import_module(target)
                except ImportError:
                    pass


def load_config(config_file: str):
    """Execute a python config file and return its ``cfg`` object."""
    config_file = os.path.abspath(config_file)
    if not os.path.isfile(config_file):
        raise FileNotFoundError(config_file)
    _install_compat_shims()
    spec = importlib.util.spec_from_file_location("seg3d_user_config", config_file)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    if not hasattr(module, "cfg"):
        raise ValueError(f"{config_file} does not define a `cfg` object")
    return module.cfg


def setup_logger(log_file: str, name: str = "seg3d", to_file: bool = True):
    """File + stdout logger; reference format: per-batch lines into
    ``train_log.txt``. ``to_file=False`` keeps stdout only (non-primary
    processes of a multi-host run must not race on the shared log file)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s",
                            datefmt="%m-%d %H:%M:%S")
    if to_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    logger.propagate = False
    return logger
