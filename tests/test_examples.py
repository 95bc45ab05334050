"""The shipped example configs must stay loadable by the real config
loader (guards the examples against config-format drift)."""
import glob
import os

import pytest

from segmentation3d_tpu.utils.file_io import load_config

import pytest as _pytest
pytestmark = _pytest.mark.slow  # expensive integration tier (VERDICT r4 #7)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "**", "*.py"),
                            recursive=True))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.relpath(p, REPO)
                                                for p in EXAMPLES])
def test_example_config_loads(path):
    cfg = load_config(path)
    # the sections every consumer reads
    for section in ("general", "dataset", "loss", "net", "train", "debug"):
        assert section in cfg, section
    assert len(cfg.dataset.crop_normalizers) == cfg.dataset.num_modality
    assert all(c % 16 == 0 for c in cfg.dataset.crop_size)
    if cfg.get("tpu", {}).get("conv_backend") == "packed_domain":
        # in_block packing constraint (models/packed_vnet.py:_p_for)
        base = int(cfg.net.get("base_channels", 16))
        p0 = max(128 // base, 1)
        assert cfg.dataset.crop_size[0] % p0 == 0


def test_examples_exist():
    assert len(EXAMPLES) >= 4
