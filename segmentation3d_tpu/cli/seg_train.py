"""``seg_train`` console script — argument-compatible with the reference CLI
(``segmentation3d/seg_train.py:main()`` ≈L1-30): ``seg_train -i config.py``.
"""
from __future__ import annotations

import argparse

from segmentation3d_tpu.core.seg_train import train


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a 3D segmentation model")
    parser.add_argument("-i", "--input", required=True,
                        help="path to the python config file")
    args = parser.parse_args(argv)
    train(args.input)


if __name__ == "__main__":
    main()
