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
    parser.add_argument("--folds", type=int, default=None, metavar="K",
                        help="K-fold cross-validation: split the case list "
                             "deterministically, train each fold on the "
                             "other K-1 with the fold as val_list, into "
                             "<save_dir>_fold<k> (ensemble at inference "
                             "with repeated seg_infer -m)")
    parser.add_argument("--fold", type=int, default=None, metavar="k",
                        help="with --folds: train only fold k (parallelize "
                             "folds across hosts/sessions)")
    args = parser.parse_args(argv)
    if args.fold is not None and args.folds is None:
        parser.error("--fold requires --folds")
    if args.folds is not None:
        from segmentation3d_tpu.core.folds import train_folds
        train_folds(args.input, args.folds, fold=args.fold)
    else:
        train(args.input)


if __name__ == "__main__":
    main()
