"""K-fold cross-validation management (``seg_train --folds K``).

nnU-Net-style sugar BEYOND the reference (whose workflow trains one model
per hand-made split): one config file + ``--folds K`` deterministically
splits the case list into K folds, trains fold ``k`` on the other K-1
folds with fold ``k`` as the in-training validation list
(``cfg.train.val_list`` → per-class Dice at every save point, `chk_best`
when ``cfg.train.save_best``), into ``<save_dir>_fold<k>``. The trained
folds ensemble directly at inference: ``seg_infer -m d_fold0 -m d_fold1
...`` (on-device probability averaging, core/seg_infer.py).

Everything is materialized as plain files (fold case lists in the
reference txt format + a small wrapper config that execs the user's
config and overrides ``imseg_list``/``save_dir``/``val_list``), so a fold
run is exactly a normal ``seg_train`` run — resumable, inspectable, and
reproducible from the written artifacts alone.
"""
from __future__ import annotations

import os

import numpy as np


def split_folds(n_cases: int, k: int, seed: int = 0):
    """Deterministic shuffled partition of ``range(n_cases)`` into ``k``
    folds (sizes differ by at most 1). Same (n, k, seed) -> same split."""
    if k < 2:
        raise ValueError(f"--folds must be >= 2, got {k}")
    if n_cases < k:
        raise ValueError(f"{n_cases} case(s) cannot split into {k} folds")
    idx = np.random.default_rng(seed).permutation(n_cases)
    return [sorted(int(i) for i in idx[f::k]) for f in range(k)]


def _write_case_list(path, ims, segs, indices):
    lines = [str(len(indices))]
    for i in indices:
        lines.extend(ims[i])
        lines.append(segs[i])
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def prepare_fold(config_file: str, k_folds: int, fold: int) -> str:
    """Materialize fold ``fold``'s artifacts; returns the wrapper config
    path ready for ``core.seg_train.train``.

    Writes into ``<save_dir>_fold<fold>.setup/``: ``train.txt`` (the other
    folds), ``val.txt`` (this fold), ``config.py`` (wrapper). The split is
    seeded by ``cfg.general.seed`` so every fold of a run shares one
    partition."""
    from segmentation3d_tpu.dataloader.dataset import (read_train_csv,
                                                       read_train_txt)
    from segmentation3d_tpu.utils.file_io import load_config
    if not 0 <= fold < k_folds:
        raise ValueError(f"--fold {fold} out of range for --folds {k_folds}")
    cfg = load_config(config_file)
    lst = cfg.general.imseg_list
    ims, segs = (read_train_csv(lst) if str(lst).endswith(".csv")
                 else read_train_txt(lst))
    folds = split_folds(len(ims), k_folds, seed=int(cfg.general.seed))
    val_idx = folds[fold]
    train_idx = sorted(i for f, fx in enumerate(folds) if f != fold
                       for i in fx)
    fold_dir = f"{cfg.general.save_dir}_fold{fold}"
    setup = fold_dir + ".setup"
    os.makedirs(setup, exist_ok=True)
    train_txt = _write_case_list(os.path.join(setup, "train.txt"),
                                 ims, segs, train_idx)
    val_txt = _write_case_list(os.path.join(setup, "val.txt"),
                               ims, segs, val_idx)
    wrapper = os.path.join(setup, "config.py")
    with open(wrapper, "w") as f:
        f.write(
            f'''"""Auto-generated fold-{fold}/{k_folds} wrapper (seg_train --folds).
Execs the user config and overrides the fold-specific fields."""
import runpy as _runpy
cfg = _runpy.run_path(r"{os.path.abspath(config_file)}")["cfg"]
cfg.general.imseg_list = r"{train_txt}"
cfg.general.save_dir = r"{fold_dir}"
cfg.train.val_list = r"{val_txt}"
''')
    return wrapper


def train_folds(config_file: str, k_folds: int, fold: int | None = None):
    """Train one fold (``fold`` given) or all K sequentially."""
    from segmentation3d_tpu.core.seg_train import train
    targets = [fold] if fold is not None else list(range(k_folds))
    for k in targets:
        print(f"=== fold {k}/{k_folds} ===")
        train(prepare_fold(config_file, k_folds, k))
