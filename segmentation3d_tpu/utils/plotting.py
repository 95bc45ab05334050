"""Loss-curve plotting (reference C12 [L]: optional loss-curve PNG)."""
from __future__ import annotations

import os


def plot_loss_curve(loss_csv: str, out_png: str | None = None):
    """Render ``train_loss.csv`` (epoch,batch,loss) to a PNG next to it.
    Silently no-ops when matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    batches, losses = [], []
    with open(loss_csv) as f:
        next(f)
        for line in f:
            parts = line.strip().split(",")
            if len(parts) == 3:
                batches.append(int(parts[1]))
                losses.append(float(parts[2]))
    if not losses:
        return None
    out_png = out_png or os.path.join(os.path.dirname(loss_csv), "train_loss.png")
    fig, ax = plt.subplots(figsize=(8, 4.5))
    ax.plot(batches, losses, lw=1.0)
    ax.set_xlabel("batch")
    ax.set_ylabel("train loss")
    ax.set_yscale("log")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_png, dpi=100)
    plt.close(fig)
    return out_png
