"""Training-curve rendering from the JSONL metrics sink (``cli plot``).

The reference monitors runs through TensorBoard scalars
(``train.py:173,272-273,344-345``); this framework's primary sink is
machine-readable JSONL (:mod:`stereospike_tpu.utils.logging`). ``cli plot``
turns a run's ``training_metrics.jsonl`` into one standard monitoring
figure — loss, MDE, learning rate, and (when ``log_firing_rates`` was on)
mean encoder/decoder spike densities, the paper's §4.4 headline activity
stats — so a run is inspectable without TensorBoard or a notebook.

Chart conventions: single y-axis per panel, two named series max (train /
val, encoder / decoder), a validated colorblind-safe pair (blue/orange),
recessive grid, direct annotation of the best-val point.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# validated categorical pair (slots 1/2 of the palette: adjacent-pair CVD
# dE 9.1, normal-vision dE 19.6 on the light surface)
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e6e5e2"
BLUE = "#2a78d6"
ORANGE = "#eb6834"


def load_jsonl(path: str) -> List[Dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _col(rows: List[Dict], key: str):
    """Epoch-indexed series for rows that carry ``key`` (resumed runs
    append — keep the LAST record per epoch)."""
    by_epoch = {}
    for r in rows:
        if key in r and "epoch" in r:
            by_epoch[int(r["epoch"])] = float(r[key])
    xs = sorted(by_epoch)
    return np.asarray(xs), np.asarray([by_epoch[x] for x in xs])


def _style(ax, title: str, ylabel: str = ""):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    ax.set_xlabel("epoch", color=INK_2, fontsize=9)
    if ylabel:
        ax.set_ylabel(ylabel, color=INK_2, fontsize=9)
    ax.tick_params(colors=INK_2, labelsize=8)
    ax.grid(True, color=GRID, linewidth=0.8)
    for s in ax.spines.values():
        s.set_color(GRID)


def plot_training(jsonl_path: str, out_path: str,
                  title: Optional[str] = None) -> Dict:
    """Render the monitoring figure; returns a summary of what was drawn."""
    rows = load_jsonl(jsonl_path)
    if not any("epoch" in r for r in rows):
        raise ValueError(f"no per-epoch records in {jsonl_path}")

    fig, axes = plt.subplots(2, 2, figsize=(11, 7), layout="constrained")
    fig.set_facecolor(SURFACE)
    if title:
        fig.suptitle(title, color=INK, fontsize=13)

    # --- loss
    ax = axes[0, 0]
    for key, color, label in (("train_loss", BLUE, "train"),
                              ("val_loss", ORANGE, "val")):
        x, y = _col(rows, key)
        if len(x):
            ax.plot(x, y, color=color, linewidth=2, label=label)
    _style(ax, "total loss")
    ax.legend(frameon=False, fontsize=9, labelcolor=INK_2)

    # --- MDE, best-val annotated
    ax = axes[0, 1]
    best = None
    for key, color, label in (("train_MDE", BLUE, "train"),
                              ("val_MDE", ORANGE, "val")):
        x, y = _col(rows, key)
        if len(x):
            ax.plot(x, y, color=color, linewidth=2, label=label)
            if key == "val_MDE":
                i = int(np.argmin(y))
                best = (int(x[i]), float(y[i]))
                ax.plot(*best, "o", color=ORANGE, markersize=8,
                        markerfacecolor=SURFACE, markeredgewidth=2)
                # keep the label inside the axes when the best is late
                late = len(x) > 1 and best[0] > x[0] + 0.7 * (x[-1] - x[0])
                ax.annotate(f"best {best[1]:.3f} m @ {best[0]}", best,
                            textcoords="offset points",
                            xytext=(-8, 8) if late else (8, 8),
                            ha="right" if late else "left",
                            fontsize=8, color=INK_2)
    _style(ax, "mean depth error", "m")
    ax.legend(frameon=False, fontsize=9, labelcolor=INK_2)

    # --- learning rate (single series: title carries the name, no legend)
    ax = axes[1, 0]
    x, y = _col(rows, "lr")
    if len(x):
        ax.plot(x, y, color=BLUE, linewidth=2, drawstyle="steps-post")
        if y.min() > 0 and y.max() / y.min() > 3:
            ax.set_yscale("log")
    _style(ax, "learning rate")

    # --- firing rates: the paper's encoder/decoder mean densities (§4.4)
    ax = axes[1, 1]
    fr_keys = sorted({k for r in rows for k in r if k.startswith("fr_")})
    has_rates = bool(fr_keys)
    if has_rates:
        from stereospike_tpu.models import TAP_NAMES

        enc = [f"fr_{k}" for k in TAP_NAMES[:6]]
        groups = (("encoder", BLUE, [k for k in fr_keys if k in enc]),
                  ("decoder", ORANGE, [k for k in fr_keys if k not in enc]))
        for label, color, keys in groups:
            series = [_col(rows, k) for k in keys]
            series = [(x, y) for x, y in series if len(x)]
            if series:
                x = series[0][0]
                y = np.mean([y for _, y in series], axis=0)
                ax.plot(x, y, color=color, linewidth=2, label=label)
        ax.legend(frameon=False, fontsize=9, labelcolor=INK_2)
        _style(ax, "mean firing rate", "spike density")
    else:
        _style(ax, "mean firing rate")
        ax.text(0.5, 0.5, "no firing-rate log\n(train with --log-firing-rates N)",
                transform=ax.transAxes, ha="center", va="center",
                fontsize=9, color=INK_2)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=130)
    plt.close(fig)
    out = {"plot": out_path,
           "epochs": int(max(r.get("epoch", -1) for r in rows)) + 1,
           "firing_rates": has_rates}
    if best is not None:
        out["best_val_MDE"] = best[1]
        out["best_val_epoch"] = best[0]
    return out
