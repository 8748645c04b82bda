"""Training-log visualization (scripts/visualize_log.py equivalent).

Parses the train.txt/valid.txt line format
``epoch:0, iterid:100, loss:3.545, accuracy:0.501, recall:0.378,
precision:0.511`` and renders the 2x2 loss/accuracy/recall/precision panel.
matplotlib is optional — import is deferred and gated.
"""

from __future__ import annotations

import os
from typing import Optional


def parse_log_file(path: str) -> dict:
    out = {"loss": [], "accuracy": [], "recall": [], "precision": []}
    with open(path, "r") as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) != 6:
                continue
            _, _, loss, acc, rec, prec = parts
            out["loss"].append(float(loss.split(":")[-1].strip(",")))
            out["accuracy"].append(float(acc.split(":")[-1].strip(",")))
            out["recall"].append(float(rec.split(":")[-1].strip(",")))
            out["precision"].append(float(prec.split(":")[-1].strip(",")))
    return out


def draw_log(logdir: str, out_fp: Optional[str] = None,
             train_log_txt: str = "train.txt",
             valid_log_txt: str = "valid.txt") -> str:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise RuntimeError(
            "matplotlib is required for log visualization") from e

    train = parse_log_file(os.path.join(logdir, train_log_txt))
    valid = parse_log_file(os.path.join(logdir, valid_log_txt))
    if out_fp is None:
        out_fp = os.path.join(logdir, "train_valid_curves.png")

    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for ax, key in zip(axes.flat, ("loss", "accuracy", "recall",
                                   "precision")):
        ax.plot(range(len(train[key])), train[key], "orange", label="train")
        ax.plot(range(len(valid[key])), valid[key], "blue", label="valid")
        ax.set_title(key)
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_fp)
    plt.close(fig)
    return out_fp
