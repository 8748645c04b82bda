"""Host-side batch metrics matching the reference's sklearn usage
(train_model.py:163-174): binary accuracy/recall/precision for class_num==2,
micro-averaged otherwise (micro recall == micro precision == accuracy)."""

from __future__ import annotations

import numpy as np


def accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    return float(np.mean(np.asarray(y_true) == np.asarray(y_pred)))


def binary_recall(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """sklearn.metrics.recall_score semantics: 0.0 when no positives."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    tp = int(np.sum((y_true == 1) & (y_pred == 1)))
    fn = int(np.sum((y_true == 1) & (y_pred == 0)))
    return tp / (tp + fn) if (tp + fn) > 0 else 0.0


def binary_precision(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """sklearn.metrics.precision_score semantics: 0.0 when no predicted
    positives."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    tp = int(np.sum((y_true == 1) & (y_pred == 1)))
    fp = int(np.sum((y_true == 0) & (y_pred == 1)))
    return tp / (tp + fp) if (tp + fp) > 0 else 0.0


def batch_metrics(y_true, y_pred, class_num: int = 2):
    """(accuracy, recall, precision) per the reference's branch
    (train_model.py:165-174)."""
    acc = accuracy(y_true, y_pred)
    if class_num == 2:
        return acc, binary_recall(y_true, y_pred), \
            binary_precision(y_true, y_pred)
    # micro average over all classes == accuracy
    return acc, acc, acc


# Device-side metric counts (multi-host safe): the jitted steps reduce
# [valid, correct, tp, fp, fn] over the GLOBAL batch (XLA psums across the
# data axis), so every host derives identical metrics — and therefore makes
# identical checkpoint/early-stop decisions, keeping collective calls in
# lockstep.  Derivations below reproduce the sklearn semantics above exactly.

def counts_to_metrics(counts, class_num: int = 2):
    """(accuracy, recall, precision) from [valid, correct, tp, fp, fn]."""
    valid, correct, tp, fp, fn = (int(c) for c in counts)
    acc = correct / valid if valid > 0 else 0.0
    if class_num == 2:
        rec = tp / (tp + fn) if (tp + fn) > 0 else 0.0
        prec = tp / (tp + fp) if (tp + fp) > 0 else 0.0
        return acc, rec, prec
    return acc, acc, acc
