"""Host-side (numpy/sklearn) metrics for reporting and statistics drivers.

Mirrors the reference's metric surface: sklearn calls inlined in the
trainers (`train_baseline_cv.py:94-99`), the confidence metrics and
per-class Brier scores from `tools.py:100-133`, and the metric-dict layout
logged per fold (`train_baseline_cv.py:286-297`, `test_cv.py:69-80`).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def calculate_confidence_metrics(true_labels: Sequence[int],
                                 predicted_labels: Sequence[int],
                                 class_probabilities: Sequence[float]):
    """CSP / CSE confidence buckets (`tools.py:100-121`)."""
    y = np.asarray(true_labels)
    pred = np.asarray(predicted_labels)
    p = np.asarray(class_probabilities)
    tn = (y == 0) & (pred == 0)
    tp = (y == 1) & (pred == 1)
    fp = (y == 0) & (pred == 1)
    fn = (y == 1) & (pred == 0)
    denom_n = tn.sum() + fp.sum()
    denom_p = tp.sum() + fn.sum()
    csp = (tn & (p < 0.3)).sum() / denom_n if denom_n > 0 else 0
    cse = (tp & (p > 0.7)).sum() / denom_p if denom_p > 0 else 0
    return float(csp), float(cse)


def brier_score_one_class(y_true, y_prob, cl: int = 0) -> float:
    """Per-class Brier restriction (`tools.py:125-133`)."""
    y = np.asarray(y_true, dtype=float)
    p = np.asarray(y_prob, dtype=float)
    m = y == cl
    return float(np.average((y[m] - p[m]) ** 2))


def eleven_metrics(true_labels, predicted_labels,
                   class_probabilities) -> Dict[str, float]:
    """The full per-fold metric dict (`train_baseline_cv.py:286-297`)."""
    from sklearn.metrics import (
        average_precision_score,
        balanced_accuracy_score,
        brier_score_loss,
        fbeta_score,
        recall_score,
        roc_auc_score,
    )

    y, pred, p = (np.asarray(true_labels), np.asarray(predicted_labels),
                  np.asarray(class_probabilities))
    csp, cse = calculate_confidence_metrics(y, pred, p)
    return {
        "Specificity": float(recall_score(y, pred, pos_label=0)),
        "Sensitivity": float(recall_score(y, pred)),
        "Accuracy": float(balanced_accuracy_score(y, pred)),
        "AUROC": float(roc_auc_score(y, p)),
        "AUPRC": float(average_precision_score(y, p)),
        "F2-score": float(fbeta_score(y, pred, beta=2)),
        "CSP": csp,
        "CSE": cse,
        "BSNC": brier_score_one_class(y, p, cl=0),
        "BSPC": brier_score_one_class(y, p, cl=1),
        "BS": float(brier_score_loss(y, p)),
    }
