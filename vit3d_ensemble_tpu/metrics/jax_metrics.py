"""On-device evaluation metrics (masked, jit/vmap-friendly).

The reference computes metrics on host with sklearn after each eval pass
(`train_baseline_cv.py:94-99`), forcing a device->host sync per eval.  The
vmapped sweep engine instead evaluates ALL models' metrics on device inside
the training scan; these implementations match sklearn exactly (including
tie handling) for the small eval sets in play (18-22 samples), verified by
randomized tests.

Validity masks support padded eval batches: masked-out entries contribute to
nothing.  All metrics operate on (N,) score/label vectors and use O(N^2)
pairwise formulations — exact, branch-free, and trivially cheap at N<=32.

Metric definitions (sklearn equivalences):
  specificity  = recall(pos_label=0)
  sensitivity  = recall(pos_label=1)
  balanced_acc = (spec + sens) / 2
  auroc        = Mann-Whitney U with midranks (== trapezoid ROC with ties)
  auprc        = average_precision_score (step-function AP, tie-grouped)
  f2           = fbeta_score(beta=2)
  brier        = mean((y - p)^2); bsnc/bspc are the per-class restrictions
                 (`tools.py:125-133`)
  csp/cse      = confident-specificity/-sensitivity buckets
                 (`tools.py:100-121`)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class EvalMetrics(NamedTuple):
    specificity: jnp.ndarray
    sensitivity: jnp.ndarray
    balanced_accuracy: jnp.ndarray
    auroc: jnp.ndarray
    auprc: jnp.ndarray
    f2: jnp.ndarray
    brier: jnp.ndarray
    bsnc: jnp.ndarray
    bspc: jnp.ndarray
    csp: jnp.ndarray
    cse: jnp.ndarray


def _safe_div(a, b):
    return jnp.where(b > 0, a / jnp.where(b > 0, b, 1.0), 0.0)


def auroc(scores: jnp.ndarray, labels: jnp.ndarray,
          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Tie-aware AUROC via pairwise midranks (== sklearn roc_auc_score)."""
    if mask is None:
        mask = jnp.ones_like(scores)
    labels = labels.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    s_i = scores[:, None]
    s_j = scores[None, :]
    mm = m[:, None] * m[None, :]
    less = jnp.sum((s_j < s_i) * mm, axis=1)
    equal = jnp.sum((s_j == s_i) * mm, axis=1)      # includes self
    midrank = less + (equal + 1.0) / 2.0            # 1-indexed midrank
    n_pos = jnp.sum(labels * m)
    n_neg = jnp.sum((1.0 - labels) * m)
    rank_sum_pos = jnp.sum(midrank * labels * m)
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    return _safe_div(u, n_pos * n_neg)


def average_precision(scores: jnp.ndarray, labels: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sklearn average_precision_score with tie grouping, via pairwise >=."""
    if mask is None:
        mask = jnp.ones_like(scores)
    labels = labels.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    n_pos = jnp.sum(labels * m)
    # For each sample i (as threshold): TP_i = sum_j [s_j >= s_i] y_j m_j
    ge = (scores[None, :] >= scores[:, None]).astype(jnp.float32)
    ge = ge * m[None, :]
    tp = ge @ (labels * m)
    fp = ge @ ((1.0 - labels) * m)
    prec = _safe_div(tp, tp + fp)
    rec = _safe_div(tp, n_pos)
    # Sort thresholds descending; ties produce zero recall increments for
    # all but the group head, so duplicates contribute nothing (== sklearn).
    order = jnp.argsort(-jnp.where(mask > 0, scores, -jnp.inf))
    rec_s = rec[order] * m[order]
    prec_s = prec[order] * m[order]
    prev = jnp.concatenate([jnp.zeros(1, rec_s.dtype), rec_s[:-1]])
    return jnp.sum((rec_s - prev) * prec_s)


def compute_eval_metrics(probs: jnp.ndarray, labels: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None,
                         threshold: float = 0.5) -> EvalMetrics:
    """The full 11-metric suite from sigmoid probabilities.

    Predictions use p > 0.5 like the reference (`tools.py:51`,
    `train_baseline_cv.py:82`).
    """
    if mask is None:
        mask = jnp.ones_like(probs)
    m = mask.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    pred = (probs > threshold).astype(jnp.float32)

    tp = jnp.sum(pred * y * m)
    tn = jnp.sum((1 - pred) * (1 - y) * m)
    fp = jnp.sum(pred * (1 - y) * m)
    fn = jnp.sum((1 - pred) * y * m)

    spec = _safe_div(tn, tn + fp)
    sens = _safe_div(tp, tp + fn)
    bacc = 0.5 * (spec + sens)
    prec = _safe_div(tp, tp + fp)
    f2 = _safe_div(5.0 * prec * sens, 4.0 * prec + sens)

    roc = auroc(probs, labels, m)
    ap = average_precision(probs, labels, m)

    sq = (y - probs) ** 2
    brier = _safe_div(jnp.sum(sq * m), jnp.sum(m))
    bsnc = _safe_div(jnp.sum(sq * (1 - y) * m), jnp.sum((1 - y) * m))
    bspc = _safe_div(jnp.sum(sq * y * m), jnp.sum(y * m))

    # confidence metrics (`tools.py:100-121`)
    tn_conf = jnp.sum((1 - pred) * (1 - y) * (probs < 0.3) * m)
    tp_conf = jnp.sum(pred * y * (probs > 0.7) * m)
    csp = _safe_div(tn_conf, tn + fp)
    cse = _safe_div(tp_conf, tp + fn)

    return EvalMetrics(
        specificity=spec, sensitivity=sens, balanced_accuracy=bacc,
        auroc=roc, auprc=ap, f2=f2, brier=brier, bsnc=bsnc, bspc=bspc,
        csp=csp, cse=cse,
    )
