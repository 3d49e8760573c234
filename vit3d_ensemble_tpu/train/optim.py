"""Optimizers with torch-equivalent update semantics.

* `sgd_momentum` — torch.optim.SGD(lr, momentum=0.9, weight_decay) as used
  by the baseline trainers (`train_baseline_cv.py:111-114`): decoupled-NOT,
  i.e. wd is added to the gradient BEFORE the momentum buffer
  (d = g + wd*p; buf = mu*buf + d; p -= lr*buf).
* `adam` — torch.optim.Adam(lr=1e-4) as used by the ensemble trainers
  (`train_ensemble_cv.py:83`): bias-corrected moments,
  p -= lr * m_hat / (sqrt(v_hat) + eps).
"""

from __future__ import annotations

import optax


def sgd_momentum(schedule, momentum: float = 0.9,
                 weight_decay: float = 1e-2) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def adam(schedule_or_lr, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-8) -> optax.GradientTransformation:
    return optax.adam(schedule_or_lr, b1=b1, b2=b2, eps=eps)
