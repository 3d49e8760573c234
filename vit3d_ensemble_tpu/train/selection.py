"""Best-checkpoint selection rule.

The reference's custom decision process (`train_baseline_cv.py:192-204`,
same rule in every trainer): prefer evaluations with BOTH specificity > 0.6
and sensitivity > 0.6 — once one is seen, only higher-AUROC evaluations that
also satisfy the constraint can replace it; before any constrained
evaluation is seen, track the max-AUROC one.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional


@dataclasses.dataclass
class BestTracker:
    best_choice: bool = False
    best_auc: float = 0.0
    best_metrics: Optional[Dict[str, float]] = None
    payload: Any = None          # e.g. best params / (tl, pl, cp)

    def consider(self, specificity: float, sensitivity: float,
                 roc_auc: float, metrics: Dict[str, float],
                 payload: Any = None) -> bool:
        """Returns True when this evaluation becomes the new best
        (== the reference's save-checkpoint event)."""
        if specificity > 0.6 and sensitivity > 0.6:
            accept = (not self.best_choice) or roc_auc > self.best_auc
            if accept:
                self._take(roc_auc, metrics, payload)
            self.best_choice = True
            return accept
        if (not self.best_choice) and roc_auc > self.best_auc:
            self._take(roc_auc, metrics, payload)
            return True
        return False

    def _take(self, roc_auc, metrics, payload):
        self.best_auc = roc_auc
        self.best_metrics = dict(metrics)
        self.payload = payload


# --- on-device (jit/vmap-friendly) form -------------------------------------


def device_best_init(metrics_dim: int, probs_dim: int, payload):
    """Initial best-state pytree for in-graph selection (see engine.py)."""
    import jax.numpy as jnp

    return dict(auc=jnp.float32(0.0), choice=jnp.bool_(False),
                found=jnp.bool_(False), metrics=jnp.zeros(metrics_dim),
                probs=jnp.zeros(probs_dim), payload=payload)


def device_consider(best, mvec, probs, payload, force):
    """The same rule as BestTracker.consider, as a branch-free jnp update.

    mvec is the 11-metric vector in engine.METRIC_KEYS order (spec at 0,
    sens at 1, auroc at 3).  `force` accepts unconditionally (used for the
    never-accepted fallback eval).
    """
    import jax
    import jax.numpy as jnp

    spec, sens, auc = mvec[0], mvec[1], mvec[3]
    constrained = (spec > 0.6) & (sens > 0.6)
    accept = jnp.where(
        constrained,
        jnp.logical_or(~best["choice"], auc > best["auc"]),
        (~best["choice"]) & (auc > best["auc"]))
    accept = accept | force
    return _apply_accept(best, mvec, probs, payload, accept,
                         choice=best["choice"] | constrained)


def device_take_if(best, mvec, probs, payload, cond):
    """Accept IFF `cond` — bypasses the selection rule entirely.  Used for
    the end-of-run fallback eval: it must only fill in results when NO
    earlier eval accepted (the reference evaluates strictly at eval_every
    multiples; letting a final out-of-cadence eval compete under the normal
    rule would change which checkpoint wins)."""
    return _apply_accept(best, mvec, probs, payload, cond,
                         choice=best["choice"])


def _apply_accept(best, mvec, probs, payload, accept, choice):
    import jax
    import jax.numpy as jnp

    return dict(
        auc=jnp.where(accept, mvec[3], best["auc"]),
        choice=choice,
        found=best["found"] | accept,
        metrics=jnp.where(accept, mvec, best["metrics"]),
        probs=jnp.where(accept, probs, best["probs"]),
        payload=jax.tree.map(lambda n, o: jnp.where(accept, n, o),
                             payload, best["payload"]),
    )
