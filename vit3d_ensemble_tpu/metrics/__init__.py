"""The 11-metric evaluation suite, on-device (jnp) and host (sklearn) forms."""

from vit3d_ensemble_tpu.metrics.jax_metrics import (  # noqa: F401
    EvalMetrics,
    compute_eval_metrics,
)
from vit3d_ensemble_tpu.metrics.host import (  # noqa: F401
    brier_score_one_class,
    calculate_confidence_metrics,
    eleven_metrics,
)
