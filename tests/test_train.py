"""Training-machinery tests: schedules vs torch LambdaLR, on-device metrics
vs sklearn (with ties), SGD parity vs torch, selection rule, trainer smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.metrics.jax_metrics import (
    auroc,
    average_precision,
    compute_eval_metrics,
)
from vit3d_ensemble_tpu.train.schedules import make_schedule
from vit3d_ensemble_tpu.train.selection import BestTracker


# --- schedules --------------------------------------------------------------


@pytest.mark.parametrize("decay_type", ["cosine", "linear"])
@pytest.mark.parametrize("warmup,total", [(10, 100), (1000, 100)])
def test_schedule_matches_torch_lambdalr(decay_type, warmup, total):
    torch = pytest.importorskip("torch")
    import math

    lr = 3e-4
    sched = make_schedule(decay_type, lr, warmup, total)

    # reproduce the reference lambdas (utils/scheduler.py:30-63)
    def ref_lambda(step):
        if decay_type == "cosine":
            if step < warmup:
                return step / max(1.0, warmup)
            progress = (step - warmup) / max(1, total - warmup)
            return max(0.0, 0.5 * (1 + math.cos(math.pi * 0.5 * 2 * progress)))
        if step < warmup:
            return step / max(1, warmup)
        return max(0.0, (total - step) / max(1.0, total - warmup))

    for step in [0, 1, 5, 9, 10, 11, 50, 99, 100, 150]:
        np.testing.assert_allclose(float(sched(jnp.asarray(step))),
                                   lr * ref_lambda(step), rtol=1e-4,
                                   atol=1e-9, err_msg=f"step={step}")


def test_schedule_shift_models_defect_d15():
    # whole-dataset/bootstrap reference drivers step the scheduler BEFORE
    # the optimizer (defect D15): update g uses factor(g+1); shift=1
    # reproduces that off-by-one.
    lr = 1.0
    s0 = make_schedule("linear", lr, warmup_steps=10, t_total=100)
    s1 = make_schedule("linear", lr, warmup_steps=10, t_total=100)
    from vit3d_ensemble_tpu.train.schedules import warmup_linear_schedule

    shifted = warmup_linear_schedule(lr, 10, 100, shift=1)
    for step in (0, 5, 9, 50, 99):
        np.testing.assert_allclose(float(shifted(jnp.asarray(step))),
                                   float(s0(jnp.asarray(step + 1))),
                                   rtol=1e-6)
    assert float(s1(jnp.asarray(0))) == 0.0       # warmup starts at zero LR


def test_warmup_constant_and_constant_schedules():
    from vit3d_ensemble_tpu.train.schedules import make_schedule as mk

    c = mk("constant", 2e-3, warmup_steps=0, t_total=10)
    assert float(c(jnp.asarray(0))) == pytest.approx(2e-3)
    assert float(c(jnp.asarray(999))) == pytest.approx(2e-3)
    wc = mk("warmup_constant", 1.0, warmup_steps=4, t_total=10)
    np.testing.assert_allclose(
        [float(wc(jnp.asarray(s))) for s in (0, 2, 4, 100)],
        [0.0, 0.5, 1.0, 1.0], rtol=1e-6)


# --- metrics vs sklearn -----------------------------------------------------


def test_auroc_auprc_match_sklearn_with_ties(rng):
    from sklearn.metrics import average_precision_score, roc_auc_score

    for trial in range(20):
        n = int(rng.integers(5, 30))
        y = rng.integers(0, 2, n)
        if y.min() == y.max():
            y[0] = 1 - y[0]
        # quantized probs force ties
        p = np.round(rng.random(n), 1)
        np.testing.assert_allclose(
            float(auroc(jnp.asarray(p), jnp.asarray(y))),
            roc_auc_score(y, p), atol=1e-6, err_msg=f"trial {trial}")
        np.testing.assert_allclose(
            float(average_precision(jnp.asarray(p), jnp.asarray(y))),
            average_precision_score(y, p), atol=1e-6,
            err_msg=f"trial {trial}")


def test_auroc_masked_equals_unmasked_subset(rng):
    y = rng.integers(0, 2, 20)
    y[:2] = [0, 1]
    p = rng.random(20)
    mask = np.ones(20); mask[15:] = 0
    a = float(auroc(jnp.asarray(p), jnp.asarray(y), jnp.asarray(mask)))
    b = float(auroc(jnp.asarray(p[:15]), jnp.asarray(y[:15])))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_full_metric_suite_matches_host(rng):
    from vit3d_ensemble_tpu.metrics.host import eleven_metrics

    y = rng.integers(0, 2, 22)
    y[:2] = [0, 1]
    p = rng.random(22)
    pred = (p > 0.5).astype(int)
    host = eleven_metrics(y, pred, p)
    dev = compute_eval_metrics(jnp.asarray(p), jnp.asarray(y))
    pairs = [
        ("Specificity", dev.specificity), ("Sensitivity", dev.sensitivity),
        ("Accuracy", dev.balanced_accuracy), ("AUROC", dev.auroc),
        ("AUPRC", dev.auprc), ("F2-score", dev.f2), ("BS", dev.brier),
        ("BSNC", dev.bsnc), ("BSPC", dev.bspc), ("CSP", dev.csp),
        ("CSE", dev.cse),
    ]
    for name, val in pairs:
        np.testing.assert_allclose(float(val), host[name], atol=1e-6,
                                   err_msg=name)


# --- optimizer parity vs torch ---------------------------------------------


def test_sgd_momentum_matches_torch():
    torch = pytest.importorskip("torch")

    from vit3d_ensemble_tpu.train.optim import sgd_momentum

    w0 = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)

    tx = sgd_momentum(lambda c: 0.1, momentum=0.9, weight_decay=0.01)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    for _ in range(5):
        g = rng.normal(size=3).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = params + updates
        np.testing.assert_allclose(np.asarray(params),
                                   tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    import optax

    w0 = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=1e-4)

    tx = optax.adam(1e-4)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    for _ in range(5):
        g = rng.normal(size=3).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


# --- selection rule ----------------------------------------------------------


def test_selection_rule_reference_semantics():
    t = BestTracker()
    m = lambda s, e, a: {"Specificity": s, "Sensitivity": e, "AUROC": a}  # noqa: E731
    # unconstrained evals tracked by max AUROC
    assert t.consider(0.5, 0.9, 0.7, m(0.5, 0.9, 0.7))
    assert not t.consider(0.5, 0.9, 0.6, m(0.5, 0.9, 0.6))
    assert t.consider(0.5, 0.9, 0.8, m(0.5, 0.9, 0.8))
    # first constrained eval always replaces, even with lower AUROC
    assert t.consider(0.7, 0.7, 0.65, m(0.7, 0.7, 0.65))
    assert t.best_choice
    # after that, unconstrained evals can never win
    assert not t.consider(0.5, 0.9, 0.99, m(0.5, 0.9, 0.99))
    # constrained with higher AUROC wins
    assert t.consider(0.8, 0.61, 0.66, m(0.8, 0.61, 0.66))
    assert t.best_auc == 0.66


# --- trainer smoke ------------------------------------------------------------


def test_train_baseline_smoke(tmp_path):
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.data import SplitArrays
    from vit3d_ensemble_tpu.train.trainer import train_baseline

    rng = np.random.default_rng(0)
    # tiny config & volumes for CPU speed; separable synthetic data
    cfg = ViTConfig(patch_size=(8, 8, 5), hidden_size=16, mlp_dim=32,
                    num_heads=4, num_layers=2, img_size=32)
    n = 24
    y = np.tile([0, 1], n // 2).astype(np.int32)
    x = rng.normal(size=(n, 32, 32, 5, 1)).astype(np.float32)
    x[y == 1] += 0.8
    train = SplitArrays(x, y, [f"p{i}" for i in range(n)], ["PZ"] * n)
    val = SplitArrays(x[:10], y[:10], [f"p{i}" for i in range(10)],
                      ["PZ"] * 10)

    save = tmp_path / "ckpt.msgpack"
    res = train_baseline(cfg, train, val, num_steps=30, eval_every=10,
                         train_batch_size=4, learning_rate=0.05,
                         warmup_steps=5, save_path=str(save))
    assert save.exists()
    assert set(res.metrics) == {"Specificity", "Sensitivity", "Accuracy",
                                "AUROC", "AUPRC", "F2-score", "CSP", "CSE",
                                "BSNC", "BSPC", "BS"}
    assert res.metrics["AUROC"] >= 0.5      # learnable separation
    assert res.best_params is not None
    assert np.isfinite(res.final_loss)
