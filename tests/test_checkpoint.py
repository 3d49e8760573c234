"""Checkpoint tests: native save/restore, full-state resume, layouts,
reporting writer."""

import numpy as np

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.checkpoint import (
    baseline_ckpt_path,
    ensemble_ckpt_path,
    load_baseline_params,
    restore_pytree,
    restore_train_state,
    save_pytree,
    save_train_state,
)
from vit3d_ensemble_tpu.configs import ViTConfig


def _tiny_cfg():
    return ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=4,
                     mlp_dim=32, num_layers=2, img_size=32)


def test_save_restore_roundtrip(tmp_path):
    from vit3d_ensemble_tpu.train.trainer import init_baseline

    cfg = _tiny_cfg()
    _, params = init_baseline(cfg, seed=0)
    path = str(tmp_path / "m.msgpack")
    save_pytree(path, params)
    restored = load_baseline_params(path, cfg)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), jax.device_get(params), restored)


def test_save_pytree_atomic(tmp_path):
    """save_pytree must go through temp + rename: no partially-written
    final file may ever exist (snapshot writes race with preemption), and
    overwriting an existing checkpoint must work."""
    import os

    path = str(tmp_path / "ck.msgpack")
    save_pytree(path, {"a": np.arange(4, dtype=np.float32)})
    save_pytree(path, {"a": np.arange(4, dtype=np.float32) * 2})  # overwrite
    assert not os.path.exists(path + ".tmp")
    out = restore_pytree(path, {"a": np.zeros(4, np.float32)})
    np.testing.assert_array_equal(out["a"], np.arange(4) * 2)


def test_full_state_resume(tmp_path):
    import optax

    from vit3d_ensemble_tpu.train.trainer import init_baseline

    cfg = _tiny_cfg()
    _, params = init_baseline(cfg, seed=0)
    tx = optax.sgd(1e-2, momentum=0.9)
    opt_state = tx.init(params)
    # take one update so momentum state is non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    path = str(tmp_path / "state.msgpack")
    save_train_state(path, params, opt_state, step=17,
                     meta={"fold": 3, "conf": 5})

    _, p0 = init_baseline(cfg, seed=1)        # different init as target
    o0 = tx.init(p0)
    p1, o1, step, meta = restore_train_state(path, p0, o0)
    assert step == 17
    assert meta["fold"] == 3 and meta["conf"] == 5
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), jax.device_get(params), p1)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), jax.device_get(opt_state), o1)


def test_checkpoint_layouts():
    p = baseline_ckpt_path("/out", "cv_baseline", 5, "cv3")
    assert p == "/out/cv_baseline_models/conf5/cv3.msgpack"
    p = ensemble_ckpt_path("/out", "cv_ensemble", "5_9_11", "cv1")
    assert p == "/out/cv_ensemble_models/ensemble_5_9_11/cv1.msgpack"


def test_reporting_roundtrip(tmp_path):
    import csv
    import zipfile

    from vit3d_ensemble_tpu.reporting import write_sweep_report

    results = {
        "5_9_11": {
            "CV 1": {k: 0.5 for k in ("Specificity", "Sensitivity",
                                      "Accuracy", "AUROC", "AUPRC",
                                      "F2-score", "CSP", "CSE", "BSNC",
                                      "BSPC", "BS")},
            "CV 2": {k: 0.7 for k in ("Specificity", "Sensitivity",
                                      "Accuracy", "AUROC", "AUPRC",
                                      "F2-score", "CSP", "CSE", "BSNC",
                                      "BSPC", "BS")},
        },
    }
    base = str(tmp_path / "report")
    write_sweep_report(base, results)
    with open(base + ".csv") as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "Ensemble"
    assert rows[1][0] == "5_9_11"
    assert rows[1][1] == "0.6 (0.1)"          # mean (std) of 0.5, 0.7
    z = zipfile.ZipFile(base + ".xlsx")
    assert "xl/worksheets/sheet1.xml" in z.namelist()


def test_sweep_resume_markers(tmp_path, monkeypatch):
    """--resume: completed groups are skipped and results reloaded."""
    import json

    marker_dir = tmp_path / "out" / "sweep_state"
    marker_dir.mkdir(parents=True)

    import argparse

    from vit3d_ensemble_tpu.sweep import engine
    from vit3d_ensemble_tpu.sweep.stack import group_configs

    # markers are fingerprinted by (confs, n_folds, hyper) — compute the
    # names the engine will look for.
    hyper = engine.SweepHyper(num_steps=4, eval_every=2, train_batch_size=2,
                              learning_rate=1e-4, weight_decay=0.0,
                              warmup_steps=1, decay_type="cosine", seed=0)
    fake = {"1": {"CV 1": {"AUROC": 0.9}}}
    for group in group_configs(range(1, 19)):
        marker = engine.sweep_marker_path(str(marker_dir), "cv", group, 2,
                                          hyper)
        with open(marker, "w") as f:
            json.dump(fake, f)

    called = []
    monkeypatch.setattr(engine, "run_group",
                        lambda *a, **k: called.append(1))
    args = argparse.Namespace(
        num_steps=4, eval_every=2, train_batch_size=2, learning_rate=1e-4,
        weight_decay=0.0, warmup_steps=1, decay_type="cosine", seed=0,
        csv_path="/root/reference/csv_files/cross_validation",
        data_root="/root/reference/dataset", num_cv=2, img_size=128,
        aug_mode="none", output_dir=str(tmp_path / "out"), resume=True,
        profile_dir=None)
    import pathlib

    if not pathlib.Path("/root/reference").exists():
        import pytest

        pytest.skip("reference data unavailable")
    results = engine.run_cv_sweep(args)
    assert not called                     # every group skipped
    assert results[1]["CV 1"]["AUROC"] == 0.9
