"""Sweep-engine tests: padding exactness, grouping, vmapped training."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.models import VisionTransformer3D
from vit3d_ensemble_tpu.sweep.stack import (
    ConfigGroup,
    _pad_to,
    group_configs,
    init_member_params,
    unpad_params,
)


def test_group_partition():
    groups = group_configs(range(1, 19))
    assert len(groups) == 3
    by_shape = {(g.hidden_size, g.num_heads): g for g in groups}
    assert set(by_shape) == {(64, 4), (32, 8), (16, 16)}
    g = by_shape[(32, 8)]
    assert g.confs == (2, 5, 8, 11, 14, 17)
    assert g.max_mlp == 3072 and g.max_layers == 8
    assert g.mlp_dims == (2048, 2048, 2048, 3072, 3072, 3072)
    assert g.num_layers == (4, 6, 8, 4, 6, 8)


@pytest.fixture(scope="module")
def tiny_group():
    """A synthetic group with small shapes for CPU-speed exactness tests."""
    return ConfigGroup(hidden_size=16, num_heads=4, confs=(101, 102),
                      mlp_dims=(32, 48), num_layers=(2, 3))


def test_padded_forward_is_exact(tiny_group, monkeypatch):
    """A depth/width-padded model with runtime masks must produce EXACTLY
    the logits of the true-shape model carrying the same weights."""
    import vit3d_ensemble_tpu.configs as configs_mod

    grid = {101: (16, 32, 2, 16, 4), 102: (16, 48, 3, 16, 4)}
    monkeypatch.setitem(configs_mod.GRID, 101, grid[101])
    monkeypatch.setitem(configs_mod.GRID, 102, grid[102])

    img = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, img, img, 5, 1)).astype(np.float32))

    template = tiny_group.template_config(img)
    tmodel = VisionTransformer3D(template, zero_head=True, vis=False)

    for i in range(2):
        cfg = ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=4,
                        mlp_dim=tiny_group.mlp_dims[i],
                        num_layers=tiny_group.num_layers[i], img_size=img)
        model = VisionTransformer3D(cfg, zero_head=True, vis=False)
        dummy = jnp.zeros((1, img, img, 5, 1))
        true_params = model.init({"params": jax.random.key(7 + i)}, dummy)["params"]
        # randomize head/pos-emb so outputs are non-trivial
        true_params["head"]["kernel"] = jnp.asarray(
            rng.normal(size=(16, 1)).astype(np.float32))
        true_params["embeddings"]["position_embeddings"] = jnp.asarray(
            rng.normal(size=true_params["embeddings"]
                       ["position_embeddings"].shape).astype(np.float32))

        tshapes = jax.eval_shape(
            lambda: tmodel.init({"params": jax.random.key(0)}, dummy)["params"])
        padded = jax.tree.map(lambda p, t: _pad_to(p, t.shape), true_params,
                              tshapes)

        ref = model.apply({"params": true_params}, x, deterministic=True)
        out = tmodel.apply({"params": padded}, x, deterministic=True,
                           num_layers_active=jnp.int32(tiny_group.num_layers[i]),
                           mlp_active=jnp.int32(tiny_group.mlp_dims[i]))
        np.testing.assert_allclose(np.asarray(out.logits),
                                   np.asarray(ref.logits), atol=1e-5)

        # gradient exactness: padded-region grads are exactly zero and the
        # true-region grads match the unpadded model's.
        def loss_true(p):
            return jnp.sum(model.apply({"params": p}, x,
                                       deterministic=True).logits ** 2)

        def loss_pad(p):
            return jnp.sum(tmodel.apply(
                {"params": p}, x, deterministic=True,
                num_layers_active=jnp.int32(tiny_group.num_layers[i]),
                mlp_active=jnp.int32(tiny_group.mlp_dims[i])).logits ** 2)

        g_true = jax.grad(loss_true)(true_params)
        g_pad = jax.grad(loss_pad)(padded)
        g_cropped = jax.tree.map(
            lambda gp, gt: gp[tuple(slice(0, s) for s in gt.shape)],
            g_pad, g_true)
        chex_tol = dict(atol=2e-4, rtol=1e-3)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), **chex_tol), g_cropped, g_true)
        # padded fc1 columns get zero grads
        fc1_pad = np.asarray(g_pad["encoder"]["layers"]["block"]["ffn"]
                             ["fc1"]["kernel"])
        assert np.all(fc1_pad[:, :, tiny_group.mlp_dims[i]:] == 0)
        assert np.all(fc1_pad[tiny_group.num_layers[i]:] == 0)


def test_init_and_unpad_roundtrip(tiny_group, monkeypatch):
    import vit3d_ensemble_tpu.configs as configs_mod

    monkeypatch.setitem(configs_mod.GRID, 101, (16, 32, 2, 16, 4))
    monkeypatch.setitem(configs_mod.GRID, 102, (16, 48, 3, 16, 4))
    img = 32
    padded = init_member_params(tiny_group, 0, seed=0, img_size=img)
    # padded regions must be exactly zero
    fc1 = np.asarray(padded["encoder"]["layers"]["block"]["ffn"]["fc1"]["kernel"])
    assert fc1.shape == (3, 16, 48)
    assert np.all(fc1[2:] == 0) and np.all(fc1[:, :, 32:] == 0)
    small = unpad_params(padded, tiny_group, 0, img_size=img)
    assert small["encoder"]["layers"]["block"]["ffn"]["fc1"]["kernel"].shape \
        == (2, 16, 32)


def test_snapshot_kill_and_resume(tiny_group, monkeypatch, tmp_path):
    """Preemption recovery: kill a snapshotting run mid-group, resume from
    the state file, and get EXACTLY the uninterrupted run's results."""
    import os

    import vit3d_ensemble_tpu.configs as configs_mod
    from vit3d_ensemble_tpu.data.pool import PooledSplit
    from vit3d_ensemble_tpu.sweep.engine import (
        SimulatedPreemption,
        SweepHyper,
        run_group,
        stack_folds,
    )

    monkeypatch.setitem(configs_mod.GRID, 101, (16, 32, 2, 16, 4))
    monkeypatch.setitem(configs_mod.GRID, 102, (16, 48, 3, 16, 4))

    img = 32
    rng = np.random.default_rng(5)
    pool_n = 16
    labels_pool = np.tile([0, 1], pool_n // 2).astype(np.float32)
    pool = rng.normal(size=(pool_n, img, img, 5, 1)).astype(np.float32)
    pool[labels_pool == 1] += 1.0
    folds = []
    for _ in range(2):
        tr = rng.permutation(pool_n)[:8].astype(np.int32)
        va = rng.permutation(pool_n)[:6].astype(np.int32)
        m = float(pool[tr].mean())
        folds.append((PooledSplit(tr, labels_pool[tr], m),
                      PooledSplit(va, labels_pool[va], m)))

    # 9 steps / eval_every 2 -> 4 periods + 1 remainder step;
    # snapshot_every=2 -> 2 segments
    hyper = SweepHyper(num_steps=9, eval_every=2, train_batch_size=4,
                       learning_rate=0.05, warmup_steps=2, seed=0,
                       snapshot_every=2)
    data = stack_folds(pool, folds, hyper)

    res_full = run_group(tiny_group, data, hyper, img_size=img)

    state = str(tmp_path / "group_state.msgpack")
    with pytest.raises(SimulatedPreemption):
        run_group(tiny_group, data, hyper, img_size=img, state_path=state,
                  _abort_after_segments=1)
    assert os.path.exists(state)        # work survived the "preemption"

    res_resumed = run_group(tiny_group, data, hyper, img_size=img,
                            state_path=state, resume=True)
    assert not os.path.exists(state)    # cleaned up after completion
    np.testing.assert_allclose(res_resumed.best_metrics,
                               res_full.best_metrics, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(res_resumed.final_loss, res_full.final_loss,
                               rtol=1e-6, atol=1e-7)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        res_resumed.best_params, res_full.best_params)


def test_vmapped_group_training(tiny_group, monkeypatch):
    """End-to-end: 2 configs x 2 folds trained in one jitted program on
    separable synthetic data; all models must find signal."""
    import vit3d_ensemble_tpu.configs as configs_mod

    from vit3d_ensemble_tpu.data.pool import PooledSplit
    from vit3d_ensemble_tpu.sweep.engine import (
        SweepHyper,
        run_group,
        stack_folds,
    )

    monkeypatch.setitem(configs_mod.GRID, 101, (16, 32, 2, 16, 4))
    monkeypatch.setitem(configs_mod.GRID, 102, (16, 48, 3, 16, 4))

    img = 32
    rng = np.random.default_rng(3)
    # one shared pool; folds are index views with per-fold means
    pool_n = 36
    labels_pool = np.tile([0, 1], pool_n // 2).astype(np.float32)
    pool = rng.normal(size=(pool_n, img, img, 5, 1)).astype(np.float32)
    pool[labels_pool == 1] += 1.0
    folds = []
    for f in range(2):
        n = 16 + 4 * f          # unequal fold sizes exercise padding
        tr_rows = rng.permutation(pool_n)[:n].astype(np.int32)
        va_rows = rng.permutation(pool_n)[:8].astype(np.int32)
        mean = float(pool[tr_rows].mean())
        folds.append((
            PooledSplit(tr_rows, labels_pool[tr_rows], mean),
            PooledSplit(va_rows, labels_pool[va_rows], mean),
        ))

    hyper = SweepHyper(num_steps=20, eval_every=8, train_batch_size=4,
                       learning_rate=0.05, warmup_steps=4, seed=0)
    data = stack_folds(pool, folds, hyper)
    assert data.row_idx.shape == (2, 20)

    res = run_group(tiny_group, data, hyper, img_size=img)
    assert res.best_metrics.shape == (2, 2, 11)
    aurocs = res.best_metrics[:, :, 3]
    assert np.all(aurocs >= 0.5), aurocs
    assert np.all(np.isfinite(res.final_loss))
    # best params are returned per (config, fold) and unpad cleanly
    p00 = unpad_params(jax.tree.map(lambda x: x[0, 0], res.best_params),
                       tiny_group, 0, img_size=img)
    assert p00["encoder"]["layers"]["block"]["ffn"]["fc1"]["kernel"].shape \
        == (2, 16, 32)


def test_remat_group_matches_exact(tiny_group, monkeypatch):
    """hyper.remat recomputes block activations in the backward pass —
    results must be identical to the non-remat program."""
    import vit3d_ensemble_tpu.configs as configs_mod

    from vit3d_ensemble_tpu.data.pool import PooledSplit
    from vit3d_ensemble_tpu.sweep.engine import (
        SweepHyper,
        run_group,
        stack_folds,
    )

    monkeypatch.setitem(configs_mod.GRID, 101, (16, 32, 2, 16, 4))
    monkeypatch.setitem(configs_mod.GRID, 102, (16, 48, 3, 16, 4))

    img = 32
    rng = np.random.default_rng(7)
    pool_n = 24
    labels_pool = np.tile([0, 1], pool_n // 2).astype(np.float32)
    pool = rng.normal(size=(pool_n, img, img, 5, 1)).astype(np.float32)
    pool[labels_pool == 1] += 1.0
    rows = np.arange(pool_n, dtype=np.int32)
    mean = float(pool.mean())
    folds = [(PooledSplit(rows[:16], labels_pool[:16], mean),
              PooledSplit(rows[16:], labels_pool[16:], mean))]

    hyper = SweepHyper(num_steps=10, eval_every=5, train_batch_size=4,
                       learning_rate=0.05, warmup_steps=4, seed=0)
    data = stack_folds(pool, folds, hyper)
    base = run_group(tiny_group, data, hyper, img_size=img)
    remat = run_group(tiny_group, data,
                      dataclasses.replace(hyper, remat=True), img_size=img)
    np.testing.assert_allclose(remat.best_metrics, base.best_metrics,
                               atol=1e-5)
    np.testing.assert_allclose(remat.final_loss, base.final_loss, atol=1e-5)
