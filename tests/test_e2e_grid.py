"""Grid-vs-sequential parity for the vmapped end-to-end ensemble sweep.

The vmapped grid (`sweep/e2e_grid.py`) must reproduce the sequential
padded-compile mode (`train/ensemble_trainer.train_ensemble` with
`pad_members_to_templates`) cell-for-cell: same metrics for every
(combination, fold), including folds whose step counts differ (no-op
padded steps) and combinations whose canonical slot order permutes the
members (meta-row permutation equivariance).
"""

import numpy as np
import pytest

from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import SplitArrays
from vit3d_ensemble_tpu.sweep.e2e_grid import (
    plan_combo,
    run_e2e_grid,
    signature_of,
    stack_e2e_folds,
)
from vit3d_ensemble_tpu.train.trainer import init_baseline

IMG = 32
PAD = dict(max_mlp=48, max_layers=3)   # keep CPU templates small
EPOCHS = 2
LR = 5e-3
SEED = 0


def _member_bank():
    """Members keyed by REAL grid conf numbers (class = (conf-1) % 3) but
    with tiny test dimensions; classes match the real grid's.

    dropout_rate=0: the canonical slot sort renames member module paths
    (conf 2 can run as transformer_0), and flax folds dropout rngs by
    path — so grid and sequential dropout DRAWS differ per member (a
    documented stream-level deviation, like padded-width dropout).  With
    dropout off, every other piece of the grid must match the sequential
    mode exactly."""
    cfgs = {
        # conf 1 -> class (64, 4); conf 2 -> (32, 8); conf 3 -> (16, 16);
        # conf 4 -> class (64, 4) again with different depth/width.
        1: ViTConfig(patch_size=(16, 16, 5), hidden_size=64, num_heads=4,
                     mlp_dim=32, num_layers=2, img_size=IMG,
                     dropout_rate=0.0),
        2: ViTConfig(patch_size=(16, 16, 5), hidden_size=32, num_heads=8,
                     mlp_dim=48, num_layers=1, img_size=IMG,
                     dropout_rate=0.0),
        3: ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=16,
                     mlp_dim=40, num_layers=3, img_size=IMG,
                     dropout_rate=0.0),
        4: ViTConfig(patch_size=(16, 16, 5), hidden_size=64, num_heads=4,
                     mlp_dim=24, num_layers=1, img_size=IMG,
                     dropout_rate=0.0),
    }
    members = {c: init_baseline(cfg, seed=c)[1] for c, cfg in cfgs.items()}
    return cfgs, members


def _folds(rng):
    """Two folds with DIFFERENT train and val sizes (different
    steps-per-epoch exercises the no-op step padding)."""
    def split(n, seed_shift):
        y = np.tile([0, 1], -(-n // 2))[:n].astype(np.int32)
        x = rng.normal(size=(n, IMG, IMG, 5, 1)).astype(np.float32)
        x[y == 1] += 1.0
        return SplitArrays(x, y, [f"p{i}" for i in range(n)], ["PZ"] * n)

    return [(split(10, 0), split(4, 1)), (split(7, 2), split(6, 3))]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    cfgs, members = _member_bank()
    folds = _folds(rng)
    return cfgs, members, folds


def test_signature_collapse():
    # (1,2) sorts to [2,1] (class (32,8) < (64,4)); (3,4) stays sorted.
    p = plan_combo((1, 2))
    assert p.sorted_confs == (2, 1) and p.perm == (1, 0)
    assert signature_of(p) == ((32, 8), (64, 4))
    q = plan_combo((2, 4))
    assert q.sorted_confs == (2, 4)
    # same signature as (1,2): one shared program for both
    assert signature_of(q) == signature_of(p)


def test_grid_matches_sequential(setup):
    from vit3d_ensemble_tpu.train.ensemble_trainer import (
        pad_members_to_templates,
        train_ensemble,
    )

    cfgs, members, folds = setup
    combos = [(1, 2), (2, 4), (3, 4)]
    loader = lambda c: (cfgs[c], members[c])  # noqa: E731

    data = stack_e2e_folds(folds, EPOCHS, batch_size=4, seed=SEED)
    assert data.idx_all.shape[2] == 3          # S_max from the 10-item fold
    grid = run_e2e_grid(combos, loader, data, num_epochs=EPOCHS,
                        learning_rate=LR, seed=SEED, pad_kwargs=PAD)

    for comb in combos:
        name = "_".join(str(c) for c in comb)
        t_cfgs, padded, masks = pad_members_to_templates(
            [cfgs[c] for c in comb], [members[c] for c in comb], **PAD)
        for f, (t, v) in enumerate(folds):
            res = train_ensemble(t_cfgs, padded, t, v, num_epochs=EPOCHS,
                                 train_batch_size=4, learning_rate=LR,
                                 seed=SEED, keep_best_params=False,
                                 member_masks=masks)
            got = grid[name][f"CV {f + 1}"]
            for k, want in res.metrics.items():
                assert got[k] == pytest.approx(want, abs=2e-4), (
                    f"{name} fold {f} metric {k}: grid {got[k]} "
                    f"vs sequential {want}")


def test_grid_tail_chunk_padding_matches_unchunked(setup):
    """When a signature spans multiple chunks, the tail chunk is padded
    with duplicate plans to the compiled chunk width (one program per
    signature, no per-remainder recompiles) — results must equal the
    single-chunk run, with no phantom combinations."""
    import dataclasses

    cfgs, members, folds = setup
    cfgs = dict(cfgs)
    members = dict(members)
    # a second (32, 8)-class member so one signature has 4 combinations
    cfgs[5] = dataclasses.replace(cfgs[2], mlp_dim=32, num_layers=2)
    members[5] = init_baseline(cfgs[5], seed=5)[1]

    combos = [(1, 2), (2, 4), (1, 5), (4, 5)]   # all ((32,8),(64,4))
    loader = lambda c: (cfgs[c], members[c])  # noqa: E731
    data = stack_e2e_folds(folds, EPOCHS, 4, SEED)
    assert len({signature_of(plan_combo(c)) for c in combos}) == 1
    one = run_e2e_grid(combos, loader, data, num_epochs=EPOCHS,
                       learning_rate=LR, seed=SEED, pad_kwargs=PAD)
    chunked = run_e2e_grid(combos, loader, data, num_epochs=EPOCHS,
                           learning_rate=LR, seed=SEED, pad_kwargs=PAD,
                           chunk=3)             # 3 + tail(1) padded to 3
    assert set(chunked) == set(one)
    for name, per_fold in one.items():
        for fl, m in per_fold.items():
            for k, v in m.items():
                assert chunked[name][fl][k] == pytest.approx(v, abs=2e-4)


def test_grid_payload_layout(setup):
    """keep_payload returns best params in ascending-conf slot order with
    true member shapes (the sequential checkpoint layout)."""
    cfgs, members, folds = setup
    captured = {}

    def on_result(plan, res, extras):
        captured[plan.name] = extras["params"]

    run_e2e_grid([(1, 2)], lambda c: (cfgs[c], members[c]),
                 stack_e2e_folds(folds, EPOCHS, 4, SEED),
                 num_epochs=EPOCHS, learning_rate=LR, seed=SEED,
                 keep_payload=True, on_result=on_result, pad_kwargs=PAD)
    best = captured["1_2"]
    assert len(best) == len(folds)
    p = best[0]
    # slot 0 must hold conf 1 (hidden 64, mlp 32) despite the canonical
    # sort running conf 2 in slot 0
    fc1 = (p["transformer_0"]["encoder"]["layers"]["block"]["ffn"]["fc1"]
           ["kernel"])
    assert fc1.shape[-2:] == (64, 32)
    fc1b = (p["transformer_1"]["encoder"]["layers"]["block"]["ffn"]["fc1"]
            ["kernel"])
    assert fc1b.shape[-2:] == (32, 48)
    assert p["meta"]["classifier"]["kernel"].shape == (2, 1)


def test_grid_mesh_matches_single(setup):
    """The Mesh('model','data')-sharded grid returns the same metrics."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from vit3d_ensemble_tpu.parallel.mesh import make_mesh

    cfgs, members, folds = setup
    combos = [(1, 2), (2, 4), (3, 4)]
    loader = lambda c: (cfgs[c], members[c])  # noqa: E731
    data = stack_e2e_folds(folds, EPOCHS, 4, SEED)
    single = run_e2e_grid(combos, loader, data, num_epochs=EPOCHS,
                          learning_rate=LR, seed=SEED, pad_kwargs=PAD)
    meshed = run_e2e_grid(combos, loader, data, num_epochs=EPOCHS,
                          learning_rate=LR, seed=SEED, pad_kwargs=PAD,
                          mesh=make_mesh(2, 2))
    for name, per_fold in single.items():
        for fl, m in per_fold.items():
            for k, v in m.items():
                assert meshed[name][fl][k] == pytest.approx(v, abs=2e-4)


def test_program_caches_key_on_op_impls():
    """Switching the process-default attention impl must NOT reuse
    programs traced under the previous impl (the jitted closures bake the
    impl in at first trace)."""
    from vit3d_ensemble_tpu.configs import ViTConfig
    from vit3d_ensemble_tpu.ops import attention as att
    from vit3d_ensemble_tpu.sweep.e2e_grid import _grid_programs
    from vit3d_ensemble_tpu.train.ensemble_trainer import _ensemble_run_fn

    cfgs = tuple(ViTConfig.from_conf(c, img_size=32) for c in (1, 2, 3))
    att.set_default_attention_impl("auto")
    try:
        grid_auto = _grid_programs(cfgs, 1e-4, False, False)
        run_auto = _ensemble_run_fn(cfgs, 1e-4, False)
        att.set_default_attention_impl("layer")
        grid_layer = _grid_programs(cfgs, 1e-4, False, False)
        run_layer = _ensemble_run_fn(cfgs, 1e-4, False)
    finally:
        att.set_default_attention_impl("auto")
    assert grid_auto[0] is not grid_layer[0]
    assert run_auto is not run_layer
    # same impl twice -> same cached programs
    assert _grid_programs(cfgs, 1e-4, False, False)[0] is grid_auto[0]
    assert _ensemble_run_fn(cfgs, 1e-4, False) is run_auto
