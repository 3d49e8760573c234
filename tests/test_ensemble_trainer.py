"""End-to-end ensemble trainer smoke test (scan-compiled training run)."""

import numpy as np

from vit3d_ensemble_tpu.configs import ViTConfig
from vit3d_ensemble_tpu.data import SplitArrays
from vit3d_ensemble_tpu.train.ensemble_trainer import train_ensemble
from vit3d_ensemble_tpu.train.trainer import init_baseline


def test_train_ensemble_smoke(tmp_path, rng):
    img = 32
    cfgs = [
        ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=4,
                  mlp_dim=32, num_layers=2, img_size=img),
        ViTConfig(patch_size=(16, 16, 5), hidden_size=32, num_heads=8,
                  mlp_dim=48, num_layers=1, img_size=img),
    ]
    members = [init_baseline(c, seed=i)[1] for i, c in enumerate(cfgs)]

    n = 16
    y = np.tile([0, 1], n // 2).astype(np.int32)
    x = rng.normal(size=(n, img, img, 5, 1)).astype(np.float32)
    x[y == 1] += 1.0
    train = SplitArrays(x, y, [f"p{i}" for i in range(n)], ["PZ"] * n)
    val = SplitArrays(x[:8], y[:8], [f"p{i}" for i in range(8)], ["PZ"] * 8)

    save = tmp_path / "ens.msgpack"
    res = train_ensemble(cfgs, members, train, val, num_epochs=4,
                         train_batch_size=4, learning_rate=5e-3, seed=0,
                         save_path=str(save))
    assert save.exists()
    assert set(res.metrics) >= {"Specificity", "Sensitivity", "Accuracy",
                                "AUROC", "AUPRC", "F2-score", "BS"}
    assert res.metrics["AUROC"] >= 0.5
    assert res.best_params is not None
    assert "meta" in res.best_params
    # the separable signal should be learnable by the meta stack
    assert np.all(np.isfinite(res.class_probabilities))


def test_padded_template_training_matches_exact():
    rng = np.random.default_rng(123)   # order-independent data
    """Members padded to shape-class templates + runtime masks must train
    to EXACTLY the exact-shape ensemble's results (dropout disabled — the
    padded FFN width would consume a different dropout stream), and the
    cropped best params must keep the true-config layout."""
    import jax

    from vit3d_ensemble_tpu.train.ensemble_trainer import (
        pad_members_to_templates,
    )

    img = 32
    cfgs = [
        ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=4,
                  mlp_dim=32, num_layers=2, img_size=img, dropout_rate=0.0),
        ViTConfig(patch_size=(16, 16, 5), hidden_size=16, num_heads=4,
                  mlp_dim=48, num_layers=3, img_size=img, dropout_rate=0.0),
    ]
    members = [init_baseline(c, seed=i)[1] for i, c in enumerate(cfgs)]

    n = 12
    y = np.tile([0, 1], n // 2).astype(np.int32)
    x = rng.normal(size=(n, img, img, 5, 1)).astype(np.float32)
    x[y == 1] += 1.0
    train = SplitArrays(x, y, [f"p{i}" for i in range(n)], ["PZ"] * n)
    val = SplitArrays(x[:6], y[:6], [f"p{i}" for i in range(6)], ["PZ"] * 6)

    kw = dict(num_epochs=3, train_batch_size=4, learning_rate=5e-3, seed=0)
    res_exact = train_ensemble(cfgs, members, train, val, **kw)

    t_cfgs, padded, masks = pad_members_to_templates(
        cfgs, members, max_mlp=48, max_layers=3)
    assert t_cfgs[0].mlp_dim == 48 and t_cfgs[0].num_layers == 3
    res_pad = train_ensemble(t_cfgs, padded, train, val, member_masks=masks,
                             crop_to=cfgs, **kw)

    # padded matmuls change f32 summation order, so agreement is to
    # accumulated-rounding precision, not bit-exact (forward-only parity IS
    # exact — test_sweep proves it)
    np.testing.assert_allclose(res_pad.class_probabilities,
                               res_exact.class_probabilities,
                               rtol=1e-4, atol=1e-5)
    for k in res_exact.metrics:
        np.testing.assert_allclose(res_pad.metrics[k], res_exact.metrics[k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    # cropped best params match the true-config tree structure and shapes
    for i, cfg in enumerate(cfgs):
        fc1 = res_pad.best_params[f"transformer_{i}"]["encoder"]["layers"][
            "block"]["ffn"]["fc1"]["kernel"]
        assert fc1.shape == (cfg.num_layers, cfg.hidden_size, cfg.mlp_dim)
    # Adam divides by sqrt(v)+eps, so tiny f32 summation-order differences
    # in near-zero gradients grow to ~lr-scale step noise on individual
    # elements; tolerate a few 1e-5 while requiring global agreement.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-3, atol=5e-5),
        res_pad.best_params, res_exact.best_params)
