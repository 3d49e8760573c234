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
