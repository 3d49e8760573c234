"""Config registry tests: the README grid is the contract
(`/root/reference/README.md:24-44`), documenting reference defect D1."""

import pytest

from vit3d_ensemble_tpu.configs import (
    BASELINE_CONFS,
    BEST_ENSEMBLE,
    ViTConfig,
    get_config,
    parameters_config,
)

# The README table, transcribed (p, d, L, D, k) per configuration number.
README_GRID = {
    1: (16, 2048, 4, 64, 4),
    2: (16, 2048, 4, 32, 8),
    3: (16, 2048, 4, 16, 16),
    4: (16, 2048, 6, 64, 4),
    5: (16, 2048, 6, 32, 8),
    6: (16, 2048, 6, 16, 16),
    7: (16, 2048, 8, 64, 4),
    8: (16, 2048, 8, 32, 8),
    9: (16, 2048, 8, 16, 16),
    10: (16, 3072, 4, 64, 4),
    11: (16, 3072, 4, 32, 8),
    12: (16, 3072, 4, 16, 16),
    13: (16, 3072, 6, 64, 4),
    14: (16, 3072, 6, 32, 8),
    15: (16, 3072, 6, 16, 16),
    16: (16, 3072, 8, 64, 4),
    17: (16, 3072, 8, 32, 8),
    18: (16, 3072, 8, 16, 16),
}


def test_readme_grid():
    for conf, expected in README_GRID.items():
        assert parameters_config(conf) == expected, conf


def test_collapsed_mode_reproduces_defect_d1():
    # The reference's buggy mapping (tools.py:64-78) collapses all 18 configs.
    for conf in BASELINE_CONFS:
        assert parameters_config(conf, collapsed=True) == (16, 3072, 8, 16, 16)
    assert parameters_config(22, collapsed=True) == (8, 2204, 6, 8, 8)


def test_small_grid():
    assert parameters_config(19) == (8, 2204, 4, 16, 4)
    assert parameters_config(22) == (8, 2204, 6, 8, 8)
    with pytest.raises(KeyError):
        parameters_config(27)


def test_vit_config_derived_shapes():
    cfg = ViTConfig.from_conf(1)
    assert cfg.patch_size == (16, 16, 5)
    assert cfg.grid_shape == (8, 8, 1)
    assert cfg.n_patches == 64
    assert cfg.seq_len == 65          # modeling.py:141,157
    assert cfg.head_dim == 16
    cfg9 = ViTConfig.from_conf(9)
    assert cfg9.hidden_size == 16 and cfg9.num_heads == 16
    assert cfg9.head_dim == 1


def test_get_config_matches_from_conf():
    for conf in BASELINE_CONFS:
        assert get_config(*parameters_config(conf)) == ViTConfig.from_conf(conf)


def test_best_ensemble_composition():
    assert BEST_ENSEMBLE == (5, 9, 11)   # train_ensemble_whole_dataset.py:199-200
