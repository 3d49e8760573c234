"""Data-layer tests: slice-selection semantics, normalization, augmentation
policy, bootstrap determinism, batching — against a controlled synthetic
dataset and (when available) the reference's shipped ProstateX data."""

import numpy as np
import pandas as pd
import pytest

from vit3d_ensemble_tpu.data import (
    EpochBatcher,
    SplitArrays,
    bootstrap_resample,
    build_train_val,
    load_split,
    load_volume,
)
from vit3d_ensemble_tpu.data.volumes import clear_volume_cache


@pytest.fixture()
def synth_dataset(tmp_path):
    """3 fake patients x 4 folders of 8x8 PNG slices with known pixel values.

    Pixel value of slice j in patient i's folder f == i*100 + j + hash(f)%7,
    so any volume can be predicted exactly.
    """
    from PIL import Image

    root = tmp_path / "dataset"
    n_slices = {"P-0001": 10, "P-0002": 12, "ProstateX-0179": 10}
    for pi, (pat, n) in enumerate(n_slices.items()):
        for f in ("original", "rotation", "vertical_flip", "horizontal_flip"):
            d = root / pat / f
            d.mkdir(parents=True)
            for j in range(1, n + 1):
                val = (pi * 20 + j + len(f) % 7) % 256
                arr = np.full((8, 8), val, dtype=np.uint8)
                Image.fromarray(arr).save(d / f"1-{j:02d}.png")
    clear_volume_cache()
    return root, n_slices


def test_slice_selection_reversal_and_clamp(synth_dataset):
    root, n_slices = synth_dataset
    # normal patient: real_z = n - z0 + 1 (create_dataset.py:41)
    v = load_volume(str(root), "P-0001", z0=4, size=8)
    n = n_slices["P-0001"]
    real_z = n - 4 + 1  # = 7 -> window slices 5..9 (1-indexed)
    base = 0 * 20 + len("original") % 7
    expected = [base + z for z in range(real_z - 2, real_z + 3)]
    got = [int(v[0, 0, k, 0]) for k in range(5)]
    assert got == expected

    # the un-reversed patient: real_z = z0 exactly
    v = load_volume(str(root), "ProstateX-0179", z0=4, size=8)
    base = 2 * 20 + len("original") % 7
    assert [int(v[0, 0, k, 0]) for k in range(5)] == [base + z for z in range(2, 7)]


def test_low_end_clamp_and_trailing_zeros(synth_dataset):
    root, n_slices = synth_dataset
    # z0 = n -> real_z = 1 -> idx 0 -> window = slices[0:3], 2 trailing zeros
    n = n_slices["P-0001"]
    v = load_volume(str(root), "P-0001", z0=n, size=8)
    base = 0 * 20 + len("original") % 7
    assert [int(v[0, 0, k, 0]) for k in range(5)] == [base + 1, base + 2,
                                                      base + 3, 0, 0]
    # z0 = 1 -> real_z = n -> idx n-1 -> window = slices[n-3:n], PLACED AT
    # k=0..2 with trailing zeros (reference fills window from k=0).
    v = load_volume(str(root), "P-0001", z0=1, size=8)
    assert [int(v[0, 0, k, 0]) for k in range(5)] == [base + n - 2,
                                                      base + n - 1,
                                                      base + n, 0, 0]


def _synth_manifest(rows):
    return pd.DataFrame(rows, columns=["Patient", "Label", "Zone", "GG",
                                       "z0", "Lesion"])


def test_load_split_labels_and_shapes(synth_dataset):
    root, _ = synth_dataset
    df = _synth_manifest([
        ("P-0001", "LG", "PZ", 1, 4, 1),
        ("P-0002", "HG", "TZ", 4, 5, 1),
    ])
    s = load_split(df, str(root), size=8)
    assert s.volumes.shape == (2, 8, 8, 5, 1)
    assert s.volumes.dtype == np.float32
    assert list(s.labels) == [0, 1]
    assert s.patients == ["P-0001", "P-0002"]


def test_build_train_val_augmentation_policy(synth_dataset):
    root, _ = synth_dataset
    # 7 HG items -> hg_positions[::3] picks 3 -> +9 augmented rows
    rows = [("P-0001", "HG" if i % 2 == 0 else "LG", "PZ", 2, 4, 1)
            for i in range(13)]  # HG at 0,2,4,6,8,10,12 -> 7 HG
    train_df = _synth_manifest(rows)
    val_df = _synth_manifest([("P-0002", "LG", "PZ", 1, 5, 1)])
    train, val, mean = build_train_val(train_df, val_df, str(root),
                                       aug_mode="disk", size=8)
    assert len(train) == 13 + 3 * 3
    # appended rows are grouped by variant and are all HG
    assert all(train.labels[13:] == 1)
    # mean computed pre-augmentation
    pre = load_split(train_df, str(root), size=8)
    assert mean == pytest.approx(float(np.mean(pre.volumes, dtype=np.float64)))
    # normalization applied to both splits
    assert float(np.mean(train.volumes[:13], dtype=np.float64)) == pytest.approx(0.0, abs=1e-4)
    v_raw = load_split(val_df, str(root), size=8)
    np.testing.assert_allclose(val.volumes, v_raw.volumes - np.float32(mean),
                               atol=1e-5)


def test_device_augmentation_mode(synth_dataset):
    root, _ = synth_dataset
    rows = [("P-0001", "HG", "PZ", 2, 4, 1) for _ in range(3)]
    train_df = _synth_manifest(rows)
    val_df = _synth_manifest([("P-0002", "LG", "PZ", 1, 5, 1)])
    train, _, _ = build_train_val(train_df, val_df, str(root),
                                  aug_mode="device", size=8)
    assert len(train) == 3 + 3  # hg[::3] -> 1 position x 3 variants


def test_pooled_device_augmentation(synth_dataset):
    """--aug_mode device through the POOLED path (the sweep engines'):
    same row counts and policy as disk mode, flips bit-exact flipud/fliplr
    of the originals, rotation deterministic per lesion across folds."""
    from vit3d_ensemble_tpu.data.pool import (
        PoolBuilder,
        pooled_train_split,
    )

    root, _ = synth_dataset
    rows = [("P-0001", "HG", "PZ", 2, 4, 1),
            ("P-0002", "LG", "PZ", 1, 5, 1),
            ("ProstateX-0179", "HG", "PZ", 3, 4, 1),
            ("P-0001", "HG", "PZ", 2, 6, 2),
            ("P-0002", "HG", "PZ", 4, 5, 1)]
    df = _synth_manifest(rows)

    b_disk = PoolBuilder(str(root), size=8)
    disk, _ = pooled_train_split(b_disk, df, aug_mode="disk")
    b_dev = PoolBuilder(str(root), size=8)
    dev, _ = pooled_train_split(b_dev, df, aug_mode="device")
    pool = b_dev.build()

    # 4 HG -> hg[::3] picks 2 -> +6 augmented rows, labels match disk mode
    assert len(dev.row_idx) == len(disk.row_idx) == 5 + 6
    np.testing.assert_array_equal(dev.labels, disk.labels)

    # flip variants are exact flipud/fliplr of the original volumes
    orig = pool.volumes[dev.row_idx[:5]]
    n_aug = 2
    rot = pool.volumes[dev.row_idx[5:5 + n_aug]]
    vfl = pool.volumes[dev.row_idx[5 + n_aug:5 + 2 * n_aug]]
    hfl = pool.volumes[dev.row_idx[5 + 2 * n_aug:]]
    src = orig[[0, 4]]                   # hg_positions [0,2,3,4][::3]
    np.testing.assert_array_equal(vfl, src[:, ::-1])
    np.testing.assert_array_equal(hfl, src[:, :, ::-1])
    assert rot.shape == src.shape and np.all(np.isfinite(rot))

    # the same lesion gets the same rotation row in a different fold/view
    dev2, _ = pooled_train_split(b_dev, df.iloc[[0, 4]], aug_mode="device")
    assert dev2.row_idx[2] == dev.row_idx[5]      # shared rotation row

    # mean over pre-augmentation rows only, same as disk mode
    b2 = PoolBuilder(str(root), size=8)
    _, mean_rows_disk = pooled_train_split(b2, df, aug_mode="disk")
    b3 = PoolBuilder(str(root), size=8)
    _, mean_rows_dev = pooled_train_split(b3, df, aug_mode="device")
    np.testing.assert_array_equal(mean_rows_disk, mean_rows_dev)


def test_bootstrap_matches_pandas_and_is_deterministic(synth_dataset):
    df = _synth_manifest([("P-0001", "LG", "PZ", 1, i % 6 + 3, 1)
                          for i in range(20)])
    a = bootstrap_resample(df, seed=7)
    b = bootstrap_resample(df, seed=7)
    pd.testing.assert_frame_equal(a, b)
    expected = df.reset_index(drop=True).sample(n=20, replace=True,
                                                random_state=7)
    pd.testing.assert_frame_equal(a, expected)
    assert len(a) == 20


def test_epoch_batcher_masks_and_coverage():
    b = EpochBatcher(n=10, batch_size=4, seed=0)
    steps = list(b.epoch())
    assert len(steps) == 3
    idx = np.concatenate([s[0] for s in steps])
    masks = np.concatenate([s[1] for s in steps])
    assert masks.sum() == 10
    assert sorted(idx[masks.astype(bool)]) == list(range(10))
    # infinite stream truncation
    assert len(list(b.batches(7))) == 7


def test_augment_transforms_match_numpy():
    import jax
    import jax.numpy as jnp

    from vit3d_ensemble_tpu.data.augment import (
        horizontal_flip,
        rotate_inplane,
        vertical_flip,
    )

    rng = np.random.default_rng(0)
    v = rng.normal(size=(16, 16, 5, 1)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(vertical_flip(jnp.asarray(v))),
                                  np.flip(v, 0))
    np.testing.assert_array_equal(np.asarray(horizontal_flip(jnp.asarray(v))),
                                  np.flip(v, 1))
    # 0 deg == identity; 90 deg == one rot90 (square, nearest-neighbor)
    np.testing.assert_allclose(
        np.asarray(rotate_inplane(jnp.asarray(v), jnp.float32(0.0))), v,
        atol=1e-6)
    r90 = np.asarray(rotate_inplane(jnp.asarray(v), jnp.float32(90.0)))
    np.testing.assert_allclose(r90, np.rot90(v, k=-1, axes=(0, 1)), atol=1e-5)


# --- real-data integration (skipped without the reference checkout) --------


def test_reference_fixed_split_counts(reference_path):
    train, val, mean = build_train_val(
        str(reference_path / "csv_files/fixed_split/training.csv"),
        str(reference_path / "csv_files/fixed_split/validation.csv"),
        str(reference_path / "dataset"),
        aug_mode="disk",
    )
    # SURVEY.md §2 row 14 (verified by executing the reference): 81 -> 108
    assert len(train) == 108
    assert len(val) == 9
    assert train.volumes.shape[1:] == (128, 128, 5, 1)


def test_reference_cv_fold_counts(reference_path):
    s = load_split(str(reference_path /
                       "csv_files/cross_validation/training_cv1.csv"),
                   str(reference_path / "dataset"))
    v = load_split(str(reference_path /
                       "csv_files/cross_validation/validation_cv1.csv"),
                   str(reference_path / "dataset"))
    assert len(s) == 72 and len(v) == 18
