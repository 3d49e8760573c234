"""Deduplicated volume pool: many folds/replicates over one device array.

CV folds share patients and bootstrap replicates are resamples of the SAME
81 training rows (`tools.py:137-147`), so materializing each fold/rep as its
own array (the torch DataLoader way) duplicates volumes ~Fx.  The pool keeps
every unique (patient, z0, lesion, aug_folder) volume exactly once,
UN-normalized; folds become int32 row-index vectors plus a scalar
normalization mean, and the training engine gathers + mean-centers
in-graph.  100 bootstrap replicates then cost ~40 MB of HBM instead of
~3.5 GB.

Semantics preserved from the reference loaders (`utils/data_utils*.py`):
per-fold scalar mean over the PRE-augmentation (or bootstrapped) trainset;
the every-3rd-HG augmentation append; validation normalized with the train
mean.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from vit3d_ensemble_tpu.data.volumes import (
    AUG_FOLDERS,
    load_manifest,
    load_volume,
)


@dataclasses.dataclass
class PooledSplit:
    """One fold's view into the pool."""

    row_idx: np.ndarray        # (N,) int32 rows into pool
    labels: np.ndarray         # (N,) float32
    mean: float                # scalar normalization mean (train mean)


@dataclasses.dataclass
class VolumePool:
    volumes: np.ndarray                      # (P, H, W, Z, C) float32, raw
    row_means: np.ndarray                    # (P,) float64 per-volume mean
    key_to_row: Dict[Tuple, int]

    def __len__(self) -> int:
        return self.volumes.shape[0]


class PoolBuilder:
    def __init__(self, data_root: str, size: int = 128):
        self.data_root = data_root
        self.size = size
        self._rows: List[np.ndarray] = []
        self._key_to_row: Dict[Tuple, int] = {}

    def row(self, patient: str, z0: int, lesion, aug_folder: str) -> int:
        key = (patient, int(z0), lesion, aug_folder)
        if key not in self._key_to_row:
            vol = load_volume(self.data_root, patient, int(z0), aug_folder,
                              self.size)
            self._key_to_row[key] = len(self._rows)
            self._rows.append(vol)
        return self._key_to_row[key]

    def manifest_rows(self, df: pd.DataFrame,
                      aug_folder: str = "original") -> np.ndarray:
        return np.array([self.row(r.Patient, r.z0, r.Lesion, aug_folder)
                         for r in df.itertuples()], dtype=np.int32)

    def build(self) -> VolumePool:
        vols = (np.stack(self._rows) if self._rows
                else np.zeros((0, self.size, self.size, 5, 1), np.float32))
        means = vols.reshape(len(self._rows), -1).mean(
            axis=1, dtype=np.float64) if self._rows else np.zeros(0)
        return VolumePool(vols, means, dict(self._key_to_row))


def manifest_labels(df: pd.DataFrame) -> np.ndarray:
    return np.array([0.0 if str(l) == "LG" else 1.0 for l in df["Label"]],
                    dtype=np.float32)


def pooled_train_split(builder: PoolBuilder, train_df: pd.DataFrame,
                       aug_mode: str = "disk"
                       ) -> Tuple[PooledSplit, np.ndarray]:
    """Trainset view: original rows + every-3rd-HG augmented rows; mean over
    the pre-augmentation rows (`utils/data_utils_cv.py:26-40`).

    aug_mode 'disk' reads the precomputed folders; 'none' skips augmentation.
    (On-device augmentation composes at the array level — see
    `data.pipeline.build_train_val` — and is not routed through the pool.)
    """
    base_idx = builder.manifest_rows(train_df)
    labels = manifest_labels(train_df)
    # mean over pre-augmentation train rows (each volume same size: mean of
    # per-row means == global scalar mean)
    mean_rows = base_idx

    idx_parts = [base_idx]
    label_parts = [labels]
    if aug_mode == "disk":
        hg_positions = np.flatnonzero(labels == 1.0)
        positions = hg_positions[::3]
        if len(positions):
            sub = train_df.iloc[positions]
            for aug in AUG_FOLDERS:
                idx_parts.append(builder.manifest_rows(sub, aug))
                label_parts.append(manifest_labels(sub))
    elif aug_mode != "none":
        raise ValueError(f"pooled splits support aug_mode disk|none, "
                         f"got {aug_mode!r}")
    return PooledSplit(
        row_idx=np.concatenate(idx_parts),
        labels=np.concatenate(label_parts),
        mean=float("nan"),          # filled by finalize_means
    ), mean_rows


def finalize_mean(pool: VolumePool, mean_rows: np.ndarray) -> float:
    return float(pool.row_means[mean_rows].mean()) if len(mean_rows) else 0.0


def build_pooled_cv(csv_path: str, data_root: str, num_cv: int,
                    size: int = 128, aug_mode: str = "disk"):
    """CV folds as pool views.  Returns (pool, [(train, val), ...])."""
    import os

    builder = PoolBuilder(data_root, size)
    folds = []
    for cv in range(num_cv):
        tdf = load_manifest(os.path.join(csv_path,
                                         f"training_cv{cv + 1}.csv"))
        vdf = load_manifest(os.path.join(csv_path,
                                         f"validation_cv{cv + 1}.csv"))
        train, mean_rows = pooled_train_split(builder, tdf, aug_mode)
        val = PooledSplit(builder.manifest_rows(vdf), manifest_labels(vdf),
                          float("nan"))
        folds.append((train, val, mean_rows))
    pool = builder.build()
    out = []
    for train, val, mean_rows in folds:
        mean = finalize_mean(pool, mean_rows)
        out.append((dataclasses.replace(train, mean=mean),
                    dataclasses.replace(val, mean=mean)))
    return pool, out


def build_pooled_fixed(train_csv: str, val_csv: str, data_root: str,
                       size: int = 128, aug_mode: str = "disk"):
    """The fixed split as a 1-fold pool view (whole-dataset training)."""
    builder = PoolBuilder(data_root, size)
    tdf = load_manifest(train_csv)
    vdf = load_manifest(val_csv)
    train, mean_rows = pooled_train_split(builder, tdf, aug_mode)
    val = PooledSplit(builder.manifest_rows(vdf), manifest_labels(vdf),
                      float("nan"))
    pool = builder.build()
    mean = finalize_mean(pool, mean_rows)
    return pool, [(dataclasses.replace(train, mean=mean),
                   dataclasses.replace(val, mean=mean))]


def build_pooled_bootstrap(train_csv: str, val_csv: str, data_root: str,
                           num_rep: int, size: int = 128,
                           aug_mode: str = "disk", seed0: int = 0):
    """Bootstrap replicates as pool views (`utils/data_utils_bootstrap.py`):
    replicate k resamples training.csv with seed k (`train_baseline_
    bootstrap.py:163`); validation is the fixed split, re-normalized with
    each replicate's mean."""
    from vit3d_ensemble_tpu.data.pipeline import bootstrap_resample

    builder = PoolBuilder(data_root, size)
    tdf_base = load_manifest(train_csv)
    vdf = load_manifest(val_csv)
    folds = []
    for rep in range(num_rep):
        tdf = bootstrap_resample(tdf_base, seed0 + rep)
        train, mean_rows = pooled_train_split(builder, tdf, aug_mode)
        val = PooledSplit(builder.manifest_rows(vdf), manifest_labels(vdf),
                          float("nan"))
        folds.append((train, val, mean_rows))
    pool = builder.build()
    out = []
    for train, val, mean_rows in folds:
        mean = finalize_mean(pool, mean_rows)
        out.append((dataclasses.replace(train, mean=mean),
                    dataclasses.replace(val, mean=mean)))
    return pool, out
