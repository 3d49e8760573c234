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


def _stable_angle(seed: int, key: Tuple, lo: float, hi: float) -> float:
    """Per-(patient, z0, lesion) rotation angle, stable across folds and
    processes — the reference's precomputed 'rotation' folder likewise holds
    ONE fixed random rotation per patient shared by every split that reads
    it (`data/augment.py` module docstring)."""
    import zlib

    h = zlib.crc32(repr(key).encode())
    return float(np.random.default_rng((seed, h)).uniform(lo, hi))


class PoolBuilder:
    def __init__(self, data_root: str, size: int = 128):
        self.data_root = data_root
        self.size = size
        self._rows: List[np.ndarray] = []
        self._key_to_row: Dict[Tuple, int] = {}
        #: derived (device-augmented) rows: row -> (src_row, op, angle);
        #: placeholders in _rows until build()
        self._derived: Dict[int, Tuple[int, str, float]] = {}

    def row(self, patient: str, z0: int, lesion, aug_folder: str) -> int:
        key = (patient, int(z0), lesion, aug_folder)
        if key not in self._key_to_row:
            vol = load_volume(self.data_root, patient, int(z0), aug_folder,
                              self.size)
            self._key_to_row[key] = len(self._rows)
            self._rows.append(vol)
        return self._key_to_row[key]

    def device_aug_row(self, patient: str, z0: int, lesion, op: str,
                       aug_seed: int) -> int:
        """A row holding `op` applied ON DEVICE to the original volume —
        no disk folder is read.  op in AUG_FOLDERS; the transform runs
        batched in build() (`data/augment.py` semantics: flips are exact
        np.flipud/fliplr equivalents, rotation is a nearest-neighbor
        in-plane rotation by a per-lesion fixed random angle)."""
        key = (patient, int(z0), lesion, f"device_{op}")
        if key not in self._key_to_row:
            src = self.row(patient, z0, lesion, "original")
            row = len(self._rows)
            self._key_to_row[key] = row
            self._rows.append(None)            # filled in build()
            from vit3d_ensemble_tpu.data.augment import ROTATION_RANGE_DEG

            angle = (_stable_angle(aug_seed, key[:3], *ROTATION_RANGE_DEG)
                     if op == "rotation" else 0.0)
            self._derived[row] = (src, op, angle)
        return self._key_to_row[key]

    def manifest_rows(self, df: pd.DataFrame,
                      aug_folder: str = "original") -> np.ndarray:
        return np.array([self.row(r.Patient, r.z0, r.Lesion, aug_folder)
                         for r in df.itertuples()], dtype=np.int32)

    def device_aug_manifest_rows(self, df: pd.DataFrame, op: str,
                                 aug_seed: int) -> np.ndarray:
        return np.array([self.device_aug_row(r.Patient, r.z0, r.Lesion, op,
                                             aug_seed)
                         for r in df.itertuples()], dtype=np.int32)

    def _fill_derived(self) -> None:
        if not self._derived:
            return
        rot = [(row, src, ang) for row, (src, op, ang)
               in self._derived.items() if op == "rotation"]
        for row, (src, op, _) in self._derived.items():
            if op == "vertical_flip":
                self._rows[row] = self._rows[src][::-1].copy()
            elif op == "horizontal_flip":
                self._rows[row] = self._rows[src][:, ::-1].copy()
        if rot:
            # one batched device call for every rotation row
            import jax
            import jax.numpy as jnp

            from vit3d_ensemble_tpu.data.augment import rotate_inplane

            vols = jnp.asarray(np.stack([self._rows[s] for _, s, _ in rot]))
            angles = jnp.asarray(np.array([a for *_, a in rot], np.float32))
            out = np.asarray(jax.jit(jax.vmap(rotate_inplane))(vols, angles))
            for i, (row, _, _) in enumerate(rot):
                self._rows[row] = out[i]
        self._derived.clear()

    def build(self) -> VolumePool:
        self._fill_derived()
        vols = (np.stack(self._rows) if self._rows
                else np.zeros((0, self.size, self.size, 5, 1), np.float32))
        means = vols.reshape(len(self._rows), -1).mean(
            axis=1, dtype=np.float64) if self._rows else np.zeros(0)
        return VolumePool(vols, means, dict(self._key_to_row))


def manifest_labels(df: pd.DataFrame) -> np.ndarray:
    return np.array([0.0 if str(l) == "LG" else 1.0 for l in df["Label"]],
                    dtype=np.float32)


def pooled_train_split(builder: PoolBuilder, train_df: pd.DataFrame,
                       aug_mode: str = "disk", aug_seed: int = 42
                       ) -> Tuple[PooledSplit, np.ndarray]:
    """Trainset view: original rows + every-3rd-HG augmented rows; mean over
    the pre-augmentation rows (`utils/data_utils_cv.py:26-40`).

    aug_mode 'disk' reads the precomputed folders; 'device' computes the
    same three variants on device at pool-build time (`data/augment.py`;
    no aug folders needed on disk — flips exact, rotation a per-lesion
    fixed random angle like the reference's precomputed folder); 'none'
    skips augmentation.
    """
    base_idx = builder.manifest_rows(train_df)
    labels = manifest_labels(train_df)
    # mean over pre-augmentation train rows (each volume same size: mean of
    # per-row means == global scalar mean)
    mean_rows = base_idx

    idx_parts = [base_idx]
    label_parts = [labels]
    if aug_mode in ("disk", "device"):
        hg_positions = np.flatnonzero(labels == 1.0)
        positions = hg_positions[::3]
        if len(positions):
            sub = train_df.iloc[positions]
            for aug in AUG_FOLDERS:
                idx_parts.append(
                    builder.manifest_rows(sub, aug) if aug_mode == "disk"
                    else builder.device_aug_manifest_rows(sub, aug,
                                                          aug_seed))
                label_parts.append(manifest_labels(sub))
    elif aug_mode != "none":
        raise ValueError(f"pooled splits support aug_mode disk|device|none,"
                         f" got {aug_mode!r}")
    return PooledSplit(
        row_idx=np.concatenate(idx_parts),
        labels=np.concatenate(label_parts),
        mean=float("nan"),          # filled by finalize_means
    ), mean_rows


def finalize_mean(pool: VolumePool, mean_rows: np.ndarray) -> float:
    return float(pool.row_means[mean_rows].mean()) if len(mean_rows) else 0.0


def build_pooled_cv(csv_path: str, data_root: str, num_cv: int,
                    size: int = 128, aug_mode: str = "disk",
                    aug_seed: int = 42):
    """CV folds as pool views.  Returns (pool, [(train, val), ...])."""
    import os

    builder = PoolBuilder(data_root, size)
    folds = []
    for cv in range(num_cv):
        tdf = load_manifest(os.path.join(csv_path,
                                         f"training_cv{cv + 1}.csv"))
        vdf = load_manifest(os.path.join(csv_path,
                                         f"validation_cv{cv + 1}.csv"))
        train, mean_rows = pooled_train_split(builder, tdf, aug_mode,
                                              aug_seed)
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
                       size: int = 128, aug_mode: str = "disk",
                       aug_seed: int = 42):
    """The fixed split as a 1-fold pool view (whole-dataset training)."""
    builder = PoolBuilder(data_root, size)
    tdf = load_manifest(train_csv)
    vdf = load_manifest(val_csv)
    train, mean_rows = pooled_train_split(builder, tdf, aug_mode, aug_seed)
    val = PooledSplit(builder.manifest_rows(vdf), manifest_labels(vdf),
                      float("nan"))
    pool = builder.build()
    mean = finalize_mean(pool, mean_rows)
    return pool, [(dataclasses.replace(train, mean=mean),
                   dataclasses.replace(val, mean=mean))]


def build_pooled_bootstrap(train_csv: str, val_csv: str, data_root: str,
                           num_rep: int, size: int = 128,
                           aug_mode: str = "disk", seed0: int = 0,
                           aug_seed: int = 42):
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
        train, mean_rows = pooled_train_split(builder, tdf, aug_mode,
                                              aug_seed)
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
