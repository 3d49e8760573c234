"""Split assembly: normalization, augmentation policy, bootstrap, batching.

Capability-equivalent to the reference's three loader modules:

  * fixed split  — `utils/data_utils.py:18-58` (whose body is dead under an
    inverted rank guard, defect D3; this is the *intended* behavior);
  * 5-fold CV    — `utils/data_utils_cv.py:18-54`;
  * bootstrap    — `utils/data_utils_bootstrap.py:22-61` + `tools.py:137-147`.

Semantics preserved exactly:
  * scalar mean-centering computed over the PRE-augmentation trainset and
    applied to train and validation (`utils/data_utils_cv.py:26-27,43-44`,
    `tools.py:18-26`; std divisor 1);
  * class-imbalance augmentation: the 3 augmented variants of every 3rd
    high-grade training item (hg_positions[::3]) are APPENDED, grouped by
    variant (`utils/data_utils_cv.py:29-40`);
  * bootstrap resampling = pandas .sample(n=len, replace=True,
    random_state=seed) (`tools.py:137-147`) — reproduced with pandas itself
    for bit-identical row selection.

Deviation (documented): the reference's bootstrap loader indexes augmented
datasets built from the ORIGINAL csv with positions computed on the
BOOTSTRAPPED frame (defect D18 — mismatched labels / IndexError risk); here
augmentation rows follow the bootstrapped rows, which is the intent.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from vit3d_ensemble_tpu.data.volumes import (
    AUG_FOLDERS,
    SplitArrays,
    load_manifest,
    load_split,
)


def bootstrap_resample(manifest: "pd.DataFrame | str", seed: int) -> pd.DataFrame:
    """Seeded resample-with-replacement, bit-identical to `tools.py:137-147`."""
    df = load_manifest(manifest) if isinstance(manifest, str) else manifest
    df = df.reset_index(drop=True)
    return df.sample(n=len(df), replace=True, random_state=seed)


def _append_disk_augmentation(train: SplitArrays, df: pd.DataFrame,
                              data_root: str, size: int) -> SplitArrays:
    """Append rotation/vflip/hflip variants of every 3rd HG item, from the
    precomputed on-disk folders (bit-parity with the reference loaders)."""
    hg_positions = np.flatnonzero(train.labels == 1)
    positions = hg_positions[::3]
    if len(positions) == 0:
        return train
    parts = [train]
    sub = df.iloc[positions]
    for aug in AUG_FOLDERS:
        parts.append(load_split(sub, data_root, aug_folder=aug, size=size))
    return SplitArrays.concat(parts)


def _append_device_augmentation(train: SplitArrays, seed: int) -> SplitArrays:
    """Same policy, but variants are computed on device (`data.augment`)."""
    import jax

    from vit3d_ensemble_tpu.data.augment import augment_batch

    hg_positions = np.flatnonzero(train.labels == 1)
    positions = hg_positions[::3]
    if len(positions) == 0:
        return train
    src = train.subset(positions)
    aug = np.asarray(augment_batch(src.volumes, jax.random.key(seed)))
    parts = [train]
    for k in range(3):
        parts.append(dataclasses.replace(
            src, volumes=aug[k],
            patients=list(src.patients), zones=list(src.zones)))
    return SplitArrays.concat(parts)


def build_train_val(
    train_manifest: "pd.DataFrame | str",
    val_manifest: "pd.DataFrame | str",
    data_root: str,
    aug_mode: str = "disk",          # 'disk' | 'device' | 'none'
    size: int = 128,
    aug_seed: int = 42,
) -> Tuple[SplitArrays, SplitArrays, float]:
    """Assemble a normalized (train, val) pair.

    Returns (train, val, mean) with mean the scalar train-mean subtracted
    from both splits (computed pre-augmentation, like
    `utils/data_utils_cv.py:26-27`).
    """
    train_df = (load_manifest(train_manifest)
                if isinstance(train_manifest, str) else train_manifest)
    train = load_split(train_df, data_root, size=size)
    val = load_split(val_manifest, data_root, size=size)

    # float64 accumulation to match np.mean over the reference's float64
    # volumes exactly.
    mean = float(np.mean(train.volumes, dtype=np.float64))

    if aug_mode == "disk":
        train = _append_disk_augmentation(train, train_df, data_root, size)
    elif aug_mode == "device":
        train = _append_device_augmentation(train, aug_seed)
    elif aug_mode != "none":
        raise ValueError(f"unknown aug_mode: {aug_mode!r}")

    train = dataclasses.replace(train, volumes=train.volumes - np.float32(mean))
    val = dataclasses.replace(val, volumes=val.volumes - np.float32(mean))
    return train, val, mean


@dataclasses.dataclass
class EpochBatcher:
    """Shuffled fixed-shape batches with a validity mask.

    The reference's RandomSampler DataLoader yields a ragged final batch
    (`utils/data_utils_cv.py:49-51`); under jit we keep static shapes by
    padding the final batch and masking padded rows out of the loss and the
    pos_weight computation.
    """

    n: int
    batch_size: int
    seed: int = 42
    shuffle: bool = True

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    @property
    def steps_per_epoch(self) -> int:
        return -(-self.n // self.batch_size)

    def epoch(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yields (indices (B,), mask (B,)) per step."""
        order = (self._rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        B = self.batch_size
        for s in range(self.steps_per_epoch):
            chunk = order[s * B:(s + 1) * B]
            mask = np.ones(B, dtype=np.float32)
            if len(chunk) < B:
                mask[len(chunk):] = 0.0
                chunk = np.concatenate(
                    [chunk, np.zeros(B - len(chunk), dtype=chunk.dtype)])
            yield chunk, mask

    def batches(self, num_steps: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Infinite epoch stream truncated at num_steps (the reference's
        `while True` epoch loop + global_step cap, `train_baseline_cv.py:154`).
        """
        done = 0
        while done < num_steps:
            for idx, mask in self.epoch():
                yield idx, mask
                done += 1
                if done >= num_steps:
                    return
