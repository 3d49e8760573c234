"""Volume loading with the reference's exact slice-selection semantics.

Capability-equivalent to `ProstateDataset` (`create_dataset.py:14-69`):

  * manifest CSV columns: Patient, Label, Zone, GG, z0, Lesion
    (`csv_files/fixed_split/training.csv:1`);
  * per item: 5 consecutive PNG slices centered at the index derived from
    z0, into a (128, 128, 5, 1) HWZC volume;
  * slice order is REVERSED (real_z = n_slices - z0 + 1) for every patient
    except 'ProstateX-0179' (`create_dataset.py:41`);
  * filenames are '1-%02d.<ext>' (`create_dataset.py:42`);
  * the 5-slice window is clamped at the low end only:
    slices[max(0, idx-2) : idx+3] (`create_dataset.py:44`) — windows
    running off the top of the stack leave trailing zero slices;
  * labels: 'LG' -> 0, anything else -> 1 (`create_dataset.py:62-63`);
  * optional Gaussian-noise OOD mode (`create_dataset.py:55-59`).

Deviation (documented): the reference builds its slice list from *unsorted*
`os.listdir` (defect D13, SURVEY.md) so the "neighborhood" can be arbitrary;
we sort the listing, which is the intended behavior ('1-%02d' names sort
correctly — slice counts are 18-25, always 2 digits).

Unlike the reference (PIL decode per access, every epoch), each patient's
full slice stack is decoded once and memoized process-wide.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

MANIFEST_COLUMNS = ("Patient", "Label", "Zone", "GG", "z0", "Lesion")
#: The one patient whose slice files are already in anatomical order
#: (`create_dataset.py:41`).
UNREVERSED_PATIENT = "ProstateX-0179"
AUG_FOLDERS = ("rotation", "vertical_flip", "horizontal_flip")


def load_manifest(csv_path: str) -> pd.DataFrame:
    """Read a split CSV (schema above)."""
    return pd.read_csv(csv_path)


@functools.lru_cache(maxsize=4096)
def _patient_stack(data_root: str, patient: str, aug_folder: str,
                   size: int) -> Tuple[np.ndarray, Tuple[str, ...]]:
    """Decode & memoize one patient folder -> ((n_slices, H, W) uint8, names).

    PNG folders go through the native C++/libpng batch decoder when
    available (`data/native_loader.py`, one C call per folder); anything
    else — .npy slices, missing toolchain, odd formats — takes the PIL
    path.
    """
    folder = os.path.join(data_root, patient, aug_folder)
    names = tuple(sorted(os.listdir(folder)))
    paths = [os.path.join(folder, name) for name in names]

    if names and all(n.endswith(".png") for n in names):
        from vit3d_ensemble_tpu.data.native_loader import decode_batch

        stack = decode_batch(paths, size)
        if stack is not None:
            return stack, names

    from PIL import Image

    imgs = []
    for path in paths:
        if path.endswith(".npy"):
            imgs.append(np.load(path))
        else:
            imgs.append(np.asarray(Image.open(path)))
        if imgs[-1].shape[:2] != (size, size):
            # the native decoder rejects off-size images (volume_loader.cpp
            # expected_size check); fail as loudly here instead of letting
            # the (size, size, 5, 1) volume assembly throw a shape error
            raise ValueError(
                f"slice {path} is {imgs[-1].shape[:2]}, expected "
                f"({size}, {size})")
    return np.stack(imgs), names


def load_volume(
    data_root: str,
    patient: str,
    z0: int,
    aug_folder: str = "original",
    size: int = 128,
    ood: bool = False,
    ood_mean: float = 0.0,
    ood_var: float = 1.0,
    ood_rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """One (size, size, 5, 1) float32 volume, reference slice semantics."""
    stack, names = _patient_stack(data_root, patient, aug_folder, size)
    n = len(names)
    real_z = z0 if patient == UNREVERSED_PATIENT else n - z0 + 1
    ext = names[0].rsplit(".", 1)[1]
    target = f"1-{real_z:02d}.{ext}"
    idx = names.index(target)
    lo = max(0, idx - 2)
    window = stack[lo: idx + 3]

    volume = np.zeros((size, size, 5, 1), dtype=np.float32)
    for k in range(window.shape[0]):
        v = window[k].astype(np.float32)
        if ood:
            rng = ood_rng or np.random.default_rng()
            v = v + rng.normal(ood_mean, ood_var, v.shape)
        volume[:, :, k, 0] = v
    return volume


@dataclasses.dataclass
class SplitArrays:
    """A whole split as dense arrays — the unit the training stack consumes."""

    volumes: np.ndarray          # (N, H, W, Z, 1) float32, channels-last
    labels: np.ndarray           # (N,) int32 — LG=0, HG=1
    patients: List[str]
    zones: List[str]

    def __len__(self) -> int:
        return len(self.labels)

    def subset(self, idx: Sequence[int]) -> "SplitArrays":
        idx = np.asarray(idx)
        return SplitArrays(
            volumes=self.volumes[idx],
            labels=self.labels[idx],
            patients=[self.patients[i] for i in idx],
            zones=[self.zones[i] for i in idx],
        )

    @staticmethod
    def concat(parts: Sequence["SplitArrays"]) -> "SplitArrays":
        return SplitArrays(
            volumes=np.concatenate([p.volumes for p in parts]),
            labels=np.concatenate([p.labels for p in parts]),
            patients=sum((p.patients for p in parts), []),
            zones=sum((p.zones for p in parts), []),
        )


def load_split(
    manifest: "pd.DataFrame | str",
    data_root: str,
    aug_folder: str = "original",
    size: int = 128,
    ood: bool = False,
    ood_mean: float = 0.0,
    ood_var: float = 1.0,
    ood_seed: Optional[int] = None,
) -> SplitArrays:
    """Load every row of a manifest into one SplitArrays."""
    df = load_manifest(manifest) if isinstance(manifest, str) else manifest
    rng = np.random.default_rng(ood_seed) if ood else None
    volumes = np.stack([
        load_volume(data_root, row.Patient, int(row.z0), aug_folder, size,
                    ood=ood, ood_mean=ood_mean, ood_var=ood_var, ood_rng=rng)
        for row in df.itertuples()
    ]) if len(df) else np.zeros((0, size, size, 5, 1), np.float32)
    labels = np.array([0 if str(l) == "LG" else 1 for l in df["Label"]],
                      dtype=np.int32)
    return SplitArrays(
        volumes=volumes,
        labels=labels,
        patients=[str(p) for p in df["Patient"]],
        zones=[str(z) for z in df["Zone"]],
    )


def clear_volume_cache() -> None:
    _patient_stack.cache_clear()
