"""Data subsystem: manifest CSVs -> preloaded device-ready volume arrays.

TPU-first redesign of the reference's L1 data layer (`create_dataset.py`,
`utils/data_utils*.py`): instead of re-decoding PNGs through a torch
DataLoader every epoch (the reference re-runs its whole loader inside the
epoch loop, `train_baseline_cv.py:154-156`), splits are loaded ONCE into
(N, 128, 128, 5, 1) numpy arrays, normalized, and shipped to device where
they stay resident for the entire run.
"""

from vit3d_ensemble_tpu.data.volumes import (  # noqa: F401
    load_manifest,
    load_volume,
    load_split,
    SplitArrays,
)
from vit3d_ensemble_tpu.data.pipeline import (  # noqa: F401
    build_train_val,
    bootstrap_resample,
    EpochBatcher,
)
from vit3d_ensemble_tpu.data.augment import augment_batch  # noqa: F401
