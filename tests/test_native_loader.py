"""Native C++ PNG decoder tests: parity with PIL, fallback behavior."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    arrays = []
    for i in range(6):
        a = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
        Image.fromarray(a).save(d / f"1-{i + 1:02d}.png")
        arrays.append(a)
    return d, arrays


def test_native_build_and_decode_parity(png_dir):
    from vit3d_ensemble_tpu.data.native_loader import (
        decode_batch,
        load_library,
    )

    if load_library() is None:
        pytest.skip("native toolchain unavailable")
    d, arrays = png_dir
    paths = [str(d / f"1-{i + 1:02d}.png") for i in range(6)]
    out = decode_batch(paths, 32)
    assert out is not None and out.shape == (6, 32, 32)
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_native_rejects_wrong_size(png_dir):
    from vit3d_ensemble_tpu.data.native_loader import (
        decode_batch,
        load_library,
    )

    if load_library() is None:
        pytest.skip("native toolchain unavailable")
    d, _ = png_dir
    assert decode_batch([str(d / "1-01.png")], 64) is None


def test_native_missing_file_falls_back(png_dir):
    from vit3d_ensemble_tpu.data.native_loader import decode_batch

    d, _ = png_dir
    assert decode_batch([str(d / "nope.png")], 32) is None


def test_patient_stack_uses_native(png_dir, tmp_path, monkeypatch):
    """_patient_stack output is identical with and without the native path."""
    from PIL import Image

    from vit3d_ensemble_tpu.data import volumes

    root = tmp_path / "ds"
    folder = root / "P-0001" / "original"
    folder.mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(1, 7):
        Image.fromarray(rng.integers(0, 256, (32, 32), dtype=np.uint8)) \
            .save(folder / f"1-{i:02d}.png")

    volumes.clear_volume_cache()
    native, names_n = volumes._patient_stack(str(root), "P-0001",
                                             "original", 32)
    volumes.clear_volume_cache()
    monkeypatch.setenv("VIT3D_NATIVE", "0")
    from vit3d_ensemble_tpu.data import native_loader

    native_loader.load_library.cache_clear()
    pil, names_p = volumes._patient_stack(str(root), "P-0001",
                                          "original", 32)
    native_loader.load_library.cache_clear()
    np.testing.assert_array_equal(native, pil)
    assert names_n == names_p
