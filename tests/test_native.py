"""Native C data-pipeline ops (ctypes, built on demand; PIL fallback)."""

import numpy as np
import pytest
from PIL import Image

from srgd_tpu.train import native


@pytest.fixture(scope='module')
def lib_available():
    if native.get_lib() is None:
        pytest.skip('native toolchain unavailable (PIL fallback in use)')


def test_bicubic_resize_close_to_pil(lib_available):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (128, 96, 3), dtype=np.uint8)
    ours = native.bicubic_resize(img, 32, 24)
    pil = np.asarray(Image.fromarray(img).resize((24, 32), Image.BICUBIC))
    assert ours.shape == pil.shape == (32, 24, 3)
    diff = np.abs(ours.astype(np.int16) - pil.astype(np.int16))
    assert diff.mean() < 1.0 and diff.max() <= 12  # same kernel family,
    # different normalization details


def test_bicubic_upscale(lib_available):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    up = native.bicubic_resize(img, 64, 64)
    assert up.shape == (64, 64, 3)
    # identity-ish: a constant image stays constant
    const = np.full((16, 16, 3), 77, np.uint8)
    up_c = native.bicubic_resize(const, 64, 64)
    assert np.all(up_c == 77)


def test_gaussian_blur(lib_available):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = native.gaussian_blur(img, 2.0)
    # blur reduces variance but keeps the mean
    assert out.std() < img.std()
    assert abs(float(out.mean()) - float(img.mean())) < 2.0
    # sigma 0 is identity
    np.testing.assert_array_equal(native.gaussian_blur(img, 0.0), img)


def test_pipeline_uses_native(lib_available, tmp_path):
    from srgd_tpu.train.data import degrade
    rng = np.random.default_rng(3)
    hr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    out = degrade(hr, 0, rng)  # realsr path exercises blur + resizes
    assert out.shape == hr.shape and out.dtype == np.uint8
