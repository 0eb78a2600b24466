"""Native C++ image decoder vs PIL reference (io/native/image_loader.cpp)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np
import pytest
from PIL import Image

from tpu_splat.io import native_loader


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "test.png")
    Image.fromarray(arr).save(d / "test.jpg", quality=95)
    return d, arr


def test_native_available():
    assert native_loader.available(), "native loader failed to build"


def test_png_decode_exact(images):
    d, arr = images
    out = native_loader.load_image_native(str(d / "test.png"))
    assert out.shape == (3, 96, 128)
    expect = arr.astype(np.float32).transpose(2, 0, 1) / 255.0
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_jpeg_decode_close_to_pil(images):
    d, _ = images
    out = native_loader.load_image_native(str(d / "test.jpg"))
    with Image.open(d / "test.jpg") as im:
        pil = np.asarray(im.convert("RGB"), np.float32).transpose(2, 0, 1) / 255.0
    assert out.shape == pil.shape
    # decoders may differ by small IDCT rounding
    assert np.abs(out - pil).mean() < 0.02


def test_resize_factor_box(images):
    d, arr = images
    out = native_loader.load_image_native(str(d / "test.png"), resize_factor=2)
    assert out.shape == (3, 48, 64)
    # 2x2 box average matches
    a = arr.astype(np.float32)
    box = (a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]) / 4.0
    expect = np.floor(box).astype(np.float32).transpose(2, 0, 1) / 255.0
    np.testing.assert_allclose(out, expect, atol=1.5 / 255.0)


def test_max_width_cap(images):
    d, _ = images
    out = native_loader.load_image_native(str(d / "test.png"), max_width=64)
    assert out.shape[2] == 64 and out.shape[1] == 48


def test_load_image_dispatch(images):
    from tpu_splat.io.image import load_image

    d, arr = images
    out = load_image(str(d / "test.png"))
    expect = arr.astype(np.float32).transpose(2, 0, 1) / 255.0
    np.testing.assert_allclose(out, expect, atol=1e-6)
