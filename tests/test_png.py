import numpy as np
import pytest

from humid_ray.png import (
    decode_fjpg,
    decode_image,
    decode_png,
    encode_fjpg,
    encode_png,
    psnr,
)


@pytest.mark.parametrize("shape", [(32, 32), (32, 32, 3), (17, 23), (40, 40, 3)])
def test_png_roundtrip_lossless(shape):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@pytest.mark.parametrize("shape", [(32, 32), (32, 32, 3), (17, 23)])
def test_fjpg_lossy_above_40db(shape):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_fjpg(encode_fjpg(img))
    assert dec.shape == img.shape
    assert psnr(img, dec) >= 40.0  # the per-row invariant bound


def test_decode_dispatch_and_junk():
    img = np.zeros((8, 8), dtype=np.uint8)
    assert decode_image(encode_png(img)).shape == (8, 8)
    assert decode_image(encode_fjpg(img)).shape == (8, 8)
    for junk in (b"", b"JUNKJUNKJUNK", b"\x89PNG\r\n\x1a\n_truncated"):
        with pytest.raises(ValueError):
            decode_image(junk)


def test_psnr_identity():
    img = np.full((4, 4), 7, dtype=np.uint8)
    assert psnr(img, img) == float("inf")
