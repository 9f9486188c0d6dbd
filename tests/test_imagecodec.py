import numpy as np
import pytest

from crawler_seo_ray.functions import imagecodec as ic


def _img(seed=0, h=40, w=56):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    px = _img(1)
    out = ic.png_decode(ic.png_encode(px))
    assert np.array_equal(out, px)
    assert ic.psnr(px, out) == float("inf")


def test_fjpg_roundtrip_psnr_over_40db():
    px = _img(2)
    out = ic.fjpg_decode(ic.fjpg_encode(px))
    assert out.shape == px.shape
    assert np.max(np.abs(out.astype(int) - px.astype(int))) <= 2
    assert ic.psnr(px, out) >= 40.0


def test_encode_decode_dispatch_and_unknown_fmt():
    px = _img(3)
    assert np.array_equal(ic.decode_image(ic.encode_image(px, "png"), "png"), px)
    with pytest.raises(NotImplementedError):
        ic.encode_image(px, "webp")


def test_phash_stable_and_robust_to_quantization():
    px = _img(4, 64, 64)
    h1 = ic.phash64(px)
    assert h1 == ic.phash64(px.copy())
    # quantization (lossy stand-in) should barely move the phash
    q = ic.fjpg_decode(ic.fjpg_encode(px))
    d = bin((h1 ^ ic.phash64(q)) & (2**64 - 1)).count("1")
    assert d <= 6
    assert isinstance(h1, int)
    assert -(2**63) <= h1 < 2**63
