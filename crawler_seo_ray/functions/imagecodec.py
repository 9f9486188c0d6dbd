"""Image codecs for the synthetic corpus (no image libraries in this env).

The corpus schema (BASELINE.json input_hint) carries an encoded image
per row: ``bytes:binary, w:int32, h:int32, fmt:string``. Pillow /
libjpeg are NOT available in this container, so:

- ``fmt='png'``  → a real, spec-conformant PNG (8-bit RGB, filter 0,
  zlib), encoded/decoded here in pure numpy+zlib. Lossless.
- ``fmt='jpeg'`` → a clearly-marked deterministic STAND-IN for a lossy
  codec (magic ``FJPG``): pixels quantized to 6 bits/channel and
  zlib-compressed. Quantization error ≤2 per channel → PSNR ≈ 46 dB,
  which satisfies the per-row invariant "decoded-pixel allclose
  (PSNR≥40dB for lossy)" without libjpeg. The Ray-side plumbing
  (binary column, batch sizing, actor decode stage) is identical to
  what a real JPEG codec would need; swap `_fjpg_*` for
  PIL/turbojpeg when available.

All functions are pure and deterministic.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a minimal valid PNG (filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`png_encode` (filter 0, 8-bit RGB)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs are produced/consumed here")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8).reshape(h, w * 3 + 1)
    if not (raw[:, 0] == 0).all():
        raise NotImplementedError("only filter type 0 is supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


def fjpg_encode(pixels: np.ndarray) -> bytes:
    """STUB lossy codec (see module docstring): 6-bit quantized + zlib."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    q = (pixels >> 2).astype(np.uint8)  # 0..63
    return FJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def fjpg_decode(data: bytes) -> np.ndarray:
    if not data.startswith(FJPG_MAGIC):
        raise ValueError("not an FJPG payload")
    w, h = struct.unpack_from(">II", data, 4)
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bucket centre; clip keeps 255 reachable (63 -> 254)
    return np.minimum(q.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "jpeg":
        return fjpg_encode(pixels)
    raise NotImplementedError(f"format {fmt!r} (image libs absent; see module docstring)")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "jpeg":
        return fjpg_decode(data)
    raise NotImplementedError(f"format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


from functools import lru_cache


@lru_cache(maxsize=4096)
def _phash_grid(h: int, w: int):
    # identical values to the original inline linspace — cached per size
    return (
        np.linspace(0, h, 9).astype(np.int64),
        np.linspace(0, w, 9).astype(np.int64),
    )


def phash64(pixels: np.ndarray) -> int:
    """Stable 64-bit perceptual hash: 8x8 mean-pool vs median, row-major bits.

    Signed int64 so it round-trips through Arrow ``int64`` (corpus column
    ``phash`` per BASELINE.json input_hint).
    """
    h, w, _ = pixels.shape
    gray = pixels.astype(np.float64).mean(axis=2)
    # mean-pool onto an 8x8 grid using cumulative sums (works for any h,w >= 8)
    ys, xs = _phash_grid(h, w)
    integral = np.zeros((h + 1, w + 1))
    integral[1:, 1:] = gray.cumsum(0).cumsum(1)
    # vectorized 8x8 box sums from the integral image
    i11 = integral[ys[1:]][:, xs[1:]]
    i00 = integral[ys[:-1]][:, xs[:-1]]
    i01 = integral[ys[:-1]][:, xs[1:]]
    i10 = integral[ys[1:]][:, xs[:-1]]
    areas = np.maximum(np.outer(np.diff(ys), np.diff(xs)), 1)
    cells = (i11 - i01 - i10 + i00) / areas
    med = np.median(cells)
    bits = (cells.reshape(-1) > med).astype(np.uint64)
    val = np.uint64(0)
    for k, b in enumerate(bits):
        val |= b << np.uint64(63 - k)
    return int(val.astype(np.int64))


def ssim_global(a: np.ndarray, b: np.ndarray) -> float:
    """Single-window global SSIM (Wang et al. 2004 with the window equal
    to the whole image) on the mean-channel luma — the structural-verify
    metric for near-dup image pairs. Population moments in float64
    throughout, so the score is bit-reproducible for a given pixel pair
    (pinned by the numpy-replay test). Inputs must share dims — callers
    resize first (see stages.multimodal.PairSSIM)."""
    da, mu_a, va = ssim_moments(a)
    db, mu_b, vb = ssim_moments(b)
    cov = float((da * db).mean())
    return ssim_from_moments(mu_a, mu_b, va, vb, cov)


def ssim_moments(a: np.ndarray) -> tuple[np.ndarray, float, float]:
    """Per-image SSIM inputs — (centered luma, mean, variance) — split
    out so a pair-verify stage can compute them ONCE per image and pay
    only the covariance per pair (bit-identical values: ``ga - mu``
    elementwise equals the centered factor inside the original cov)."""
    ga = a.astype(np.float64).mean(axis=2)
    mu = float(ga.mean())
    va = float(ga.var())
    return ga - mu, mu, va


def ssim_from_moments(
    mu_a: float, mu_b: float, va: float, vb: float, cov: float
) -> float:
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    return ((2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (va + vb + c2)
    )
