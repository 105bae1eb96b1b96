"""Pure-numpy image kernels for multimodal binary columns.

The container ships no image codecs, but PPM (P6) is a trivial
self-describing format, PNG is exactly decodable with stdlib zlib
(functions/png.py), and baseline JPEG is implemented from the spec in
functions/jpeg.py (canonical-Huffman entropy layer byte-verified, DCT
transform layer pinned by transform-reference tests) — all three decode /
resize / feature-extract paths are REAL (bytes -> pixels -> features).

Deterministic synthetic images: pixel(x, y, ch) is integer arithmetic on
(img_id, x, y, ch), so per-channel statistics are replicable in oracle SQL
(the image_features query).
"""

from __future__ import annotations

import numpy as np

IMG_W = 16
IMG_H = 16


def synth_pixels(img_id: int, w: int = IMG_W, h: int = IMG_H) -> np.ndarray:
    """(h, w, 3) uint8 deterministic image: (id*31 + x*7 + y*13 + ch*101) % 256."""
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    ch = np.arange(3, dtype=np.int64)[None, None, :]
    return ((int(img_id) * 31 + x * 7 + y * 13 + ch * 101) % 256).astype(np.uint8)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (h, w, 3) -> binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> uint8 (h, w, 3). Real parsing: header tokens
    (whitespace/comment-delimited per the PPM spec), then the raster."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


def decode_image(data: bytes) -> np.ndarray:
    """Magic-sniffing decode: P6 PPM, 8-bit PNG and baseline JPEG are ALL
    real decode paths (PNG via functions/png.py — stdlib zlib + numpy
    unfiltering; JPEG via functions/jpeg.py — full marker walk, canonical
    Huffman, DPCM/zigzag, dequant + IDCT). Returns uint8 (h, w[, c])."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        return decode_png(data)
    if data[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    raise ValueError("unrecognized image format")


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Canonicalize any decode_image output to (h, w, 3) uint8.

    decode_image legitimately returns (h, w) grayscale (JPEG luma-only),
    (h, w, 1), (h, w, 2) gray+alpha and (h, w, 4) RGBA (PNG color types)
    — the RGB-assuming kernels crashed on the first three and silently
    interleaved RGBA bytes across channels on the fourth. Gray replicates
    to three channels; alpha is dropped."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if c == 4:  # RGBA
        return img[:, :, :3]
    if c == 3:
        return img
    raise ValueError(f"unsupported channel count {c}")


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """uint8 (h, w[, c]) -> (out_h, out_w, 3), bilinear, vectorized.
    Non-RGB inputs are canonicalized via :func:`to_rgb`."""
    img = to_rgb(img)
    h, w, c = img.shape
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0, 1)[:, None, None]
    wx = np.clip(fx - x0, 0, 1)[None, :, None]
    im = img.astype(np.float64)
    top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
    bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
    return np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)


def channel_stats(img: np.ndarray) -> dict[str, float | int]:
    """Per-channel mean (4 dp, exact: pixel sums are integers and the
    divisor is a power of two for the 16x16 synthetic size) + global
    min/max. Non-RGB inputs are canonicalized via :func:`to_rgb`
    (min/max are taken AFTER canonicalization, so alpha never leaks in)."""
    img = to_rgb(img)
    sums = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
    n = img.shape[0] * img.shape[1]
    return {
        "r_mean": float(np.round(sums[0] / n, 4)),
        "g_mean": float(np.round(sums[1] / n, 4)),
        "b_mean": float(np.round(sums[2] / n, 4)),
        "px_min": int(img.min()),
        "px_max": int(img.max()),
    }
