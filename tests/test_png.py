"""PNG codec kernels: roundtrips, filter branches, CRC/format guards."""

import struct
import zlib

import numpy as np
import pytest

from gscap_ray.functions.images import decode_image
from gscap_ray.functions.png import decode_png, encode_png


def test_roundtrip_all_color_types_and_filters():
    rng = np.random.default_rng(3)
    for c in (1, 2, 3, 4):
        for fm in (0, 1, 2, 3, 4, "mixed"):
            img = rng.integers(0, 256, (12, 16, c), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(img, fm)), img), \
                (c, fm)


def test_grayscale_2d_input():
    g = np.arange(35, dtype=np.uint8).reshape(7, 5)
    assert np.array_equal(decode_png(encode_png(g)), g[:, :, None])


def test_crc_corruption_detected():
    img = np.zeros((4, 4, 3), np.uint8)
    data = bytearray(encode_png(img))
    idat = bytes(data).index(b"IDAT")
    data[idat + 6] ^= 0xFF  # flip a byte inside the IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_format_guards():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")
    # 16-bit depth and Adam7 interlace raise NotImplementedError
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    deep = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(deep)
    adam = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1))
    with pytest.raises(NotImplementedError, match="interlac"):
        decode_png(adam)
    # truncated IDAT payload (wrong inflated size)
    short = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)) \
        + chunk(b"IDAT", zlib.compress(b"\x00" * 5)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="size"):
        decode_png(short)


def test_decode_image_dispatch():
    from gscap_ray.functions.images import encode_ppm, synth_pixels

    img = synth_pixels(9)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_png(img)), img)
    # JPEG is a real decode path since late r4 (functions/jpeg.py);
    # malformed JPEG bytes still fail loudly
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0junk")
    with pytest.raises(ValueError):
        decode_image(b"GIF89a...")
