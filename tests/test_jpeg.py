"""Baseline JPEG codec (functions/jpeg.py): the entropy layer must be
LOSSLESS (decoded quantized coefficients == the encoder's own
quantized_blocks output, byte-exact) and the transform layer must be
deterministic (decode(encode(img)) == the transform-only reference
reconstruction with no Huffman involved). Together the two pin the whole
codec without any external reference decoder."""

import numpy as np
import pytest

from gscap_ray.functions.jpeg import (
    DEFAULT_Q,
    decode_jpeg,
    decode_jpeg_coeffs,
    dequantize_blocks,
    encode_jpeg,
    quantized_blocks,
)


def _transform_reference(img: np.ndarray, q: int = DEFAULT_Q) -> np.ndarray:
    """Reference reconstruction using ONLY the transform layer."""
    if img.ndim == 2:
        return dequantize_blocks(quantized_blocks(img, q), q,
                                 img.shape[0], img.shape[1])
    return np.stack([
        dequantize_blocks(quantized_blocks(img[:, :, c], q), q,
                          img.shape[0], img.shape[1])
        for c in range(3)], axis=-1)


def test_entropy_layer_lossless_grayscale():
    rng = np.random.default_rng(42)
    for shape in [(8, 8), (16, 16), (24, 17), (9, 31), (64, 64)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        h, w, coeffs, tables = decode_jpeg_coeffs(encode_jpeg(img))
        assert (h, w) == shape
        assert len(coeffs) == 1
        assert np.array_equal(coeffs[0], quantized_blocks(img, DEFAULT_Q))
        assert np.all(tables[0] == DEFAULT_Q)


def test_entropy_layer_lossless_rgb():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    h, w, coeffs, _tables = decode_jpeg_coeffs(encode_jpeg(img))
    assert (h, w) == (17, 23)
    assert len(coeffs) == 3
    for c in range(3):
        assert np.array_equal(coeffs[c], quantized_blocks(img[:, :, c]))


def test_pixel_layer_matches_transform_reference():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (40, 33), dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(gray)),
                          _transform_reference(gray))
    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, _transform_reference(rgb))


def test_lossy_error_is_bounded():
    """Flat quant table 13 bounds per-coefficient error; smooth images
    reconstruct within a small pixel error (sanity that the transform is a
    DCT, not garbage that happens to roundtrip)."""
    x = np.arange(32)[None, :] * 4
    y = np.arange(32)[:, None] * 3
    img = ((x + y) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 40  # lossy, but recognizably the same image
    assert err.mean() < 10


def test_flat_blocks_closed_form_dc():
    """8x8-flat blocks: quantized DC = round_even((c-128)*8/13), all ACs
    zero, DC DPCM across blocks decoded correctly — the integer contract
    the jpeg_dc_stats SQL oracle recomputes."""
    colors = np.array([[77, 200], [0, 255]])
    img = np.repeat(np.repeat(colors, 8, axis=0), 8, axis=1).astype(np.uint8)
    _h, _w, (co,), _t = decode_jpeg_coeffs(encode_jpeg(img))
    assert co.shape == (4, 64)
    for b, c in enumerate([77, 200, 0, 255]):  # row-major block order
        # float64 division then half-even round, same op order as the SQL
        assert co[b, 0] == np.round((c - 128) * 8.0 / 13.0)
        assert (co[b, 1:] == 0).all()
    dec = decode_jpeg(encode_jpeg(img))
    # each decoded block is flat at the dequantized DC value
    for (bi, bj), c in zip([(0, 0), (0, 1), (1, 0), (1, 1)],
                           [77, 200, 0, 255]):
        blk = dec[bi * 8:(bi + 1) * 8, bj * 8:(bj + 1) * 8]
        assert (blk == blk[0, 0]).all()
        expect = np.clip(np.round(
            np.round((c - 128) * 8.0 / 13.0) * 13.0 / 8.0) + 128, 0, 255)
        assert blk[0, 0] == expect


def test_byte_stuffing_roundtrip():
    """Images chosen to produce 0xFF bytes in the entropy stream must
    unstuff correctly (any mismatch would desync every later block)."""
    rng = np.random.default_rng(11)
    for seed in range(5):
        img = np.random.default_rng(seed).integers(0, 256, (32, 32),
                                                   dtype=np.uint8)
        data = encode_jpeg(img)
        if b"\xff\x00" in data:
            break
    else:
        pytest.skip("no stuffed byte produced")  # pragma: no cover
    _h, _w, (co,), _t = decode_jpeg_coeffs(data)
    assert np.array_equal(co, quantized_blocks(img))


def test_unsupported_features_raise():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_decode_image_dispatches_jpeg():
    from gscap_ray.functions.images import decode_image

    img = np.random.default_rng(5).integers(0, 256, (16, 16, 3),
                                            dtype=np.uint8)
    out = decode_image(encode_jpeg(img))
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, _transform_reference(img))
