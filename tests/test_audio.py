"""WAV codec kernels: RIFF roundtrip, chunk-walk robustness, features."""

import struct

import numpy as np
import pytest

from gscap_ray.functions.audio import (
    CLIP_SR,
    clip_features,
    decode_wav,
    encode_wav,
    synth_samples,
)


def test_roundtrip():
    s = synth_samples(42)
    got, sr = decode_wav(encode_wav(s))
    assert sr == CLIP_SR
    assert np.array_equal(got, s)


def test_chunk_walk_skips_unknown_and_handles_order():
    """Real RIFF parsing: unknown chunks (odd-sized, word-padded) are
    skipped and fmt/data order does not matter."""
    s = synth_samples(7, n=33)
    data = np.ascontiguousarray(s, dtype="<i2").tobytes()  # 66 B, even
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"xyz"  # odd size 3 -> 1 pad byte (word alignment)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"
            + b"data" + struct.pack("<I", len(data)) + data
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    got, sr = decode_wav(wav)
    assert sr == 8000 and np.array_equal(got, s)


def test_rejects_non_wav_and_compressed():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    s = synth_samples(1, n=4)
    bad = bytearray(encode_wav(s))
    off = bad.index(b"fmt ") + 8
    struct.pack_into("<H", bad, off, 85)  # audio_fmt = MP3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad))


def test_features_match_naive():
    s = synth_samples(99)
    st = clip_features(s, CLIP_SR)
    v = s.astype(np.int64)
    assert st["n_samples"] == 2048
    assert st["duration_ms"] == 2048 * 1000 // CLIP_SR
    assert st["energy"] == int(sum(int(x) * int(x) for x in v))
    assert st["peak"] == int(max(abs(int(x)) for x in v))
    zc = sum(1 for a, b in zip(v[:-1], v[1:]) if (a < 0) != (b < 0))
    assert st["zero_crossings"] == zc
