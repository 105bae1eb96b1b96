"""Pure-numpy audio kernels for multimodal binary columns.

The container ships no audio codecs, but WAV (RIFF/WAVE, PCM16) is a
self-describing container — so the decode / feature-extract path here is
REAL (bytes -> RIFF chunk walk -> int16 sample array -> features), not a
stub; only compressed codecs (MP3/OGG/FLAC) remain behind the
NotImplementedError gate in stages/multimodal.py.

Deterministic synthetic clips: sample(i) of clip c is integer arithmetic
on (c, i), so every feature below is replicable in oracle SQL
(the audio_features query). All features are INTEGERS (energy = sum of
squared samples, zero crossings, peak, duration in ms) — zero
float-parity risk between numpy and DuckDB.
"""

from __future__ import annotations

import struct

import numpy as np

CLIP_N = 2048     # samples per synthetic clip
CLIP_SR = 8000    # sample rate (Hz)


def synth_samples(clip_id: int, n: int = CLIP_N) -> np.ndarray:
    """int16 deterministic PCM: ((id*7919 + i*i*31 + i*57) % 65536) - 32768."""
    i = np.arange(n, dtype=np.int64)
    return (((int(clip_id) * 7919 + i * i * 31 + i * 57) % 65536)
            - 32768).astype(np.int16)


def encode_wav(samples: np.ndarray, sr: int = CLIP_SR) -> bytes:
    """int16 mono samples -> canonical RIFF/WAVE PCM16 bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)  # PCM, mono, 16-bit
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> (int16 sample array, sample rate).
    Real parsing: validates the RIFF/WAVE magic and walks the chunk list
    (fmt / data in any order, unknown chunks skipped with padding), per
    the RIFF spec."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sr = None
    channels = bits = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > len(data):
            # truncated chunk body: fail loudly like decode_png/decode_y4m
            # do — a silent partial read returns wrong features
            raise ValueError(
                f"truncated {cid!r} chunk: declares {size} bytes, "
                f"{len(data) - pos - 8} remain")
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sr, _br, _ba, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise NotImplementedError(
                    "compressed WAV (non-PCM) needs a codec, not present "
                    "in this environment")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    if channels != 1 or bits != 16:
        raise NotImplementedError("only PCM16 mono is implemented")
    return samples.astype(np.int16), int(sr)


def clip_features(samples: np.ndarray, sr: int) -> dict:
    """Integer clip features: length, duration (ms, floor), energy
    (sum of squared samples), peak |amplitude|, zero crossings (sign of
    0 counts as non-negative)."""
    v = samples.astype(np.int64)
    neg = v < 0
    return {
        "n_samples": int(v.shape[0]),
        "duration_ms": int(v.shape[0] * 1000 // sr),
        "energy": int((v * v).sum()),
        "peak": int(np.abs(v).max(initial=0)),
        "zero_crossings": int(np.count_nonzero(neg[1:] != neg[:-1])),
    }
