"""Pure-numpy video kernels for multimodal binary columns.

The container ships no video codecs, but Y4M (YUV4MPEG2) is a
self-describing UNCOMPRESSED container — plain-text stream header, then
``FRAME\\n`` + raw planes per frame — so the decode / frame-sample /
feature-extract path here is REAL (bytes -> header parse -> plane walk ->
uint8 frame arrays -> integer features), not a stub; only compressed
codecs (H.264/VP9/AV1) remain behind the NotImplementedError gate in
stages/multimodal.py.  This closes the video leg of the multimodal triad
the same way functions/images.py (PPM) did for images and
functions/audio.py (RIFF/WAVE PCM16) did for audio.

Deterministic synthetic clips: luma sample (doc, frame, pixel) is integer
arithmetic on the triple, so every feature below is replicable in oracle
SQL (the video_frames query). All features are INTEGERS (per-frame luma
sum/min/max, motion = sum of absolute luma diffs vs the previous SAMPLED
frame) — zero float-parity risk between numpy and DuckDB.
"""

from __future__ import annotations

import numpy as np

CLIP_W = 16       # frame width
CLIP_H = 12       # frame height
FRAME_STRIDE = 3  # sample every 3rd frame (0, 3, 6, ...)


def synth_n_frames(clip_id: int) -> int:
    """Deterministic clip length: 8..12 frames."""
    return 8 + int(clip_id) % 5


def synth_frames(clip_id: int, n_frames: int | None = None,
                 w: int = CLIP_W, h: int = CLIP_H) -> np.ndarray:
    """(n, h, w) uint8 luma frames:
    y = (clip_id*131 + frame*101 + pixel*7 + 23) % 256, pixel row-major."""
    if n_frames is None:
        n_frames = synth_n_frames(clip_id)
    f = np.arange(n_frames, dtype=np.int64)[:, None]
    p = np.arange(w * h, dtype=np.int64)[None, :]
    y = (int(clip_id) * 131 + f * 101 + p * 7 + 23) % 256
    return y.astype(np.uint8).reshape(n_frames, h, w)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               colorspace: str = "mono") -> bytes:
    """(n, h, w) uint8 luma frames -> canonical YUV4MPEG2 bytes.

    ``mono``: Y plane only (Cmono). ``420``: C420jpeg with deterministic
    flat chroma (128) — exercises the multi-plane parse path. Any other
    colorspace raises (it would silently emit a C420jpeg stream the
    caller didn't ask for), and 420 requires even dimensions (its own
    decoder rejects odd-dimension C420 streams)."""
    if colorspace not in ("mono", "420"):
        raise NotImplementedError(
            f"colorspace {colorspace!r}: only mono and 420 are encoded")
    n, h, w = frames.shape
    if colorspace == "420" and (h % 2 or w % 2):
        raise ValueError("C420 requires even dimensions")
    header = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
              f"C{'mono' if colorspace == 'mono' else '420jpeg'}\n")
    parts = [header.encode("ascii")]
    if colorspace == "mono":
        chroma = b""
    else:
        chroma = np.full((h // 2) * (w // 2) * 2, 128, np.uint8).tobytes()
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(frames[i], dtype=np.uint8).tobytes())
        parts.append(chroma)
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[np.ndarray, dict]:
    """YUV4MPEG2 bytes -> ((n, h, w) uint8 luma frames, stream params).

    Real parsing per the mjpegtools y4m spec: the stream header is
    ``YUV4MPEG2`` + space-separated tagged params terminated by ``\\n``;
    each frame is ``FRAME`` (+ optional frame params) + ``\\n`` + raw
    planes. Cmono and C420* are implemented (4:2:0 chroma planes are
    walked and discarded — features are luma-only); other colorspaces and
    compressed payloads raise NotImplementedError."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    cs = "420jpeg"  # spec default when no C tag is present
    for tag in data[9:nl].split():
        t, v = tag[:1], tag[1:]
        if t == b"W":
            w = int(v)
        elif t == b"H":
            h = int(v)
        elif t == b"F":
            num, den = v.split(b":")
            fps = (int(num), int(den))
        elif t == b"C":
            cs = v.decode("ascii")
        # I (interlacing), A (aspect), X (extensions) don't affect planes
    if not w or not h:
        raise ValueError("missing W/H in stream header")
    if cs == "mono":
        frame_bytes = w * h
    elif cs.startswith("420"):
        if w % 2 or h % 2:
            raise ValueError("C420 requires even dimensions")
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise NotImplementedError(
            f"colorspace {cs!r} needs a subsampling kernel not implemented "
            "here (only Cmono / C420* luma extraction is)")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        body = data[fnl + 1: fnl + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise ValueError("truncated frame payload")
        frames.append(np.frombuffer(body[: w * h], np.uint8).reshape(h, w))
        pos = fnl + 1 + frame_bytes
    return (np.stack(frames) if frames
            else np.empty((0, h, w), np.uint8)), \
        {"w": w, "h": h, "fps": fps, "colorspace": cs}


def frame_features(frames: np.ndarray,
                   stride: int = FRAME_STRIDE) -> dict[str, np.ndarray]:
    """Sample every ``stride``-th frame and compute integer per-frame
    features; ``motion`` is the sum of absolute luma differences vs the
    PREVIOUS SAMPLED frame (0 for the first sample). Vectorized over the
    sampled-frame axis — no per-pixel Python."""
    n = frames.shape[0]
    idx = np.arange(0, n, stride, dtype=np.int64)
    s = frames[idx].astype(np.int64).reshape(idx.shape[0], -1)
    motion = np.zeros(idx.shape[0], dtype=np.int64)
    if idx.shape[0] > 1:
        motion[1:] = np.abs(s[1:] - s[:-1]).sum(axis=1)
    return {
        "frame": idx,
        "n_frames": np.full(idx.shape[0], n, dtype=np.int64),
        "luma_sum": s.sum(axis=1),
        "luma_min": s.min(axis=1, initial=255),
        "luma_max": s.max(axis=1, initial=0),
        "motion": motion,
    }
