"""Y4M codec kernels: stream roundtrip, C420 plane walk, frame features."""

import numpy as np
import pytest

from gscap_ray.functions.video import (
    CLIP_H,
    CLIP_W,
    FRAME_STRIDE,
    decode_y4m,
    encode_y4m,
    frame_features,
    synth_frames,
    synth_n_frames,
)


def test_roundtrip_mono():
    f = synth_frames(42)
    got, meta = decode_y4m(encode_y4m(f))
    assert meta["w"] == CLIP_W and meta["h"] == CLIP_H
    assert meta["colorspace"] == "mono" and meta["fps"] == (25, 1)
    assert np.array_equal(got, f)
    assert got.shape[0] == synth_n_frames(42)


def test_roundtrip_420_walks_chroma_planes():
    """C420 frames carry 1.5x the luma bytes; the parser must step over
    the chroma planes to find the next FRAME marker."""
    f = synth_frames(7, n_frames=5)
    got, meta = decode_y4m(encode_y4m(f, fps=(30, 1), colorspace="420"))
    assert meta["colorspace"] == "420jpeg" and meta["fps"] == (30, 1)
    assert np.array_equal(got, f)


def test_rejects_bad_streams():
    with pytest.raises(ValueError):
        decode_y4m(b"not a y4m stream\n")
    good = encode_y4m(synth_frames(1, n_frames=3))
    with pytest.raises(ValueError):
        decode_y4m(good[:-10])  # truncated final frame
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + b"\x00" * 48)
    with pytest.raises(ValueError):
        # frame payload followed by garbage instead of a FRAME marker
        decode_y4m(good + b"JUNK\n")


def test_features_match_naive():
    f = synth_frames(99)
    st = frame_features(f)
    n = f.shape[0]
    idx = list(range(0, n, FRAME_STRIDE))
    assert list(st["frame"]) == idx
    assert set(st["n_frames"]) == {n}
    prev = None
    for k, fi in enumerate(idx):
        plane = f[fi].astype(np.int64)
        assert st["luma_sum"][k] == plane.sum()
        assert st["luma_min"][k] == plane.min()
        assert st["luma_max"][k] == plane.max()
        want = 0 if prev is None else int(np.abs(plane - prev).sum())
        assert st["motion"][k] == want
        prev = plane
