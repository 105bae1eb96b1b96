"""Multimodal column stages: opaque binary payloads (image/audio/video)
with typed metadata, processed by actor-pool ``map_batches`` stages.

Decode paths that need no external codec are REAL: PPM, PNG and baseline
JPEG images (ImageFeaturizer — PNG via stdlib zlib + numpy unfiltering,
JPEG via the from-spec codec in functions/jpeg.py; JpegDcExtractor exposes
the entropy layer's quantized DC coefficients for integer-exact oracles),
PCM16 WAV audio (AudioFeaturizer), Y4M video with frame sampling
(VideoFeaturizer). Only codecs that cannot be verified offline stay
environment-gated behind NotImplementedError (MP3/OGG/FLAC,
H.264/VP9/AV1), and the generic BinaryFeatureExtractor keeps a
deterministic payload-hash stub for the plug-a-model path. Everything Ray-side is real and tested: schema handling
for binary columns, actor-pool signature, batch sizing for large payloads,
zero-copy pass-through of the bytes, and the output layouts.

Pattern notes for 100 TB:
- binary payloads make blocks heavy -> these stages run with a small
  explicit ``batch_size`` and the payload column is dropped as soon as the
  features are extracted (project-early);
- models/codecs load once per actor in ``__init__`` (never per batch);
- feature outputs are fixed-size ``list<float32>`` so downstream ANN /
  dedup stages consume them zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class BinaryFeatureExtractor:
    """Actor-pool stage: binary payload column -> fixed-size float32
    feature vector + metadata columns.

    ``mode='stub'`` produces deterministic pseudo-features from the payload
    hash (testable end-to-end); ``mode='real'`` raises NotImplementedError
    where a codec/model call would go (PIL/librosa/decord are not available
    in this environment)."""

    def __init__(self, payload_col: str = "html", dim: int = 16,
                 mode: str = "stub", drop_payload: bool = True):
        self.payload_col = payload_col
        self.dim = int(dim)
        self.mode = mode
        self.drop_payload = drop_payload
        # real path: load the model/codec ONCE per actor here, e.g.
        #   self.model = onnxruntime.InferenceSession(...)

    def _decode(self, payloads: list[bytes | None]) -> np.ndarray:
        if self.mode != "stub":
            raise NotImplementedError(
                "real decode requires an image/audio codec, not present in "
                "this environment; plug a codec call here")
        import hashlib

        n = len(payloads)
        sizes = np.array([len(p) if p is not None else 0 for p in payloads],
                         dtype=np.int64)
        # md5-based payload hash (DuckDB md5_number_lower-compatible) so the
        # stub features are oracle-checkable end to end
        h = np.array([int.from_bytes(hashlib.md5(p or b"").digest()[8:], "little")
                      for p in payloads], dtype=np.uint64)
        # deterministic pseudo-features: nibble expansion of the hash
        shifts = (np.arange(self.dim, dtype=np.uint64) * np.uint64(4)) % np.uint64(64)
        feats = ((h[:, None] >> shifts[None, :]) & np.uint64(0xF)).astype(np.float32) / 15.0
        feats[:, 0] = np.log1p(sizes).astype(np.float32)  # size feature
        return feats

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        feats = self._decode(payloads)
        sizes = pa.array([len(p) if p is not None else 0 for p in payloads],
                         pa.int64())
        out = batch
        if self.drop_payload:
            out = out.drop_columns([self.payload_col])
        return (out
                .append_column("payload_bytes", sizes)
                .append_column("features",
                               pa.FixedSizeListArray.from_arrays(
                                   pa.array(feats.ravel(), pa.float32()), self.dim)))


class ImageFeaturizer:
    """Actor-pool stage with REAL decode paths: binary PPM, PNG or
    baseline JPEG payloads -> decode (pure-numpy P6 parser; stdlib-zlib +
    numpy unfiltering PNG decoder, functions/png.py; from-spec baseline
    JPEG decoder, functions/jpeg.py) -> optional bilinear resize ->
    per-channel statistics columns. No stub: none of the three formats
    needs an external codec."""

    def __init__(self, payload_col: str = "image", resize_to: int | None = None,
                 drop_payload: bool = True):
        from ..functions import images

        self.payload_col = payload_col
        self.resize_to = resize_to
        self.drop_payload = drop_payload
        self._img = images  # module bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        cols: dict[str, list] = {"r_mean": [], "g_mean": [], "b_mean": [],
                                 "px_min": [], "px_max": []}
        for p in payloads:
            img = self._img.decode_image(p)
            if self.resize_to:
                img = self._img.resize_bilinear(img, self.resize_to, self.resize_to)
            st = self._img.channel_stats(img)
            for k in cols:
                cols[k].append(st[k])
        out = batch.drop_columns([self.payload_col]) if self.drop_payload else batch
        return (out
                .append_column("r_mean", pa.array(cols["r_mean"], pa.float64()))
                .append_column("g_mean", pa.array(cols["g_mean"], pa.float64()))
                .append_column("b_mean", pa.array(cols["b_mean"], pa.float64()))
                .append_column("px_min", pa.array(cols["px_min"], pa.int64()))
                .append_column("px_max", pa.array(cols["px_max"], pa.int64())))


class JpegDcExtractor:
    """Actor-pool stage over binary JPEG payloads: entropy-decode only
    (marker walk + canonical Huffman + DC DPCM, functions/jpeg.py) and
    emit integer statistics of the first component's quantized DC
    coefficients. No IDCT runs — this is the byte-verifiable half of the
    codec, and the jpeg_dc_stats query oracles it in closed-form integer
    SQL (flat 8x8 blocks make each DC = round_even((c-128)*8/q))."""

    def __init__(self, payload_col: str = "image", drop_payload: bool = True):
        from ..functions import jpeg

        self.payload_col = payload_col
        self.drop_payload = drop_payload
        self._jpeg = jpeg  # module bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        cols: dict[str, list[int]] = {k: [] for k in (
            "width", "height", "n_blocks", "dc_sum", "dc_min", "dc_max")}
        for p in payloads:
            h, w, coeffs, _tables = self._jpeg.decode_jpeg_coeffs(p)
            dc = coeffs[0][:, 0].astype(np.int64)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_blocks"].append(dc.shape[0])
            cols["dc_sum"].append(int(dc.sum()))
            cols["dc_min"].append(int(dc.min()))
            cols["dc_max"].append(int(dc.max()))
        out = batch.drop_columns([self.payload_col]) if self.drop_payload \
            else batch
        for k, v in cols.items():
            out = out.append_column(k, pa.array(v, pa.int64()))
        return out


class AudioFeaturizer:
    """Actor-pool stage with a REAL decode path: binary WAV payloads ->
    RIFF chunk walk (pure numpy/struct, functions/audio.py) -> integer
    clip features. No stub: PCM16 WAV needs no codec. Compressed audio
    (MP3/OGG/FLAC) would slot into the same signature behind the existing
    NotImplementedError gate."""

    def __init__(self, payload_col: str = "audio", drop_payload: bool = True):
        from ..functions import audio

        self.payload_col = payload_col
        self.drop_payload = drop_payload
        self._audio = audio  # module bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        cols: dict[str, list] = {"n_samples": [], "duration_ms": [],
                                 "energy": [], "peak": [],
                                 "zero_crossings": []}
        for p in payloads:
            samples, sr = self._audio.decode_wav(p)
            st = self._audio.clip_features(samples, sr)
            for k in cols:
                cols[k].append(st[k])
        out = batch.drop_columns([self.payload_col]) if self.drop_payload \
            else batch
        for k in ("n_samples", "duration_ms", "energy", "peak",
                  "zero_crossings"):
            out = out.append_column(k, pa.array(cols[k], pa.int64()))
        return out


class VideoFeaturizer:
    """Actor-pool stage with a REAL decode path: binary Y4M (YUV4MPEG2)
    payloads -> stream-header + plane walk (pure numpy, functions/video.py)
    -> every-k-th-frame sampling -> integer per-frame feature ROWS (one
    input row expands to one row per sampled frame, ids preserved). No
    stub: Y4M is uncompressed and needs no codec. Compressed video
    (H.264/VP9/AV1) would slot into the same signature behind the
    NotImplementedError gate in functions/video.decode_y4m."""

    def __init__(self, payload_col: str = "video", id_col: str = "doc_id",
                 stride: int | None = None):
        from ..functions import video

        self.payload_col = payload_col
        self.id_col = id_col
        self.stride = int(stride) if stride else video.FRAME_STRIDE
        self._video = video  # module bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        ids = batch[self.id_col].to_numpy()
        out_ids: list[np.ndarray] = []
        feats: dict[str, list[np.ndarray]] = {
            k: [] for k in ("frame", "n_frames", "luma_sum", "luma_min",
                            "luma_max", "motion")}
        for rid, p in zip(ids, payloads):
            frames, _meta = self._video.decode_y4m(p)
            st = self._video.frame_features(frames, self.stride)
            out_ids.append(np.full(st["frame"].shape[0], rid, np.int64))
            for k in feats:
                feats[k].append(st[k])
        cols = {self.id_col: pa.array(
            np.concatenate(out_ids) if out_ids else
            np.empty(0, np.int64), pa.int64())}
        for k in feats:
            cols[k] = pa.array(
                np.concatenate(feats[k]) if feats[k] else
                np.empty(0, np.int64), pa.int64())
        return pa.table(cols)


class FrameSampler:
    """Actor-pool stage: arbitrary binary payload -> k deterministic frame
    offsets + per-frame feature rows (flat_map-style row expansion inside
    map_batches). Decode is the payload-hash stub (this stage demos the
    row-expansion plumbing over payloads with NO parseable container, e.g.
    raw html); the REAL video decode + frame sampling path is
    :class:`VideoFeaturizer` above."""

    def __init__(self, payload_col: str = "html", k: int = 4, dim: int = 8):
        self.payload_col = payload_col
        self.k = int(k)
        self.dim = int(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..synth import hash64

        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        h = hash64(np.array([p or b"" for p in payloads], dtype=object))
        urls = batch["url"].to_numpy(zero_copy_only=False)
        # k frames per payload at deterministic offsets
        frame = np.tile(np.arange(self.k), n)
        rep_h = np.repeat(h, self.k)
        rep_url = np.repeat(urls, self.k)
        shifts = (np.arange(self.dim, dtype=np.uint64) * np.uint64(5)) % np.uint64(64)
        mixed = rep_h ^ (frame.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        feats = ((mixed[:, None] >> shifts[None, :]) & np.uint64(0x1F)).astype(np.float32) / 31.0
        return pa.table({
            "url": pa.array(rep_url, pa.string()),
            "frame": pa.array(frame, pa.int32()),
            "frame_features": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), pa.float32()), self.dim),
        })
