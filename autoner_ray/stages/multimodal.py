"""Multimodal columns: opaque binary payloads + typed metadata.

Media (image/audio/video) travels as ``binary`` columns with a
``media_type`` string and typed metadata; decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages.

Codec status (this container ships no PIL/ffmpeg):
- ``image/bmp``: REAL pure-numpy codec (24-bit uncompressed BMP,
  bottom-up rows, 4-byte row padding) — encode + decode + nearest-
  neighbor resize + 8x8 block-mean features, end-to-end.
- ``audio/wav``: REAL pure-python RIFF/PCM16 codec — encode + decode +
  windowed RMS features, end-to-end.
- ``video/*``: STUB. No pure-python video codec is practical; the
  frame-sample plumbing (duration -> frame count -> per-frame feature ->
  mean-pool) is real but the per-frame decode is a seeded deterministic
  fake, clearly marked. Swap ``_fake_features`` for an ffmpeg call in a
  real deployment.

Scale notes: media payloads are large, so these stages use SMALL
``batch_size`` (payload bytes × batch × concurrency must fit the worker
heap), drop the ``payload`` column as soon as features are extracted,
and never pass media through a shuffle — features (small, fixed-width)
shuffle instead.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # image/bmp, audio/wav, video/x-fake
        ("payload", pa.binary()),
        ("width", pa.int32()),  # -1 when unknown / n/a
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64
_WAV_RATE = 2000  # Hz — synthetic fixture keeps payloads small


# -- pure-numpy BMP codec ----------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), np.uint8)
    # BMP stores bottom-up BGR
    bgr = pixels[::-1, :, ::-1]
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB."""
    assert payload[:2] == b"BM", "not a BMP payload"
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    assert bpp == 24 and comp == 0, "only 24-bit uncompressed supported"
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, np.uint8, count=row_size * abs(h), offset=data_off
    ).reshape(abs(h), row_size)
    bgr = rows[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def resize_nearest(pixels: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (h, w) — index-gather, no loops."""
    th, tw = size
    h, w, _ = pixels.shape
    ri = (np.arange(th) * h // th).clip(0, h - 1)
    ci = (np.arange(tw) * w // tw).clip(0, w - 1)
    return pixels[ri][:, ci]


def image_features(pixels: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Resize to 32x32, gray, 8x8 block means -> 64-dim in [0, 1]."""
    small = resize_nearest(pixels, (32, 32)).astype(np.float32)
    gray = small.mean(axis=2)
    blocks = gray.reshape(8, 4, 8, 4).mean(axis=(1, 3))  # (8, 8)
    return (blocks.reshape(-1)[:dim] / 255.0).astype(np.float32)


# -- pure-python WAV (RIFF PCM16 mono) codec ---------------------------------


def encode_wav(samples: np.ndarray, rate: int = _WAV_RATE) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    data = samples.astype("<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono bytes -> (rate, int16 samples)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE", "not WAV"
    off = 12
    rate, samples = None, None
    while off + 8 <= len(payload):
        tag, size = struct.unpack_from("<4sI", payload, off)
        body = payload[off + 8 : off + 8 + size]
        if tag == b"fmt ":
            fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body)
            assert fmt == 1 and ch == 1 and bits == 16, "PCM16 mono only"
        elif tag == b"data":
            samples = np.frombuffer(body, "<i2")
        off += 8 + size + (size & 1)
    assert rate is not None and samples is not None, "missing fmt/data"
    return rate, samples


def audio_features(samples: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Windowed RMS over ``dim`` equal windows, normalized to [0, 1]."""
    x = samples.astype(np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return np.zeros(dim, np.float32)
    edges = (np.arange(dim + 1) * n) // dim
    out = np.zeros(dim, np.float64)
    for i in range(dim):
        seg = x[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt((seg * seg).mean())
    return out.astype(np.float32)


# -- fixture synthesis -------------------------------------------------------


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents -> deterministic media rows: REAL BMP / WAV payloads
    derived from the doc content (fixture for the codec pipeline), plus
    a fake-video row class for the declared-stub path."""
    ids, types, payloads, ws, hs, ds = [], [], [], [], [], []
    for doc_id, text in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        seed = int.from_bytes(
            hashlib.sha256((text or "").encode()).digest()[:8], "little"
        )
        rng = np.random.default_rng(seed)
        kind = ("image/bmp", "audio/wav", "video/x-fake")[doc_id % 3]
        ids.append(f"media-{doc_id}")
        types.append(kind)
        if kind == "image/bmp":
            px = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
            payloads.append(encode_bmp(px))
            ws.append(64)
            hs.append(48)
            ds.append(-1)
        elif kind == "audio/wav":
            dur_ms = 100 * (1 + doc_id % 30)
            n = _WAV_RATE * dur_ms // 1000
            t = np.arange(n) / _WAV_RATE
            f = 100 + (seed % 400)
            wave = 0.5 * np.sin(2 * np.pi * f * t) + 0.1 * rng.standard_normal(n)
            payloads.append(
                encode_wav((wave * 20000).clip(-32768, 32767).astype(np.int16))
            )
            ws.append(-1)
            hs.append(-1)
            ds.append(dur_ms)
        else:
            payloads.append(hashlib.sha256((text or "").encode()).digest() * 8)
            ws.append(64)
            hs.append(48)
            ds.append(1000 * (1 + doc_id % 30))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(ds, pa.int32()),
        }
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-embedding of the payload bytes (video stub)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class DecodeMedia:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` is the once-per-actor setup slot (in a real deployment
    this is where PIL/ffmpeg/torchvision load); ``__call__`` decodes
    each payload and emits fixed-width features:

    - image/bmp, audio/wav: REAL decode via the pure-python codecs above;
    - video/*: frame-sample plumbing is real, per-frame decode is the
      deterministic fake unless real codecs exist (``allow_fake_video``,
      default True, else NotImplementedError).
    """

    def __init__(
        self,
        target_size: tuple[int, int] = (32, 32),
        frame_stride_ms: int = 5000,
        allow_fake_video: bool = True,
    ) -> None:
        self.target_size = target_size
        self.frame_stride_ms = frame_stride_ms
        self.allow_fake_video = allow_fake_video

    def _n_frames(self, duration_ms: int) -> int:
        if duration_ms <= 0:
            return 1  # still image
        return max(1, duration_ms // self.frame_stride_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, n_frames = [], []
        for mtype, payload, dur in zip(
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if mtype == "image/bmp":
                feats.append(image_features(decode_bmp(payload)))
                n_frames.append(1)
            elif mtype == "audio/wav":
                _, samples = decode_wav(payload)
                feats.append(audio_features(samples))
                n_frames.append(self._n_frames(dur))
            else:  # video — declared stub
                if not self.allow_fake_video:
                    raise NotImplementedError(
                        "no video codec in this environment; real frames "
                        "need ffmpeg (allow_fake_video=True uses the "
                        "deterministic stand-in)"
                    )
                k = self._n_frames(dur)
                frames = [
                    _fake_features(payload + i.to_bytes(4, "little"))
                    for i in range(k)
                ]
                feats.append(np.mean(frames, axis=0))
                n_frames.append(k)
        out = batch.drop_columns(["payload"])  # shed bytes immediately
        out = out.append_column(
            "features",
            pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
        )
        return out.append_column(
            "n_frames_sampled", pa.array(n_frames, pa.int32())
        )


def media_features(docs_ds, concurrency: int = 2, batch_size: int = 64):
    """documents -> synth media -> actor-pool decode/features pipeline."""
    return docs_ds.map_batches(
        synth_media_batch, batch_format="pyarrow"
    ).map_batches(
        DecodeMedia,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payload bytes bound the heap
        concurrency=concurrency,
    )
