"""Multimodal columns: opaque binary payloads + typed metadata.

Media (image/audio/video) travels as ``binary`` columns with a
``media_type`` string and typed metadata struct; the decode /
feature-extract / resize / frame-sample operators are actor-pool
``map_batches`` stages. The decode KERNELS are stubbed (no
image/audio libs in this container): ``DecodeMedia`` raises
``NotImplementedError`` unless constructed with
``deterministic_fake=True``, in which case it produces a seeded fake
decode keyed on the payload bytes — so the Ray-side plumbing (schema,
batch sizing, actor signature, output layout) is real and tested while
the codec is swappable.

Scale notes: media payloads are large, so these stages use SMALL
``batch_size`` (payload bytes × batch × concurrency must fit the worker
heap), drop the ``payload`` column as soon as features are extracted,
and never pass media through a shuffle — features (small, fixed-width)
shuffle instead.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # image/jpeg, audio/wav, video/mp4
        ("payload", pa.binary()),
        ("width", pa.int32()),  # -1 when unknown / n/a
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents -> deterministic fake media rows (fixture only)."""
    ids, types, payloads, ws, hs, ds = [], [], [], [], [], []
    for doc_id, text in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        kind = ("image/jpeg", "audio/wav", "video/mp4")[doc_id % 3]
        ids.append(f"media-{doc_id}")
        types.append(kind)
        payloads.append(hashlib.sha256((text or "").encode()).digest() * 8)
        ws.append(64 if kind.startswith(("image", "video")) else -1)
        hs.append(48 if kind.startswith(("image", "video")) else -1)
        ds.append(1000 * (1 + doc_id % 30) if kind != "image/jpeg" else -1)
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
    """Deterministic pseudo-embedding of the payload bytes."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


class DecodeMedia:
    """Actor-pool decode + feature-extract stage.

    Real deployment: ``__init__`` loads the codec/model once per actor
    (PIL/ffmpeg/torchvision); ``__call__`` decodes each payload and emits
    fixed-width features. In this container the codec path is a
    clearly-marked stub.
    """

    def __init__(
        self,
        deterministic_fake: bool = False,
        target_size: tuple[int, int] = (32, 32),
        frame_stride_ms: int = 5000,
    ) -> None:
        self.fake = deterministic_fake
        self.target_size = target_size
        self.frame_stride_ms = frame_stride_ms
        if not deterministic_fake:
            # real codecs unavailable here — loading them would happen now
            raise NotImplementedError(
                "media codecs (PIL/ffmpeg) are not available in this "
                "environment; construct with deterministic_fake=True"
            )

    def _n_frames(self, duration_ms: int) -> int:
        if duration_ms <= 0:
            return 1  # still image
        return max(1, duration_ms // self.frame_stride_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, n_frames = [], []
        for payload, dur in zip(
            batch["payload"].to_pylist(), batch["duration_ms"].to_pylist()
        ):
            k = self._n_frames(dur)
            # frame-sample: one feature vector per sampled frame, mean-pooled
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
        fn_constructor_kwargs={"deterministic_fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payload bytes bound the heap
        concurrency=concurrency,
    )
