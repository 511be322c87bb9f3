"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so
the *decode kernels* are stubbed (deterministic fake or
``NotImplementedError``), while everything Ray-side is real and tested:
schemas, actor-pool signatures, small-batch sizing for large binary
rows, zero-copy Arrow handling, and output layout.

Swap ``_decode_image_stub`` for a PIL/torchvision call and the stage is
production-shaped: the actor loads the decoder once (``__init__``), the
batch path never copies payload bytes through pandas object boxing
(``batch_format="pyarrow"``).
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import default_pool

try:  # real decoder when available; this container ships none
    from PIL import Image as _PIL_Image  # pragma: no cover
except ImportError:
    _PIL_Image = None

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("width", pa.int32()),        # typed metadata (media-dependent)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 256, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    payloads = [rng.bytes(rng.randint(64, 4096)) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.randint(16, 1920, n).astype(np.int32)),
            "height": pa.array(rng.randint(16, 1080, n).astype(np.int32)),
            "duration_ms": pa.array(rng.randint(0, 60000, n).astype(np.int32)),
        }
    )


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Image decode → 8×8×3 float thumbnail.

    When PIL is importable the payload is decoded for real (open →
    RGB → 8×8 resize); in this container (no decoder libs) the STUB
    path derives a deterministic fake thumbnail from the payload bytes
    so tests can assert stability.  The synthetic corpus carries random
    bytes, so even with PIL present undecodable payloads fall back to
    the stub rather than failing the stage."""
    if _PIL_Image is not None:  # pragma: no cover - PIL absent here
        try:
            img = _PIL_Image.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(
                img.resize((8, 8)), dtype=np.float32
            )
        except Exception:
            pass  # undecodable bytes → deterministic fallback below
    h = hashlib.sha256(payload).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    return np.resize(base, (8, 8, 3))  # fake 8x8 RGB "thumbnail"


class MediaFeatureExtractor:
    """Actor-pool stage: decode payloads and emit fixed-size feature
    vectors. Small ``batch_size`` is mandatory — payload bytes dominate
    block memory (see module docstring)."""

    def __init__(self, feature_dim: int = 64):
        self.feature_dim = feature_dim
        # Real version: self.model = load_model(...) — once per actor.

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        feats = []
        ok = []
        for kind, payload, w, h in zip(kinds, payloads, widths, heights):
            if kind == "image":
                thumb = _decode_image_stub(payload, w, h)
                v = np.resize(thumb.ravel(), self.feature_dim)
                feats.append(v.astype(np.float32))
                ok.append(True)
            else:
                # audio/video decode not implemented in this environment
                feats.append(np.zeros(self.feature_dim, np.float32))
                ok.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
                "decoded": pa.array(ok, pa.bool_()),
            }
        )


def media_features(ds: rd.Dataset, feature_dim: int = 64) -> rd.Dataset:
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=64,          # large binary rows → small batches
        concurrency=default_pool(cap=8),
        num_cpus=1,
    )


class ImageResizer:
    """Actor-pool resize stage (STUB decode/encode — the Ray plumbing is
    real: pyarrow binary in/out, small batches, per-actor setup). A real
    pipeline swaps the stub for PIL ``Image.resize``."""

    def __init__(self, width: int = 64, height: int = 64):
        self.width = width
        self.height = height
        # Real version: initialize codec/threadpool once per actor.

    def _resize_stub(self, payload: bytes) -> bytes:
        # Real path when PIL is importable: decode → grayscale resize →
        # raw w*h bytes (same output contract as the stub). Otherwise a
        # deterministic fake: resample payload bytes to w*h (stands in
        # for decoded-pixels → resize → re-encode).
        n = self.width * self.height
        if _PIL_Image is not None:  # pragma: no cover - PIL absent here
            try:
                img = _PIL_Image.open(io.BytesIO(payload)).convert("L")
                return img.resize((self.width, self.height)).tobytes()
            except Exception:
                pass  # undecodable bytes → deterministic fallback
        if not payload:
            return b"\x00" * n
        reps = (n // len(payload)) + 1
        return (payload * reps)[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_payloads, ok = [], []
        for kind, payload in zip(kinds, payloads):
            if kind == "image":
                out_payloads.append(self._resize_stub(payload))
                ok.append(True)
            else:
                out_payloads.append(b"")
                ok.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out_payloads, pa.binary()),
                "width": pa.array([self.width] * len(kinds), pa.int32()),
                "height": pa.array([self.height] * len(kinds), pa.int32()),
                "resized": pa.array(ok, pa.bool_()),
            }
        )


def resize_images(ds: rd.Dataset, width: int = 64, height: int = 64) -> rd.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=default_pool(cap=8),
    )


def sample_frames(ds: rd.Dataset, fps_target: float = 1.0, max_frames: int = 8) -> rd.Dataset:
    """Frame sampling for video rows: one output row per sampled frame at
    ``fps_target`` (capped at ``max_frames``), deterministic timestamps
    from ``duration_ms``. Frame decode is stubbed (payload slice stands
    in for the decoded frame); the row-explosion plumbing — the part that
    matters for block sizing at scale — is real."""

    def explode(batch: pa.Table) -> pa.Table:
        media_ids, frame_idx, ts_ms, blobs = [], [], [], []
        for mid, kind, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video" or dur <= 0:
                continue
            n = min(max_frames, max(1, int(dur / 1000 * fps_target)))
            step = dur / n
            for i in range(n):
                media_ids.append(mid)
                frame_idx.append(i)
                ts_ms.append(int(i * step))
                # stub "decoded frame": deterministic payload slice
                a = (i * 37) % max(1, len(payload))
                blobs.append(payload[a : a + 64])
        return pa.table(
            {
                "media_id": pa.array(media_ids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "ts_ms": pa.array(ts_ms, pa.int32()),
                "frame": pa.array(blobs, pa.binary()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=64)


def media_size_stats(ds: rd.Dataset) -> rd.Dataset:
    """Pure-Arrow metadata aggregation (no payload touch): per kind,
    count + total payload bytes. Column pruning means the payload column
    only flows because byte length needs it; a parquet source would push
    a `binary_length` projection instead."""

    def stats(batch: pa.Table) -> pa.Table:
        length = pc.binary_length(batch["payload"])
        t = pa.table({"kind": batch["kind"], "bytes": length})
        return (
            t.group_by("kind").aggregate([("bytes", "sum"), ("kind", "count")])
            .rename_columns(["kind", "total_bytes", "n"])
        )

    partials = ds.map_batches(stats, batch_format="pyarrow", batch_size=256)
    from .shuffle import grouped_agg

    return grouped_agg(
        partials, ["kind"], {"total_bytes": "sum", "n": "sum"}, num_buckets=4
    )
