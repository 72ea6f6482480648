"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decode chain (round 5): PIL when present -> a REAL pure-stdlib PNG codec
(functions/png.py: zlib inflate + spec unfiltering + nearest-neighbor
thumbnail) for PNG payloads -> a deterministic fake for other media (no
audio/video codec exists in this container). The actor-pool stage shape,
schema handling, small-batch sizing for wide binary rows, and output
layout are identical across the three paths, so pipelines written here
run unchanged on a cluster with full codec libraries.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions import png as _png

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("payload", pa.binary()),
    pa.field("media_type", pa.string()),   # image|audio|video
])


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except Exception:
        return None


class DecodeImage:
    """Actor-pool decode stage. Decoder chain per payload: PIL (when the
    library exists) -> pure-stdlib PNG codec for PNG payloads (REAL
    decode: true dimensions + nearest-neighbor thumbnail pixels as the
    feature bytes) -> deterministic fake (dims from the payload hash) for
    media with no in-container codec. The emitted ``decoder`` column
    records which path ran, so tests can assert the real path actually
    exercised."""

    def __init__(self, thumbnail: int = 32):
        self.pil = _try_import_pil()
        self.thumbnail = thumbnail

    def _decode(self, payload: bytes) -> tuple[int, int, bytes, str]:
        if self.pil is not None:
            import io
            try:
                img = self.pil.open(io.BytesIO(payload))
                img.thumbnail((self.thumbnail, self.thumbnail))
                w, h = img.size
                return w, h, img.tobytes(), "pil"
            except Exception:
                pass  # not an image PIL knows — fall through
        if _png.is_png(payload):
            try:
                img = _png.decode_png(payload)
                h, w = img.shape[:2]
                thumb = _png.resize_nearest(img, self.thumbnail)
                return w, h, thumb.tobytes(), "png"
            except _png.PngUnsupported:
                pass  # interlaced/16-bit: fall back to the fake
        # deterministic fake: dims + "features" from the payload hash
        d = hashlib.sha1(payload).digest()
        w = 64 + d[0] % 192
        h = 64 + d[1] % 192
        return w, h, d * 2, "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats, sizes, modes = [], [], [], [], []
        for p in batch.column("payload").to_pylist():
            w, h, f, mode = self._decode(p)
            widths.append(w)
            heights.append(h)
            feats.append(f)
            sizes.append(len(p))
            modes.append(mode)
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "features": pa.array(feats, pa.binary()),
            "decoder": pa.array(modes, pa.string()),
        })


def decode_media(ds: rd.Dataset, concurrency: int = 4,
                 batch_size: int = 64) -> rd.Dataset:
    """Small batch_size on purpose: payloads are wide binary rows —
    batch_size × concurrency × row_width must fit worker heaps
    (SURVEY §7.3(e))."""
    return ds.map_batches(DecodeImage, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=0.5)


class ResizeImage:
    """Actor-pool resize stage (thumbnail). Without a codec library the
    resize is a deterministic fake over the payload hash, but the stage
    contract — (payload, width, height) in, fixed-size thumbnail bytes +
    new dims out — is the real plumbing."""

    def __init__(self, max_side: int = 64):
        self.pil = _try_import_pil()
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = batch.column("width").to_pylist()
        hs = batch.column("height").to_pylist()
        out_w, out_h, thumbs = [], [], []
        for w, h, feat in zip(ws, hs, batch.column("features").to_pylist()):
            scale = self.max_side / max(w, h)
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            out_w.append(nw)
            out_h.append(nh)
            # fake thumbnail bytes: deterministic, sized nw*nh (capped)
            need = min(nw * nh, 4096)
            rep = (feat * (need // max(1, len(feat)) + 1))[:need]
            thumbs.append(bytes(rep))
        return pa.table({
            "media_id": batch.column("media_id"),
            "thumb_w": pa.array(out_w, pa.int32()),
            "thumb_h": pa.array(out_h, pa.int32()),
            "thumbnail": pa.array(thumbs, pa.binary()),
        })


class FrameSample:
    """Actor-pool video frame-sampling stage: emits one row per sampled
    frame (flat output — one input row fans out to ``n_frames``). The
    decoder is a deterministic fake; the fan-out shape, small batch
    sizing and schema are the real thing."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, feats = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            d = hashlib.sha1(payload).digest()
            dur = 1 + d[2] % 120  # fake duration seconds
            for k in range(self.n_frames):
                ts = (k * dur) // self.n_frames
                ids.append(mid)
                frame_idx.append(ts)
                feats.append(hashlib.sha1(d + bytes([k])).digest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_ts_s": pa.array(frame_idx, pa.int32()),
            "frame_features": pa.array(feats, pa.binary()),
        })


def media_pipeline(ds: rd.Dataset, concurrency: int = 4) -> rd.Dataset:
    """decode -> resize for images; frame-sample for videos. Shows the
    per-media-type routing: filter by type, process, union."""
    decoded = decode_media(ds, concurrency=concurrency)
    images = decoded.filter(expr="media_type != 'video'")
    thumbs = images.map_batches(ResizeImage, batch_format="pyarrow",
                                batch_size=64, concurrency=concurrency,
                                num_cpus=0.5)
    return thumbs


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table for tests: image rows carry REAL PNG
    payloads (random RGB pixels through functions/png.encode_png, so the
    decode stage exercises the stdlib codec end-to-end); audio/video rows
    carry opaque seeded bytes (no codec for them in-container)."""
    rng = np.random.RandomState(seed)
    payloads, types = [], []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        types.append(mtype)
        if mtype == "image":
            h = 8 + int(rng.randint(0, 40))
            w = 8 + int(rng.randint(0, 40))
            img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            payloads.append(_png.encode_png(img))
        else:
            payloads.append(rng.bytes(200 + int(rng.randint(0, 800))))
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types, pa.string()),
    }, schema=MEDIA_SCHEMA)
