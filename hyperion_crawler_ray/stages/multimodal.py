"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container — see ``DecodeImage.__init__``); everything around them — the
actor-pool stage shape, schema handling, small-batch sizing for wide
binary rows, output layout — is real and tested. Swap ``_decode`` for a
real decoder (PIL/ffmpeg) on a cluster that has one.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

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
    """Actor-pool decode stage. With no codec library present, emits a
    DETERMINISTIC FAKE decode (dimensions derived from payload hash) so
    the pipeline shape, schema, and batch behavior are fully exercised;
    with PIL available it decodes for real."""

    def __init__(self, thumbnail: int = 32):
        self.pil = _try_import_pil()
        self.thumbnail = thumbnail

    def _decode(self, payload: bytes) -> tuple[int, int, bytes]:
        if self.pil is not None:
            import io
            img = self.pil.open(io.BytesIO(payload))
            img.thumbnail((self.thumbnail, self.thumbnail))
            w, h = img.size
            return w, h, img.tobytes()
        # deterministic fake: dims + "features" from the payload hash
        d = hashlib.sha1(payload).digest()
        w = 64 + d[0] % 192
        h = 64 + d[1] % 192
        feat = d * 2  # 40 fake feature bytes
        return w, h, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats, sizes = [], [], [], []
        for p in batch.column("payload").to_pylist():
            w, h, f = self._decode(p)
            widths.append(w)
            heights.append(h)
            feats.append(f)
            sizes.append(len(p))
        return pa.table({
            "media_id": batch.column("media_id"),
            "media_type": batch.column("media_type"),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "features": pa.array(feats, pa.binary()),
        })


def decode_media(ds: rd.Dataset, concurrency: int = 4,
                 batch_size: int = 64) -> rd.Dataset:
    """Small batch_size on purpose: payloads are wide binary rows —
    batch_size × concurrency × row_width must fit worker heaps
    (SURVEY §7.3(e))."""
    return ds.map_batches(DecodeImage, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=0.5)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(200 + int(rng.randint(0, 800))) for _ in range(n)]
    types = [("image", "audio", "video")[i % 3] for i in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types, pa.string()),
    }, schema=MEDIA_SCHEMA)
