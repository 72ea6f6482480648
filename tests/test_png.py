"""Pure-stdlib PNG codec (functions/png.py): spec-driven decode of all
five scanline filters, palette expansion, encode/decode round-trips,
unsupported-subset errors, and the multimodal stage actually exercising
the real path."""

import struct
import zlib

import numpy as np
import pytest

from hyperion_crawler_ray.functions import png as P


def _rng(seed=0):
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# round-trips through our encoder (filter 0 scanlines)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(1, 1, 1), (5, 3, 1), (4, 4, 2),
                                   (7, 9, 3), (16, 2, 4), (33, 31, 3)])
def test_roundtrip(shape):
    img = _rng(sum(shape)).randint(0, 256, size=shape).astype(np.uint8)
    out = P.decode_png(P.encode_png(img))
    assert out.shape == shape
    assert np.array_equal(out, img)


def test_grayscale_2d_input():
    img = _rng(7).randint(0, 256, size=(6, 5)).astype(np.uint8)
    out = P.decode_png(P.encode_png(img))
    assert out.shape == (6, 5, 1)
    assert np.array_equal(out[:, :, 0], img)


# ---------------------------------------------------------------------------
# hand-built PNGs: every filter type, per the spec's reconstruction rules
# ---------------------------------------------------------------------------

def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _build_png(filtered_rows: list[tuple[int, bytes]], w: int, h: int,
               color_type: int, extra: bytes = b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([f]) + line for f, line in filtered_rows)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + extra
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


def _paeth_ref(a, b, c):
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_rows(img: np.ndarray, ftype: int) -> list[tuple[int, bytes]]:
    """Apply one spec filter to every scanline (the ENCODER side of the
    reconstruction the decoder must invert) — written independently of
    png.py, loops straight from the spec text."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(int)
    stride = w * c
    rows = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, int)
        out = np.zeros(stride, int)
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                pred = _paeth_ref(left, up, ul)
            out[x] = (cur[x] - pred) % 256
        rows.append((ftype, bytes(out.astype(np.uint8))))
    return rows


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels,color_type", [(1, 0), (3, 2), (4, 6)])
def test_decode_each_filter_type(ftype, channels, color_type):
    img = _rng(ftype * 10 + channels).randint(
        0, 256, size=(6, 5, channels)).astype(np.uint8)
    data = _build_png(_filter_rows(img, ftype), 5, 6, color_type)
    assert np.array_equal(P.decode_png(data), img)


def test_decode_mixed_filters_per_row():
    img = _rng(99).randint(0, 256, size=(5, 4, 3)).astype(np.uint8)
    rows = []
    for y, f in enumerate([0, 1, 2, 3, 4]):
        rows.append(_filter_rows(img, f)[y])  # row y filtered with type f
    data = _build_png(rows, 4, 5, 2)
    assert np.array_equal(P.decode_png(data), img)


def test_palette_expansion():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]],
                   np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    rows = [(0, bytes(idx[y])) for y in range(2)]
    data = _build_png(rows, 3, 2, 3, extra=_chunk(b"PLTE", pal.tobytes()))
    out = P.decode_png(data)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, pal[idx])


# ---------------------------------------------------------------------------
# errors + unsupported subset
# ---------------------------------------------------------------------------

def test_rejects_bad_inputs():
    with pytest.raises(P.PngError, match="signature"):
        P.decode_png(b"JFIF not a png")
    assert not P.is_png(b"")
    img = _rng(1).randint(0, 256, size=(3, 3, 3)).astype(np.uint8)
    good = P.encode_png(img)
    with pytest.raises(P.PngError):
        P.decode_png(good[:30])  # truncated mid-chunk
    # interlaced header -> PngUnsupported (fall-back signal, not a crash)
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1)
    bad = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 30))
           + _chunk(b"IEND", b""))
    with pytest.raises(P.PngUnsupported, match="interlace"):
        P.decode_png(bad)
    # 16-bit depth -> PngUnsupported
    ihdr16 = struct.pack(">IIBBBBB", 3, 3, 16, 2, 0, 0, 0)
    bad16 = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr16)
             + _chunk(b"IDAT", zlib.compress(b"\x00" * 60))
             + _chunk(b"IEND", b""))
    with pytest.raises(P.PngUnsupported, match="bit depth"):
        P.decode_png(bad16)


def test_resize_nearest():
    img = _rng(3).randint(0, 256, size=(40, 20, 3)).astype(np.uint8)
    th = P.resize_nearest(img, 10)
    assert th.shape == (10, 5, 3)
    assert np.array_equal(P.resize_nearest(img, 10), th)  # deterministic
    small = _rng(4).randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    assert P.resize_nearest(small, 10) is small  # no upscale


# ---------------------------------------------------------------------------
# the decode stage really exercises the codec
# ---------------------------------------------------------------------------

def test_decode_stage_uses_real_png_path():
    import ray.data as rd

    from hyperion_crawler_ray.stages.multimodal import (
        decode_media,
        synth_media_table,
    )

    t = synth_media_table(30, seed=5)
    got = decode_media(rd.from_arrow(t), concurrency=2, batch_size=8) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    img_rows = got[got["media_type"] == "image"]
    other = got[got["media_type"] != "image"]
    assert (img_rows["decoder"] == "png").all()
    assert (other["decoder"] == "fake").all()
    # dimensions must be the TRUE encoded dimensions, not hash fakes:
    # regenerate the same payloads and decode directly
    for _, row in img_rows.iterrows():
        img = P.decode_png(
            t.column("payload")[int(row["media_id"])].as_py())
        assert (row["width"], row["height"]) == (img.shape[1], img.shape[0])
        thumb = P.resize_nearest(img, 32)
        assert row["features"] == thumb.tobytes()
