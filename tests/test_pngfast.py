"""Fused PNG probe decoder (native/pngfast.py + ruppng.cpp).

Same contract as test_jpegfast: bit-identical to the PIL route for
every accepted stream, fail-closed (None) otherwise."""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np
import pytest
from PIL import Image

from rupphash_tpu.native import pngfast
from rupphash_tpu.pipeline import decode

pytestmark = pytest.mark.skipif(
    not pngfast.available(),
    reason="ruppng unavailable or self-probe rejected this machine")


def _png(im: Image.Image, **kw) -> bytes:
    buf = io.BytesIO()
    im.save(buf, "PNG", **kw)
    return buf.getvalue()


def _textured(w: int, h: int, seed: int):
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 256, (max(h // 8, 1), max(w // 8, 1), 3),
                         dtype=np.uint8)
    return np.asarray(
        Image.fromarray(small).resize((w, h), Image.BILINEAR))


def _slow(data: bytes):
    img = decode.decode_bytes(data)
    assert img is not None
    h, w = img.shape[:2]
    return decode.prepare_luma_fast(img), (w, h)


def _check(data: bytes):
    fast = pngfast.probe_luma(data)
    assert fast is not None
    want_luma, want_res = _slow(data)
    assert fast[1] == want_res
    assert np.array_equal(fast[0], want_luma)


@pytest.mark.parametrize("w,h", [(16, 16), (37, 23), (320, 240),
                                 (511, 512), (700, 500), (1280, 719)])
def test_bit_equality_rgb(w, h):
    # smooth content drives Paeth/Average filters, noise drives 0/Sub
    _check(_png(Image.fromarray(_textured(w, h, w + h))))
    rng = np.random.default_rng(h)
    _check(_png(Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8))))


def test_bit_equality_modes():
    arr = _textured(230, 140, 3)
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, (140, 230), dtype=np.uint8)
    _check(_png(Image.fromarray(arr[..., 1])))                  # gray
    rgba = np.dstack([arr, noise])
    _check(_png(Image.fromarray(rgba, "RGBA")))                 # RGBA
    la = np.stack([arr[..., 0], noise], axis=2)
    _check(_png(Image.fromarray(la, "LA")))                     # L+alpha
    _check(_png(Image.fromarray(arr).convert(
        "P", palette=Image.ADAPTIVE, colors=77)))               # palette
    _check(_png(Image.fromarray(arr).convert(
        "P", palette=Image.ADAPTIVE, colors=256)))


def test_bit_equality_resample_and_levels():
    _check(_png(Image.fromarray(_textured(900, 600, 5))))
    for level in (0, 1, 9):
        _check(_png(Image.fromarray(_textured(260, 180, 6)),
                    compress_level=level))


def test_unsupported_classes_fall_back():
    arr16 = (np.random.default_rng(4).integers(
        0, 1 << 16, (40, 50), dtype=np.uint16))
    im16 = Image.new("I;16", (50, 40))
    im16.putdata([int(v) for v in arr16.ravel()])
    assert pngfast.probe_luma(_png(im16)) is None               # 16-bit
    bil = Image.fromarray(_textured(60, 40, 8)).convert("1")
    assert pngfast.probe_luma(_png(bil)) is None                # 1-bit
    # interlaced: PIL can't write Adam7; patch IHDR and expect a clean
    # rejection from the header gate
    data = bytearray(_png(Image.fromarray(_textured(40, 30, 9))))
    data[28] = 1  # interlace flag inside IHDR
    assert pngfast.png_dims(bytes(data)) is None


def test_apng_falls_back(tmp_path):
    frames = [Image.fromarray(_textured(64, 48, s)) for s in (1, 2)]
    buf = io.BytesIO()
    frames[0].save(buf, "PNG", save_all=True, append_images=frames[1:],
                   duration=100)
    data = buf.getvalue()
    assert b"acTL" in data
    assert pngfast.probe_luma(data) is None


def test_crc_behavior_matches_pillow():
    data = _png(Image.fromarray(_textured(64, 48, 11)))
    # IDAT CRC corruption: Pillow decodes, so must we
    p = 8
    while p < len(data):
        ln = int.from_bytes(data[p:p + 4], "big")
        if data[p + 4:p + 8] == b"IDAT":
            bad = bytearray(data)
            bad[p + 8 + ln] ^= 0xFF
            _check(bytes(bad))
            break
        p += 12 + ln
    # IHDR CRC corruption: Pillow rejects, so must we
    bad2 = bytearray(data)
    bad2[8 + 8 + 13] ^= 0xFF
    assert pngfast.probe_luma(bytes(bad2)) is None
    assert decode.decode_bytes(bytes(bad2)) is None


def test_truncated_and_garbage_fall_back():
    data = _png(Image.fromarray(_textured(320, 240, 13)))
    assert pngfast.probe_luma(data[: len(data) // 2]) is None
    assert pngfast.probe_luma(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64) is None
    assert pngfast.probe_luma(b"not a png") is None


def test_heavy_prepare_png_equality(tmp_path, monkeypatch):
    from rupphash_tpu.pipeline import heavy

    p = tmp_path / "a.png"
    Image.fromarray(_textured(700, 500, 17)).save(p)
    fast = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.setenv("RUPPHASH_NO_PNGFAST", "1")
    slow = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.delenv("RUPPHASH_NO_PNGFAST")
    assert fast["res"] == slow["res"] == (700, 500)
    assert np.array_equal(fast["luma"], slow["luma"])
    assert fast["content_hash"] == slow["content_hash"]
