"""Fused WebP probe decoder (native/webpfast.py + ruppwebp.cpp).

Same contract as test_jpegfast/test_pngfast: bit-identical to the PIL
route for every accepted stream, fail-closed (None) otherwise."""

from __future__ import annotations

import io

import numpy as np
import pytest
from PIL import Image

from rupphash_tpu.native import webpfast
from rupphash_tpu.pipeline import decode

pytestmark = pytest.mark.skipif(
    not webpfast.available(),
    reason="ruppwebp unavailable or self-probe rejected this machine")


def _webp(im: Image.Image, **kw) -> bytes:
    buf = io.BytesIO()
    im.save(buf, "WEBP", **kw)
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
    fast = webpfast.probe_luma(data)
    assert fast is not None
    want_luma, want_res = _slow(data)
    assert fast[1] == want_res
    assert np.array_equal(fast[0], want_luma)


@pytest.mark.parametrize("w,h", [(16, 16), (37, 23), (320, 240),
                                 (511, 512), (700, 500), (1280, 719)])
def test_bit_equality_lossy(w, h):
    _check(_webp(Image.fromarray(_textured(w, h, w + h)), quality=84))
    rng = np.random.default_rng(h)
    _check(_webp(Image.fromarray(
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8)), quality=95))


def test_bit_equality_modes():
    arr = _textured(230, 140, 3)
    rng = np.random.default_rng(9)
    noise = rng.integers(0, 256, (140, 230), dtype=np.uint8)
    _check(_webp(Image.fromarray(arr), lossless=True))          # VP8L
    rgba = np.dstack([arr, noise])
    _check(_webp(Image.fromarray(rgba, "RGBA"), quality=85))    # +alpha
    _check(_webp(Image.fromarray(rgba, "RGBA"), lossless=True))
    # VP8X container path (EXIF side-chunk forces the extended format)
    data = _webp(Image.fromarray(arr), quality=90,
                 exif=b"Exif\x00\x00II*\x00\x08\x00\x00\x00\x00\x00")
    assert webpfast.webp_dims(data) == (230, 140)
    _check(data)


def test_bit_equality_resample_and_qualities():
    _check(_webp(Image.fromarray(_textured(900, 600, 5)), quality=82))
    for q in (30, 60, 100):
        _check(_webp(Image.fromarray(_textured(260, 180, 6)), quality=q))
    _check(_webp(Image.fromarray(_textured(2000, 1200, 7)), quality=80))


def test_dims_peek_matches_all_container_flavors():
    lossy = _webp(Image.fromarray(_textured(37, 23, 1)), quality=80)
    lossless = _webp(Image.fromarray(_textured(41, 29, 2)),
                     lossless=True)
    ext = _webp(Image.fromarray(_textured(53, 31, 3)), quality=80,
                exif=b"Exif\x00\x00II*\x00\x08\x00\x00\x00\x00\x00")
    assert webpfast.webp_dims(lossy) == (37, 23)
    assert webpfast.webp_dims(lossless) == (41, 29)
    assert webpfast.webp_dims(ext) == (53, 31)


def test_animated_falls_back():
    frames = [Image.fromarray(_textured(64, 48, s)) for s in (1, 2)]
    buf = io.BytesIO()
    frames[0].save(buf, "WEBP", save_all=True,
                   append_images=frames[1:], duration=100)
    data = buf.getvalue()
    assert webpfast.webp_dims(data) is None
    assert webpfast.probe_luma(data) is None


def test_truncated_and_garbage_fall_back():
    data = _webp(Image.fromarray(_textured(320, 240, 13)), quality=85)
    assert webpfast.probe_luma(data[: len(data) // 2]) is None
    assert webpfast.probe_luma(b"RIFF\x00\x00\x00\x00WEBP" +
                               b"\x00" * 64) is None
    assert webpfast.probe_luma(b"not a webp") is None


def test_tiny_dims_fall_back():
    # below MIN_HASHABLE_DIM the probe defers to the normal gates
    data = _webp(Image.fromarray(_textured(4, 4, 15)), quality=90)
    assert webpfast.webp_dims(data) == (4, 4)
    assert webpfast.probe_luma(data) is None


def test_heavy_prepare_webp_equality(tmp_path, monkeypatch):
    from rupphash_tpu.pipeline import heavy

    p = tmp_path / "a.webp"
    Image.fromarray(_textured(700, 500, 17)).save(p, quality=86)
    fast = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.setenv("RUPPHASH_NO_WEBPFAST", "1")
    slow = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.delenv("RUPPHASH_NO_WEBPFAST")
    assert fast["res"] == slow["res"] == (700, 500)
    assert np.array_equal(fast["luma"], slow["luma"])
    assert fast["content_hash"] == slow["content_hash"]


def test_heavy_prepare_animated_webp_matches_pil(tmp_path, monkeypatch):
    # an animated WebP must hash identically whether or not the fused
    # probe module is enabled (it rejects, PIL default-frame wins)
    from rupphash_tpu.pipeline import heavy

    frames = [Image.fromarray(_textured(320, 240, s)) for s in (5, 6)]
    p = tmp_path / "anim.webp"
    frames[0].save(p, save_all=True, append_images=frames[1:],
                   duration=80)
    fast = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.setenv("RUPPHASH_NO_WEBPFAST", "1")
    slow = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.delenv("RUPPHASH_NO_WEBPFAST")
    assert fast["res"] == slow["res"]
    assert np.array_equal(fast["luma"], slow["luma"])
