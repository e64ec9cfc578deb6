"""Fused JPEG probe decoder (native/jpegfast.py + ruppjpeg.cpp).

The fast path must be bit-identical to the PIL route
(decode_bytes -> prepare_luma_fast) for every stream it accepts, and
must fail closed (return None) for everything else so the PIL path
decides.  Mirrors the codec differential pattern of
tests/test_rawcontainers.py."""

from __future__ import annotations

import io

import numpy as np
import pytest
from PIL import Image

from rupphash_tpu.native import jpegfast
from rupphash_tpu.pipeline import decode

pytestmark = pytest.mark.skipif(
    not jpegfast.available(),
    reason="ruppjpeg unavailable or self-probe rejected this machine")


def _jpeg(arr: np.ndarray, **kw) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _textured(w: int, h: int, seed: int, gray: bool = False):
    rng = np.random.default_rng(seed)
    shape = (max(h // 8, 1), max(w // 8, 1)) + (() if gray else (3,))
    small = rng.integers(0, 256, shape, dtype=np.uint8)
    return np.asarray(
        Image.fromarray(small).resize((w, h), Image.BILINEAR))


def _slow(data: bytes):
    img = decode.decode_bytes(data)
    assert img is not None
    h, w = img.shape[:2]
    return decode.prepare_luma_fast(img), (w, h)


@pytest.mark.parametrize("w,h", [(16, 16), (37, 23), (130, 97),
                                 (320, 240), (511, 512), (700, 500),
                                 (1280, 719)])
@pytest.mark.parametrize("quality,subsampling,progressive",
                         [(50, 2, False), (85, 1, False),
                          (95, 0, False), (80, 0, True), (92, 2, True)])
def test_bit_equality_color(w, h, quality, subsampling, progressive):
    data = _jpeg(_textured(w, h, w * 1000 + h), quality=quality,
                 subsampling=subsampling, progressive=progressive)
    fast = jpegfast.probe_luma(data)
    assert fast is not None
    want_luma, want_res = _slow(data)
    assert fast[1] == want_res
    assert np.array_equal(fast[0], want_luma)


@pytest.mark.parametrize("w,h", [(64, 40), (513, 200), (600, 601)])
def test_bit_equality_grayscale(w, h):
    data = _jpeg(_textured(w, h, 7, gray=True), quality=88)
    fast = jpegfast.probe_luma(data)
    assert fast is not None
    want_luma, want_res = _slow(data)
    assert fast[1] == want_res
    assert np.array_equal(fast[0], want_luma)


def test_restart_markers_and_optimized():
    data = _jpeg(_textured(400, 300, 11), quality=90, restart_marker_blocks=4,
                 optimize=True)
    fast = jpegfast.probe_luma(data)
    assert fast is not None
    want_luma, _ = _slow(data)
    assert np.array_equal(fast[0], want_luma)


def test_cmyk_falls_back():
    arr = _textured(64, 48, 3)
    buf = io.BytesIO()
    Image.fromarray(arr).convert("CMYK").save(buf, "JPEG", quality=90)
    assert jpegfast.probe_luma(buf.getvalue()) is None


def test_tiny_and_garbage_fall_back():
    # below MIN_HASHABLE_DIM: PIL path owns the (res, luma=None) case
    tiny = _jpeg(np.zeros((3, 4, 3), np.uint8), quality=90)
    assert jpegfast.probe_luma(tiny) is None
    assert jpegfast.probe_luma(b"\xff\xd8\xff\xe0" + b"\x00" * 64) is None
    assert jpegfast.probe_luma(b"not a jpeg") is None


def test_truncated_falls_back():
    data = _jpeg(_textured(320, 240, 5), quality=90)
    assert jpegfast.probe_luma(data[: len(data) // 2]) is None


def test_trailing_garbage_matches_slow_path():
    # MPO-style files carry concatenated JPEGs; both paths must agree
    # on the primary image (PIL also decodes only the first frame)
    data = _jpeg(_textured(120, 90, 9), quality=90)
    blob = data + _jpeg(_textured(60, 45, 10), quality=80)
    fast = jpegfast.probe_luma(blob)
    if fast is not None:  # libjpeg may warn on trailing bytes => None ok
        img = decode.decode_bytes(blob)
        want = decode.prepare_luma_fast(img)
        assert np.array_equal(fast[0], want)


def test_jpeg_dims_rejects_lossless_and_12bit():
    # SOF3 (lossless) must be rejected by the header walk
    data = _jpeg(_textured(64, 48, 4), quality=90)
    i = data.find(b"\xff\xc0")
    assert i > 0
    sof3 = data[:i] + b"\xff\xc3" + data[i + 2:]
    assert jpegfast.jpeg_dims(sof3) is None
    # 12-bit precision field
    p = i + 4
    bad = bytearray(data)
    bad[p] = 12
    assert jpegfast.jpeg_dims(bytes(bad)) is None


def _multi_preview_blob(seed: int) -> tuple[bytes, np.ndarray]:
    """TIFF-magic-prefixed blob embedding a small and a large JPEG
    preview (RAW-container shape); returns (blob, large RGB array)."""
    small = _jpeg(_textured(200, 150, seed), quality=95)
    big_arr = _textured(640, 480, seed + 1)
    big = _jpeg(big_arr, quality=95)
    assert len(small) > 4096 and len(big) > 4096
    blob = (b"II*\x00" + b"\x00" * 256 + small + b"\x00" * 64 + big
            + b"\x00" * 32)
    return blob, big_arr


def test_extract_largest_jpeg_decodes_only_winner(monkeypatch):
    """Dims-first selection: only the largest-SOF span is decoded."""
    blob, _ = _multi_preview_blob(41)
    calls = []
    real = decode.decode_bytes

    def counting(data):
        calls.append(len(data))
        return real(data)

    monkeypatch.setattr(decode, "decode_bytes", counting)
    img = decode.extract_largest_jpeg(blob)
    assert img is not None and img.shape[:2] == (480, 640)
    assert len(calls) == 1


def test_raw_preview_probe_matches_slow_path():
    blob, _ = _multi_preview_blob(43)
    fast = decode.probe_luma_raw_preview(blob)
    assert fast is not None
    img = decode.extract_largest_jpeg(blob)
    want = decode.prepare_luma_fast(img)
    assert fast[1] == (640, 480)
    assert np.array_equal(fast[0], want)


def test_heavy_prepare_raw_preview_equality(tmp_path, monkeypatch):
    """A RAW-suffixed multi-preview file produces identical records
    with the fused preview probe on and force-disabled."""
    from rupphash_tpu.pipeline import heavy

    blob, _ = _multi_preview_blob(47)
    p = tmp_path / "shot.cr2"
    p.write_bytes(blob)
    fast = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.setenv("RUPPHASH_NO_JPEGFAST", "1")
    slow = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.delenv("RUPPHASH_NO_JPEGFAST")
    assert fast["res"] == slow["res"] == (640, 480)
    assert np.array_equal(fast["luma"], slow["luma"])


def test_heavy_prepare_uses_fast_path_and_matches(tmp_path, monkeypatch):
    """End-to-end: heavy_prepare's record is identical with the fast
    path on and force-disabled (hashes downstream are therefore too)."""
    from rupphash_tpu.pipeline import heavy

    arr = _textured(700, 500, 21)
    p = tmp_path / "a.jpg"
    with open(p, "wb") as f:
        Image.fromarray(arr).save(f, "JPEG", quality=92)

    fast = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.setenv("RUPPHASH_NO_JPEGFAST", "1")
    slow = heavy.heavy_prepare(p, None, want_pixel_hash=False)
    monkeypatch.delenv("RUPPHASH_NO_JPEGFAST")

    assert fast["res"] == slow["res"]
    assert np.array_equal(fast["luma"], slow["luma"])
    assert fast["content_hash"] == slow["content_hash"]
    # pixel-hash mode needs full RGB: must still work (slow route)
    px = heavy.heavy_prepare(p, None, want_pixel_hash=True)
    assert "pixel_hash" in px and px["res"] == slow["res"]


def test_scan_groups_identically_with_fast_path(tmp_path, monkeypatch):
    """A scan over JPEG twins produces identical groups with the fast
    path enabled and disabled."""
    from rupphash_tpu.pipeline import scan

    d = tmp_path / "s"
    d.mkdir()
    arr = _textured(640, 480, 31)
    with open(d / "a.jpg", "wb") as f:
        Image.fromarray(arr).save(f, "JPEG", quality=95)
    with open(d / "b.jpg", "wb") as f:
        Image.fromarray(arr).save(f, "JPEG", quality=70)
    Image.fromarray(_textured(640, 480, 32)).save(d / "other.png")

    groups, _, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"a.jpg", "b.jpg"}
    hashes_fast = {r.path.name: r.pdqhash for r in records
                   if r.pdqhash is not None}

    monkeypatch.setenv("RUPPHASH_NO_JPEGFAST", "1")
    groups2, _, records2, stats2 = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats2.failed == 0
    hashes_slow = {r.path.name: r.pdqhash for r in records2
                   if r.pdqhash is not None}
    assert hashes_fast == hashes_slow
