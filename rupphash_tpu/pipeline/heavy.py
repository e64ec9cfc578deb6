"""Heavy per-file scan work, isolated for worker processes.

This module deliberately imports no jax: scan worker *processes*
(spawned, see pipeline/scan.py) import it fresh, paying only
PIL/numpy/ctypes startup.  PIL decode releases the GIL but the
numpy/EXIF glue does not, so thread pools scale negatively on this
workload — process workers recover the reference's rayon-pool scaling
(scanner.rs:1191-1521).
"""

from __future__ import annotations

from pathlib import Path

from ..utils import hashes as H
from . import decode, exif


def heavy_prepare(path, content_key: bytes | None, want_pixel_hash: bool):
    """Heavy per-file half: read + keyed hash + EXIF + decode + luma.
    Store-free and picklable, so it runs in worker *processes* — PIL
    decode releases the GIL but the numpy/EXIF glue does not, and
    thread pools scale negatively on this workload (the reference's
    rayon pool has no GIL to fight, scanner.rs:1191-1521)."""
    path = Path(path)
    try:
        data = path.read_bytes()
    except OSError:
        return None
    out: dict = {}
    out["content_hash"] = H.content_hash(
        content_key if content_key is not None else b"\x00" * 32, data)

    feats = exif.extract(path, data=data)
    out["features"] = feats

    # fused JPEG probe: decode scanlines straight into the <=512 luma
    # (bit-identical to the load_image route, see native/jpegfast.py);
    # skipped when the full RGB is needed (--pixel-hash) or the suffix
    # routes elsewhere (RAW containers hash their embedded preview)
    fast = None
    if not want_pixel_hash:
        special = decode.is_raw_ext(path) or \
            path.suffix.lower().lstrip(".") in ("heic", "heif", "jxl",
                                                "pdf")
        if data[:3] == b"\xff\xd8\xff" and not special:
            from ..native import jpegfast
            fast = jpegfast.probe_luma(data)
        elif data[:8] == b"\x89PNG\r\n\x1a\n" and not special:
            # APNGs carry acTL and fail closed inside the probe
            from ..native import pngfast
            fast = pngfast.probe_luma(data)
        elif (data[:4] == b"RIFF" and data[8:12] == b"WEBP"
              and not special):
            # animated WebPs fail closed inside the probe (VP8X flag)
            from ..native import webpfast
            fast = webpfast.probe_luma(data)
        elif decode.is_raw_ext(path):
            # RAW files hash their largest embedded preview — same
            # fused route, selected by SOF dims without decoding the
            # other candidate previews
            fast = decode.probe_luma_raw_preview(data)
    if fast is not None:
        luma, res = fast
        out["res"] = res
        feats["width"], feats["height"] = res
        out["luma"] = luma
        return out

    img, res = decode.load_image(path, data=data)
    if img is None:
        out["decode_failed"] = True
        return out
    out["res"] = res
    feats["width"], feats["height"] = res
    if want_pixel_hash:
        # zero-key fallback mirrors content_hash above: --pixel-hash
        # must work without a cache store (--no-cache), just unkeyed
        out["pixel_hash"] = H.pixel_hash_rgba16(
            content_key if content_key is not None else b"\x00" * 32,
            img)
    # bit-exact native luma601 + <=512 box resample (tests/test_native.py)
    out["luma"] = decode.prepare_luma_fast(img)
    return out

