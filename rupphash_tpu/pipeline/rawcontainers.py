"""Proprietary raw container decode: CR2, NEF, and generic TIFF-EP.

The reference's viewer does a full LibRaw unpack+process with camera WB
(gui/image.rs:1886-1945, raw_exif.rs:40-111); LibRaw is absent from this
image, so the mainstream layouts are parsed natively and fed to the same
TPU demosaic pipeline the DNG path uses (pipeline/dng.py RawImage ->
ops/demosaic.py):

* **CR2** (Canon): TIFF with a ``CR\\x02`` signature at offset 8 whose
  trailing u32 points at the RAW IFD; the sensor mosaic is one
  lossless-JPEG (SOF3) strip decoded by the native LJ92 core
  (native/ruppnative.cpp), stored as vertical slices described by tag
  0xC640; camera WB comes from the Canon MakerNote ColorData block
  (tag 0x4001, WB_RGGBLevelsAsShot).
* **NEF** (Nikon): TIFF whose raw SubIFD is photometric CFA.
  Uncompressed 12/14-bit packed and 16-bit rasters (and lossless-JPEG
  ones) decode natively; Nikon's proprietary Huffman compression
  (34713) is not implemented, so those files keep using their embedded
  preview like the reference's *hashing* path does
  (scanner.rs:1353-1380).  WB from MakerNote WB_RBLevels (tag 0x000C).
* **generic TIFF-EP**: any other maker whose raw IFD uses a supported
  compression takes the same path (covers uncompressed ARW/PEF-class
  files).

Black/white levels: CR2/NEF carry no TIFF-level black/white tags (LibRaw
uses per-camera tables).  White defaults to the stream's sample
precision (SOF3 header / BitsPerSample); black to 0.  Synthetic
fixtures (tests/test_rawcontainers.py) bake that convention in.
"""

from __future__ import annotations

import struct

import numpy as np

from .dng import (RawImage, _all_ifds, _raster, _read_ifd, _scalar,
                  _T_BITS, _T_COMPRESSION, _T_LENGTH, _T_ORIENTATION,
                  _T_PHOTOMETRIC, _T_STRIP_COUNTS, _T_STRIP_OFFSETS,
                  _T_WIDTH, _T_CFA_PATTERN, _T_CFA_DIM, _PHOTO_CFA)

_T_MAKE = 271
_T_EXIF_IFD = 34665
_T_MAKERNOTE = 37500
_T_CR2_SLICES = 0xC640
_T_CANON_COLORDATA = 0x4001
_T_NIKON_WB_RB = 0x000C

_RGGB = np.array([[0, 1], [1, 2]], dtype=np.int32)


def _tiff_endian(data: bytes) -> str | None:
    if len(data) < 8:
        return None
    if data[:2] == b"II":
        return "<"
    if data[:2] == b"MM":
        return ">"
    return None


def is_cr2(data: bytes) -> bool:
    """CR2 signature: TIFF header immediately followed by 'CR' v2
    (bytes 8-10) and the raw-IFD offset (bytes 12-16)."""
    return (len(data) >= 16 and data[:2] == b"II"
            and data[8:10] == b"CR" and data[10] == 2)


def _ifd_entry_offsets(data: bytes, off: int, endian: str):
    """Raw IFD scan -> {tag: (type, count, value_offset)} with the
    *file offset* of each value (the parsed _read_ifd drops offsets,
    but MakerNote needs its own absolute position)."""
    out = {}
    if off + 2 > len(data):
        return out
    (n,) = struct.unpack_from(endian + "H", data, off)
    pos = off + 2
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
             10: 8, 11: 4, 12: 8}
    for _ in range(n):
        if pos + 12 > len(data):
            break
        tag, typ, cnt = struct.unpack_from(endian + "HHI", data, pos)
        size = sizes.get(typ, 1) * cnt
        if size <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", data, pos + 8)
        out[tag] = (typ, cnt, voff)
        pos += 12
    return out


def _sof3_precision(stream: bytes) -> int | None:
    """Sample precision from the lossless-JPEG SOF3 header."""
    p = 2
    while p + 4 <= len(stream):
        if stream[p] != 0xFF:
            return None
        marker = stream[p + 1]
        p += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = (stream[p] << 8) | stream[p + 1]
        if marker == 0xC3:
            return stream[p + 2]
        if marker == 0xDA:
            return None
        p += seglen
    return None


def _plausible_wb4(vals) -> bool:
    """(R, G1, G2, B) gains: positive, bounded, G1 ~ G2."""
    v = np.asarray(vals, dtype=np.float64)
    if v.size != 4 or np.any(v <= 0) or np.any(v > 65535):
        return False
    g1, g2 = v[1], v[2]
    return 0.5 < g1 / g2 < 2.0 and max(v) / min(v) < 16.0


def _canon_wb(data: bytes, endian: str, exif_off: int):
    """AsShotNeutral from the Canon MakerNote ColorData block.

    The Canon MakerNote is a bare IFD whose value offsets are relative
    to the TIFF base; tag 0x4001 holds a SHORT ColorData array with
    WB_RGGBLevelsAsShot at a version-dependent word offset (25 for
    ColorData1, 24 for ColorData2, 63 or 71 for later versions —
    validated by plausibility instead of a full version table).
    """
    exif_entries = _ifd_entry_offsets(data, exif_off, endian)
    mn = exif_entries.get(_T_MAKERNOTE)
    if mn is None:
        return None
    _, _, mn_off = mn
    mn_ifd, _ = _read_ifd(data, mn_off, endian)
    cd = mn_ifd.get(_T_CANON_COLORDATA)
    if cd is None:
        return None
    cd = np.atleast_1d(cd)
    offsets = {582: (25,), 653: (24,)}.get(cd.size, (63, 71))
    for off in offsets:
        if off + 4 <= cd.size and _plausible_wb4(cd[off:off + 4]):
            r, g1, g2, b = (float(x) for x in cd[off:off + 4])
            g = (g1 + g2) / 2.0
            # gains -> raw response of a neutral (G-normalized)
            return np.array([g / r, 1.0, g / b])
    return None


def _nikon_wb(data: bytes, endian: str, exif_off: int):
    """AsShotNeutral from the Nikon MakerNote WB_RBLevels (tag 0x000C,
    four RATIONALs R, B, G, G as G-relative multipliers).  The Nikon
    MakerNote is a 'Nikon\\x00' header followed by an embedded TIFF."""
    exif_entries = _ifd_entry_offsets(data, exif_off, endian)
    mn = exif_entries.get(_T_MAKERNOTE)
    if mn is None:
        return None
    _, cnt, mn_off = mn
    blob = data[mn_off:mn_off + cnt]
    if not blob.startswith(b"Nikon\x00"):
        return None
    emb = blob[10:]
    e2 = _tiff_endian(emb)
    if e2 is None:
        return None
    (first,) = struct.unpack_from(e2 + "I", emb, 4)
    ifd, _ = _read_ifd(emb, first, e2)
    wb = ifd.get(_T_NIKON_WB_RB)
    if wb is None:
        return None
    wb = np.atleast_1d(wb).astype(np.float64)
    if wb.size < 2 or np.any(wb[:2] <= 0):
        return None
    r, b = wb[0], wb[1]
    return np.array([1.0 / r, 1.0, 1.0 / b])


def _white_for_bits(bits: int | None, mosaic: np.ndarray) -> float:
    if bits and 2 <= bits <= 16:
        return float((1 << bits) - 1)
    mx = int(mosaic.max()) if mosaic.size else 0
    for cand in (4095, 16383, 65535):
        if mx <= cand:
            return float(cand)
    return 65535.0


def parse_cr2(data: bytes) -> RawImage | None:
    """Canon CR2 -> RawImage (mosaic + CFA + WB), or None."""
    from .. import native

    if not is_cr2(data):
        return None
    endian = "<"
    (raw_ifd_off,) = struct.unpack_from("<I", data, 12)
    raw_ifd, _ = _read_ifd(data, raw_ifd_off, endian)
    if not raw_ifd or _T_STRIP_OFFSETS not in raw_ifd:
        return None
    comp = int(_scalar(raw_ifd, _T_COMPRESSION, 0))
    if comp not in (6, 7):  # old-jpeg marker Canon uses for SOF3 / new
        return None
    offs = np.atleast_1d(raw_ifd[_T_STRIP_OFFSETS]).astype(np.int64)
    cnts = np.atleast_1d(raw_ifd.get(
        _T_STRIP_COUNTS, np.array([len(data)]))).astype(np.int64)
    stream = bytes(data[offs[0]:offs[0] + cnts[0]])
    decoded = native.lj92_decode(stream)
    if decoded is None:
        return None
    precision = _sof3_precision(stream)

    h = int(_scalar(raw_ifd, _T_LENGTH, decoded.shape[0]))
    w = int(_scalar(raw_ifd, _T_WIDTH, decoded.shape[1]))
    if decoded.size != h * w:
        # fall back to the stream's own geometry
        h, w = decoded.shape
    flat = decoded.reshape(-1)
    mosaic = np.zeros((h, w), dtype=np.uint16)
    slices = raw_ifd.get(_T_CR2_SLICES)
    if slices is not None and np.atleast_1d(slices).size == 3:
        # vertical slices: n full slices of width sw, then the last one;
        # the decoded sample sequence fills slice 0 top-to-bottom, then
        # slice 1, ... (Canon CR2 layout)
        n_s, sw, last = (int(x) for x in np.atleast_1d(slices))
        widths = [sw] * n_s + [last]
        if sum(widths) != w or any(x <= 0 for x in widths):
            return None
        pos = 0
        x0 = 0
        for ws in widths:
            count = h * ws
            if pos + count > flat.size:
                return None
            mosaic[:, x0:x0 + ws] = flat[pos:pos + count].reshape(h, ws)
            pos += count
            x0 += ws
    else:
        mosaic[:] = flat[:h * w].reshape(h, w)

    ifds = list(_all_ifds(data, endian, struct.unpack_from("<I", data,
                                                           4)[0]))
    ifd0 = ifds[0] if ifds else {}
    exif_ptr = ifd0.get(_T_EXIF_IFD)
    wb = None
    if exif_ptr is not None:
        try:
            wb = _canon_wb(data, endian, int(np.atleast_1d(exif_ptr)[0]))
        except Exception:
            wb = None
    return RawImage(
        mosaic=mosaic, cfa=_RGGB.copy(), black=0.0,
        white=_white_for_bits(precision, mosaic),
        as_shot_neutral=wb, color_matrix=None,
        orientation=int(_scalar(ifd0, _T_ORIENTATION, 1)))


def parse_tiff_cfa(data: bytes) -> RawImage | None:
    """Generic TIFF-EP raw (NEF/uncompressed ARW/PEF class): find the
    CFA-photometric IFD and decode its raster with the shared DNG
    machinery (strips/tiles, uncompressed or LJ92)."""
    endian = _tiff_endian(data)
    if endian is None:
        return None
    magic, first = struct.unpack_from(endian + "HI", data, 2)
    if magic != 42:
        return None
    ifds = list(_all_ifds(data, endian, first))
    if not ifds:
        return None
    ifd0 = ifds[0]
    raw_ifd = None
    for ifd in ifds:
        photo = _scalar(ifd, _T_PHOTOMETRIC)
        if photo is not None and int(photo) == _PHOTO_CFA:
            raw_ifd = ifd
            break
    if raw_ifd is None:
        return None
    mosaic = _raster(data, raw_ifd, endian)
    if mosaic is None:
        return None

    cfa = _RGGB.copy()
    pat = raw_ifd.get(_T_CFA_PATTERN)
    if pat is not None:
        p = np.atleast_1d(pat).astype(np.int32)
        if p.size >= 4:
            cfa = p[:4].reshape(2, 2)

    make = ifd0.get(_T_MAKE, b"")
    make = make.decode("ascii", "replace") if isinstance(make, bytes) \
        else str(make)
    wb = None
    exif_ptr = ifd0.get(_T_EXIF_IFD)
    if exif_ptr is not None and make.upper().startswith("NIKON"):
        try:
            wb = _nikon_wb(data, endian, int(np.atleast_1d(exif_ptr)[0]))
        except Exception:
            wb = None
    bits = int(_scalar(raw_ifd, _T_BITS, 16))
    return RawImage(
        mosaic=mosaic, cfa=cfa, black=0.0,
        white=_white_for_bits(bits, mosaic),
        as_shot_neutral=wb, color_matrix=None,
        orientation=int(_scalar(ifd0, _T_ORIENTATION, 1)))


def parse_raw_container(data: bytes) -> RawImage | None:
    """Dispatch: CR2 signature first, then generic TIFF-EP CFA (NEF,
    uncompressed ARW, ...).  DNG is handled by pipeline/dng.py."""
    if is_cr2(data):
        return parse_cr2(data)
    if _tiff_endian(data) is not None:
        return parse_tiff_cfa(data)
    return None


def decode_raw_container(data: bytes) -> np.ndarray | None:
    """Full native raw pipeline: parse -> TPU demosaic -> (H, W, 3) u8."""
    raw = parse_raw_container(data)
    if raw is None:
        return None
    from ..ops import demosaic
    return demosaic.process_raw(raw)
