"""Canon CR3 container (ISOBMFF) parse + CRX raw decode.

The reference decodes CR3 through LibRaw's crx implementation for its
viewer (gui/image.rs:1839-1962; `cr3` in the RAW list scanner.rs:43-46)
and hashes the embedded preview JPEG (scanner.rs:1353-1380).  This
module provides both paths natively:

* **Container** (documented ISOBMFF layout, followed faithfully):
  `ftyp`/`moov` box walk; the Canon metadata uuid
  85c0b687-820f-11e0-8111-f4ce462b6a48 holding `CNCV` (codec version
  string) and `CMT1`..`CMT4` (bare TIFF blobs: IFD0, Exif IFD,
  MakerNote, GPS); `trak` sample tables (`stsd`/`stsz`/`co64`/`stco`)
  locating each track's samples in `mdat`; `CRAW` sample entries with
  their `CMP1` compression-parameter box; `THMB` thumbnail.  The
  largest JPEG track sample is the preview (the reference's hashing
  source); the `CMP1`-bearing track is the raw.
* **Codec**: per-CFA-plane MED (LOCO-I) prediction + adaptive
  Golomb-Rice residuals — the CRX lossless family (wavelet levels 0) —
  via native/ruppnative.cpp `crx_decode_plane` with the pure-Python
  oracle below.  The entropy layer is a self-consistent implementation
  of the published algorithm family, validated by encoder-roundtrip
  and C++/Python differential tests (the NEF-34713 pattern); byte
  compatibility with LibRaw's bitstream cannot be verified in this
  image (no real CR3 fixture is available) — real files whose raw
  track fails to decode fall back to their embedded preview, exactly
  the reference's hashing behavior.

WB comes from the CMT3 MakerNote ColorData block (same tag 0x4001
layout the CR2 path uses); orientation from CMT1.
"""
from __future__ import annotations

import struct

import numpy as np

from .dng import RawImage, _T_ORIENTATION, _read_ifd, _scalar
from .rawcontainers import _RGGB, _white_for_bits

CANON_UUID = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")


def is_cr3(data: bytes) -> bool:
    """ISOBMFF whose ftyp major brand is 'crx '."""
    return (len(data) >= 16 and data[4:8] == b"ftyp"
            and data[8:12] == b"crx ")


# ------------------------------------------------------------------ boxes

def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); handles 64-bit largesize boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = bytes(data[pos + 4:pos + 8])
        payload = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            payload = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, payload, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """First box matching the type path, as (payload_start, payload_end)."""
    for btype, p0, p1 in _walk_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return p0, p1
            return _find_box(data, p0, p1, path[1:])
    return None


# ------------------------------------------------------------------ codec

from .rawcontainers import _MsbBits  # noqa: E402  (shared bit reader)

ESCAPE_Q = 20
RESET_N = 64


def crx_decode_plane_py(data: bytes, width: int, height: int,
                        nbits: int) -> np.ndarray | None:
    """Pure-Python oracle for ruppnative.cpp crx_decode_plane."""
    bits = _MsbBits(data)
    out = np.zeros((height, width), np.uint16)
    A, N = 4, 1
    for row in range(height):
        orow = out[row]
        prow = out[row - 1] if row else None
        for col in range(width):
            a = int(orow[col - 1]) if col else 0
            if row == 0:
                pred = a if col else 0
            elif col == 0:
                pred = int(prow[0])
            else:
                b = int(prow[col])
                c = int(prow[col - 1])
                mx, mn = (a, b) if a > b else (b, a)
                if c >= mx:
                    pred = mn
                elif c <= mn:
                    pred = mx
                else:
                    pred = a + b - c
            k = 0
            while (N << k) < A and k < 15:
                k += 1
            q = 0
            while q <= ESCAPE_Q and bits.get(1) == 0:
                q += 1
            if q > ESCAPE_Q:
                return None
            if q == ESCAPE_Q:
                u = bits.get(nbits + 2)
            else:
                u = (q << k) | bits.get(k)
            err = -((u + 1) >> 1) if u & 1 else u >> 1
            orow[col] = (pred + err) & 0xFFFF
            A += u
            N += 1
            if N == RESET_N:
                A >>= 1
                N >>= 1
    return out


# --------------------------------------------------------------- container

def _parse_cmp1(payload: bytes) -> dict | None:
    """CMP1 compression parameters (version, dims, tile dims, sample
    bits, plane count/CFA layout, encoding type, wavelet levels,
    mdat-header size)."""
    if len(payload) < 24:
        return None
    # skip the 4-byte box version/flags prefix ISOBMFF full boxes carry
    off = 4
    try:
        ver, _res = struct.unpack_from(">HH", payload, off)
        fw, fh, tw, th = struct.unpack_from(">4I", payload, off + 4)
        nbits = payload[off + 20]
        pl = payload[off + 21]
        et = payload[off + 22]
        nplanes, cfa = pl >> 4, pl & 15
        enc_type, levels = et >> 4, et & 15
        (mdat_hdr,) = struct.unpack_from(">I", payload, off + 24)
    except (struct.error, IndexError):
        return None
    if not (4 <= fw <= 65535 and 4 <= fh <= 65535):
        return None
    return {"version": ver, "f_width": fw, "f_height": fh,
            "tile_width": tw, "tile_height": th, "nbits": nbits,
            "nplanes": nplanes, "cfa_layout": cfa,
            "enc_type": enc_type, "levels": levels,
            "mdat_hdr_size": mdat_hdr}


def _track_info(data: bytes, trak_p0: int, trak_p1: int):
    """(sample_entry_type, cmp1|None, [(offset, size), ...])."""
    stbl = _find_box(data, trak_p0, trak_p1,
                     [b"mdia", b"minf", b"stbl"])
    if stbl is None:
        return None
    s0, s1 = stbl
    stsd = _find_box(data, s0, s1, [b"stsd"])
    if stsd is None:
        return None
    d0, d1 = stsd
    # full box: version/flags + entry count, then the first entry
    entry_type = None
    cmp1 = None
    if d1 - d0 >= 16:
        (count,) = struct.unpack_from(">I", data, d0 + 4)
        if count >= 1:
            (esize,) = struct.unpack_from(">I", data, d0 + 8)
            entry_type = bytes(data[d0 + 12:d0 + 16])
            e_end = min(d0 + 8 + esize, d1)
            # CRAW entries: 78 bytes of sample-entry fields, then
            # child boxes (CMP1, CDI1, ...) — scan for CMP1
            for off in range(d0 + 16, max(d0 + 16, e_end - 8)):
                if data[off + 4:off + 8] == b"CMP1":
                    (bsz,) = struct.unpack_from(">I", data, off)
                    if 8 <= bsz <= e_end - off:
                        cmp1 = _parse_cmp1(
                            bytes(data[off + 8:off + bsz]))
                        break
    sizes = []
    stsz = _find_box(data, s0, s1, [b"stsz"])
    if stsz is not None:
        z0, _ = stsz
        fixed, cnt = struct.unpack_from(">II", data, z0 + 4)
        if fixed:
            sizes = [fixed] * cnt
        else:
            sizes = list(struct.unpack_from(f">{cnt}I", data, z0 + 12))
    offs = []
    co = _find_box(data, s0, s1, [b"co64"])
    if co is not None:
        c0, _ = co
        (cnt,) = struct.unpack_from(">I", data, c0 + 4)
        offs = list(struct.unpack_from(f">{cnt}Q", data, c0 + 8))
    else:
        co = _find_box(data, s0, s1, [b"stco"])
        if co is not None:
            c0, _ = co
            (cnt,) = struct.unpack_from(">I", data, c0 + 4)
            offs = list(struct.unpack_from(f">{cnt}I", data, c0 + 8))
    return entry_type, cmp1, list(zip(offs, sizes))


def parse_cr3(data: bytes):
    """CR3 -> {"preview": bytes|None, "raw": RawImage|None,
    "cmt1": dict, "cncv": str}."""
    if not is_cr3(data):
        return None
    out = {"preview": None, "raw": None, "cmt1": {}, "cncv": ""}
    moov = _find_box(data, 0, len(data), [b"moov"])
    if moov is None:
        return out
    m0, m1 = moov
    cmt = {}
    for btype, p0, p1 in _walk_boxes(data, m0, m1):
        if btype == b"uuid" and data[p0:p0 + 16] == CANON_UUID:
            for bt2, q0, q1 in _walk_boxes(data, p0 + 16, p1):
                if bt2 == b"CNCV":
                    out["cncv"] = bytes(data[q0:q1]).decode(
                        "ascii", "replace")
                elif bt2 in (b"CMT1", b"CMT2", b"CMT3", b"CMT4"):
                    cmt[bt2.decode()] = bytes(data[q0:q1])

    ori = 1
    cmt1 = cmt.get("CMT1")
    if cmt1 and cmt1[:2] in (b"II", b"MM"):
        endian = "<" if cmt1[:2] == b"II" else ">"
        (first,) = struct.unpack_from(endian + "I", cmt1, 4)
        ifd0, _ = _read_ifd(cmt1, first, endian)
        out["cmt1"] = ifd0
        ori = int(_scalar(ifd0, _T_ORIENTATION, 1))

    wb = None
    cmt3 = cmt.get("CMT3")
    if cmt3 and cmt3[:2] in (b"II", b"MM"):
        # CMT3 is a bare TIFF whose IFD0 *is* the MakerNote (ColorData
        # tag 0x4001) — reuse the CR2 WB extraction by pointing it at a
        # synthetic EXIF IFD layout
        try:
            endian = "<" if cmt3[:2] == b"II" else ">"
            (first,) = struct.unpack_from(endian + "I", cmt3, 4)
            mn_ifd, _ = _read_ifd(cmt3, first, endian)
            from .rawcontainers import (_T_CANON_COLORDATA,
                                        wb_from_colordata)
            wb = wb_from_colordata(mn_ifd.get(_T_CANON_COLORDATA))
        except Exception:
            wb = None

    # tracks: biggest JPEG sample = preview; CMP1 track = raw
    best_jpeg = 0
    raw_track = None
    for btype, p0, p1 in _walk_boxes(data, m0, m1):
        if btype != b"trak":
            continue
        info = _track_info(data, p0, p1)
        if info is None:
            continue
        entry_type, cmp1, samples = info
        for off, size in samples:
            if off + 2 <= len(data) and data[off:off + 2] == b"\xff\xd8" \
                    and size > best_jpeg:
                best_jpeg = size
                out["preview"] = bytes(data[off:off + size])
        if cmp1 is not None and samples:
            raw_track = (cmp1, samples[0])

    if raw_track is not None:
        try:
            out["raw"] = _decode_raw_track(data, raw_track, wb, ori)
        except Exception:
            out["raw"] = None
    return out


def _decode_raw_track(data: bytes, raw_track, wb, orientation):
    from .. import native

    cmp1, (off, size) = raw_track
    if off + size > len(data) or cmp1["enc_type"] != 0 \
            or cmp1["levels"] != 0:
        return None   # lossy/wavelet crx: preview fallback
    fw, fh = cmp1["f_width"], cmp1["f_height"]
    nbits = cmp1["nbits"]
    nplanes = cmp1["nplanes"]
    if nplanes != 4 or fw % 2 or fh % 2:
        return None
    sample = bytes(data[off:off + size])
    hdr = sample[:cmp1["mdat_hdr_size"]]
    # plane sizes from the 0xff02 entries of the mdat tile header
    plane_sizes = []
    p = 0
    while p + 12 <= len(hdr):
        (tag,) = struct.unpack_from(">H", hdr, p)
        if tag == 0xFF02:
            (psz,) = struct.unpack_from(">I", hdr, p + 4)
            plane_sizes.append(psz)
            p += 12
        elif tag in (0xFF01, 0xFF03):
            p += 12
        else:
            p += 2
    if len(plane_sizes) != nplanes:
        return None
    body = sample[cmp1["mdat_hdr_size"]:]
    pw, ph = fw // 2, fh // 2
    planes = []
    pos = 0
    for psz in plane_sizes:
        blob = body[pos:pos + psz]
        pos += psz
        pl = native.crx_decode_plane(blob, pw, ph, nbits)
        if pl is None:
            pl = crx_decode_plane_py(blob, pw, ph, nbits)
        if pl is None:
            return None
        planes.append(pl)
    mosaic = np.zeros((fh, fw), np.uint16)
    # plane order R, G1, G2, B onto the RGGB grid
    mosaic[0::2, 0::2] = planes[0]
    mosaic[0::2, 1::2] = planes[1]
    mosaic[1::2, 0::2] = planes[2]
    mosaic[1::2, 1::2] = planes[3]
    return RawImage(mosaic=mosaic, cfa=_RGGB.copy(), black=0.0,
                    white=_white_for_bits(nbits, mosaic),
                    as_shot_neutral=wb, color_matrix=None,
                    orientation=orientation)


def decode_cr3(data: bytes, prefer_full_raw: bool = False):
    """CR3 bytes -> (H, W, 3) u8 or None: preview first (the
    reference's hashing source), full raw decode when preview-less or
    explicitly preferred."""
    parsed = parse_cr3(data)
    if parsed is None:
        return None

    def _full():
        if parsed["raw"] is None:
            return None
        from ..ops import demosaic
        return demosaic.process_raw(parsed["raw"])

    def _preview():
        if not parsed["preview"]:
            return None
        from . import decode as decmod
        return decmod.decode_bytes(parsed["preview"])

    if prefer_full_raw:
        img = _full()
        return img if img is not None else _preview()
    img = _preview()
    return img if img is not None else _full()
