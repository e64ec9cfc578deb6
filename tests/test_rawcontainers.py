"""CR2/NEF native decode: synthetic containers (encode-backed, like the
HEIF/DNG tests) through parse -> LJ92/packed raster -> TPU demosaic ->
pipeline grouping.  Reference behavior: gui/image.rs:1886-1945 (full
LibRaw decode with camera WB), raw_exif.rs:40-111."""
import struct

import numpy as np
import pytest

from rupphash_tpu import native
from rupphash_tpu.pipeline import decode, rawcontainers
from test_dng import _entry, lj92_encode

native_gated = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native library unavailable")


def _size(n_entries: int) -> int:
    return 2 + n_entries * 12 + 4


def _entry2(tag: int, text: str, extra: bytearray, base: int) -> bytes:
    """ASCII (type 2) entry for the shared test TIFF builder."""
    payload = text.encode() + b"\x00"
    if len(payload) <= 4:
        return struct.pack("<HHI4s", tag, 2, len(payload),
                           payload.ljust(4, b"\x00"))
    off = base + len(extra)
    extra.extend(payload)
    if len(extra) % 2:
        extra.append(0)
    return struct.pack("<HHII", tag, 2, len(payload), off)


def pack_bits(vals: np.ndarray, bits: int) -> bytes:
    """MSB-first bit packing (TIFF fill order 1) — the uncompressed
    NEF sensor layout."""
    v = vals.astype(np.int64)
    b = ((v[:, None] >> np.arange(bits - 1, -1, -1)) & 1).astype(np.uint8)
    return np.packbits(b.reshape(-1)).tobytes()


def write_cr2(mosaic: np.ndarray, wb=(2000, 1024, 1024, 1500),
              precision=14, colordata_len=1312, wb_offset=63) -> bytes:
    """Structurally correct minimal CR2: TIFF + 'CR\\x02' header pointing
    at the RAW IFD; sensor stored as one 2-component LJ92 stream in two
    vertical slices (tag 0xC640); Canon MakerNote ColorData WB."""
    h, w = mosaic.shape
    widths = [w // 2, w - w // 2]
    flat = np.concatenate([mosaic[:, :widths[0]].reshape(-1),
                           mosaic[:, widths[0]:].reshape(-1)])
    stream = lj92_encode(flat.reshape(h, w).astype(np.uint16),
                         predictor=1, precision=precision, components=2)
    cd = [0] * colordata_len
    if wb is not None:
        cd[wb_offset:wb_offset + 4] = list(wb)

    ifd0_off = 16
    exif_off = ifd0_off + _size(3)
    mn_off = exif_off + _size(1)
    raw_off = mn_off + _size(1)
    extra_off = raw_off + _size(6)

    def build(blob_off: int) -> bytes:
        extra = bytearray()
        ifd0 = (struct.pack("<H", 3)
                + _entry2(271, "Canon", extra, extra_off)
                + _entry(274, 3, [1], extra, extra_off)
                + _entry(34665, 4, [exif_off], extra, extra_off)
                + struct.pack("<I", 0))
        exif = (struct.pack("<H", 1)
                + struct.pack("<HHII", 37500, 7, _size(1), mn_off)
                + struct.pack("<I", 0))
        mn = (struct.pack("<H", 1)
              + _entry(0x4001, 3, cd, extra, extra_off)
              + struct.pack("<I", 0))
        raw = (struct.pack("<H", 6)
               + _entry(256, 4, [w], extra, extra_off)
               + _entry(257, 4, [h], extra, extra_off)
               + _entry(259, 3, [6], extra, extra_off)
               + _entry(273, 4, [blob_off], extra, extra_off)
               + _entry(279, 4, [len(stream)], extra, extra_off)
               + _entry(0xC640, 3, [1, widths[0], widths[1]],
                        extra, extra_off)
               + struct.pack("<I", 0))
        header = (struct.pack("<2sHI", b"II", 42, ifd0_off)
                  + b"CR" + bytes([2, 0]) + struct.pack("<I", raw_off))
        return header + ifd0 + exif + mn + raw + bytes(extra)

    head = build(0)
    head = build(len(head))
    return head + stream


def write_nef(mosaic: np.ndarray, bits=14, wb=(2.0, 1.4),
              cfa=(0, 1, 1, 2)) -> bytes:
    """Minimal NEF: TIFF-EP with a CFA SubIFD (uncompressed MSB-packed
    samples) and a Nikon MakerNote (embedded TIFF, WB_RBLevels 0x000C)."""
    h, w = mosaic.shape
    packed = pack_bits(mosaic.reshape(-1), bits)

    # embedded MakerNote TIFF
    mn_extra = bytearray()
    mn_base = 8 + _size(1)
    wb_vals = [(int(wb[0] * 1000), 1000), (int(wb[1] * 1000), 1000),
               (1, 1), (1, 1)]
    mn_ifd = (struct.pack("<H", 1)
              + _entry(0x000C, 5, wb_vals, mn_extra, mn_base)
              + struct.pack("<I", 0))
    mn_tiff = (struct.pack("<2sHI", b"II", 42, 8) + mn_ifd
               + bytes(mn_extra))
    makernote = b"Nikon\x00\x02\x10\x00\x00" + mn_tiff

    ifd0_off = 8
    exif_off = ifd0_off + _size(4)
    sub_off = exif_off + _size(1)
    extra_off = sub_off + _size(10)

    def build(mn_blob_off: int, data_off: int) -> bytes:
        extra = bytearray()
        ifd0 = (struct.pack("<H", 4)
                + _entry2(271, "NIKON CORPORATION", extra, extra_off)
                + _entry(274, 3, [1], extra, extra_off)
                + _entry(330, 4, [sub_off], extra, extra_off)
                + _entry(34665, 4, [exif_off], extra, extra_off)
                + struct.pack("<I", 0))
        exif = (struct.pack("<H", 1)
                + struct.pack("<HHII", 37500, 7, len(makernote),
                              mn_blob_off)
                + struct.pack("<I", 0))
        sub = (struct.pack("<H", 10)
               + _entry(256, 4, [w], extra, extra_off)
               + _entry(257, 4, [h], extra, extra_off)
               + _entry(258, 3, [bits], extra, extra_off)
               + _entry(259, 3, [1], extra, extra_off)
               + _entry(262, 3, [32803], extra, extra_off)
               + _entry(273, 4, [data_off], extra, extra_off)
               + _entry(278, 4, [h], extra, extra_off)
               + _entry(279, 4, [len(packed)], extra, extra_off)
               + _entry(33421, 3, [2, 2], extra, extra_off)
               + _entry(33422, 1, list(cfa), extra, extra_off)
               + struct.pack("<I", 0))
        header = struct.pack("<2sHI", b"II", 42, ifd0_off)
        return header + ifd0 + exif + sub + bytes(extra)

    head = build(0, 0)
    mn_blob_off = len(head)
    data_off = mn_blob_off + len(makernote)
    head = build(mn_blob_off, data_off)
    return head + makernote + packed


def _scene14(h=64, w=96, seed=5):
    """Textured sRGB scene + linear-light 14-bit RGGB mosaic."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (8, 12, 3), dtype=np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((w, h),
                                                  Image.BILINEAR))
    srgb = rgb.astype(np.float64) / 255.0
    lin = np.where(srgb <= 0.04045, srgb / 12.92,
                   ((srgb + 0.055) / 1.055) ** 2.4)
    mosaic = np.zeros((h, w), np.uint16)
    ch = np.array([[0, 1], [1, 2]])
    for dy in range(2):
        for dx in range(2):
            mosaic[dy::2, dx::2] = np.round(
                lin[dy::2, dx::2, ch[dy, dx]] * 16383.0).astype(np.uint16)
    return rgb, mosaic


# ------------------------------------------------------------------ CR2

@native_gated
def test_cr2_roundtrip_slices_and_wb():
    _, mosaic = _scene14()
    raw = rawcontainers.parse_cr2(write_cr2(mosaic))
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.white == 16383.0 and raw.black == 0.0
    assert np.array_equal(raw.cfa, [[0, 1], [1, 2]])
    # WB gains (2000, 1024, 1024, 1500) -> asn (g/r, 1, g/b)
    assert raw.as_shot_neutral is not None
    np.testing.assert_allclose(raw.as_shot_neutral,
                               [1024 / 2000, 1.0, 1024 / 1500], rtol=1e-6)


@native_gated
def test_cr2_colordata_variants():
    """WB word offset differs per ColorData version; plausibility
    selection must find it at 25 (ColorData1, 582 shorts) and at the
    71 fallback when offset 63 holds nothing plausible."""
    _, mosaic = _scene14(16, 16)
    # absent WB block -> no asn
    raw = rawcontainers.parse_cr2(
        write_cr2(mosaic, wb=None, colordata_len=582))
    assert raw is not None and raw.as_shot_neutral is None

    # ColorData1: WB at word offset 25
    raw = rawcontainers.parse_cr2(write_cr2(
        mosaic, wb=(1800, 1000, 1000, 1400), colordata_len=582,
        wb_offset=25))
    np.testing.assert_allclose(raw.as_shot_neutral,
                               [1000 / 1800, 1.0, 1000 / 1400],
                               rtol=1e-6)

    # newer ColorData: 63 empty, plausible levels at 71
    raw = rawcontainers.parse_cr2(write_cr2(
        mosaic, wb=(1800, 1000, 1000, 1400), colordata_len=1312,
        wb_offset=71))
    np.testing.assert_allclose(raw.as_shot_neutral,
                               [1000 / 1800, 1.0, 1000 / 1400],
                               rtol=1e-6)


@native_gated
def test_cr2_is_sniffed_not_dng():
    _, mosaic = _scene14(16, 16)
    data = write_cr2(mosaic)
    from rupphash_tpu.pipeline import dng
    assert rawcontainers.is_cr2(data)
    assert not dng.is_dng(data)
    assert not rawcontainers.is_cr2(b"II*\x00junk")


@native_gated
def test_cr2_demosaic_recovers_scene():
    rgb, mosaic = _scene14()
    out = rawcontainers.decode_raw_container(
        write_cr2(mosaic, wb=(1024, 1024, 1024, 1024)))
    assert out is not None and out.shape == rgb.shape
    diff = np.abs(out[4:-4, 4:-4].astype(int) - rgb[4:-4, 4:-4].astype(int))
    assert float(diff.mean()) < 3.0
    assert float(np.percentile(diff, 99)) < 30.0


# ------------------------------------------------------------------ NEF

def test_nef_roundtrip_packed14_and_wb():
    _, mosaic = _scene14()
    raw = rawcontainers.parse_raw_container(write_nef(mosaic, bits=14))
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.white == 16383.0
    assert np.array_equal(raw.cfa, [[0, 1], [1, 2]])
    np.testing.assert_allclose(raw.as_shot_neutral,
                               [1 / 2.0, 1.0, 1 / 1.4], rtol=1e-3)


def test_nef_packed12_and_cfa_variant():
    _, mosaic = _scene14(32, 32)
    mosaic = (mosaic >> 2).astype(np.uint16)  # 12-bit range
    data = write_nef(mosaic, bits=12, cfa=(2, 1, 1, 0))  # BGGR
    raw = rawcontainers.parse_raw_container(data)
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.white == 4095.0
    assert np.array_equal(raw.cfa, [[2, 1], [1, 0]])


def test_nef_demosaic_recovers_scene():
    rgb, mosaic = _scene14()
    out = rawcontainers.decode_raw_container(write_nef(mosaic))
    # neutral WB in the fixture is (1,1): use wb=(1.0, 1.0)
    out = rawcontainers.decode_raw_container(
        write_nef(mosaic, wb=(1.0, 1.0)))
    assert out is not None and out.shape == rgb.shape
    diff = np.abs(out[4:-4, 4:-4].astype(int) - rgb[4:-4, 4:-4].astype(int))
    assert float(diff.mean()) < 3.0


def test_nef_white_balance_applied():
    rgb, mosaic = _scene14()
    cam = mosaic.copy()
    cam[0::2, 0::2] = cam[0::2, 0::2] // 2  # red attenuated on sensor
    out = rawcontainers.decode_raw_container(
        write_nef(cam, wb=(2.0, 1.0)))
    ref = rawcontainers.decode_raw_container(
        write_nef(mosaic, wb=(1.0, 1.0)))
    diff = np.abs(out.astype(int) - ref.astype(int)).mean()
    assert diff < 2.0


# ------------------------------------------------------- pipeline + GUI

@native_gated
def test_cr2_nef_group_with_png_sibling(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic = _scene14(240, 320, seed=11)
    d = tmp_path / "s"
    d.mkdir()
    # neutral WB: the fixture sensor is unattenuated, so the physically
    # consistent camera WB is unity (matches the PNG sibling)
    (d / "shot.cr2").write_bytes(write_cr2(mosaic,
                                           wb=(1024, 1024, 1024, 1024)))
    (d / "shot2.nef").write_bytes(write_nef(mosaic, wb=(1.0, 1.0)))
    Image.fromarray(rgb).save(d / "twin.png")

    arr, res = decode.load_image(d / "shot.cr2")
    assert arr is not None and res == (320, 240)
    arr, res = decode.load_image(d / "shot2.nef")
    assert arr is not None and res == (320, 240)

    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == \
        {"shot.cr2", "shot2.nef", "twin.png"}


@native_gated
def test_cr2_views_in_gui_engine(tmp_path):
    """The viewer path (gui/imaging.ImageEngine) full-decodes a CR2
    (gui/image.rs:1886-1945 parity)."""
    from rupphash_tpu.gui import imaging

    rgb, mosaic = _scene14(64, 96)
    p = tmp_path / "view.cr2"
    p.write_bytes(write_cr2(mosaic))
    eng = imaging.ImageEngine()
    out = eng.render(p)
    assert out is not None and out[:2] == b"\xff\xd8"  # JPEG bytes


def test_sniff_decode_bytes_nef():
    """Serving path: raw bytes with no filename decode via sniffing."""
    rgb, mosaic = _scene14(48, 64)
    img = decode.sniff_decode_bytes(write_nef(mosaic, wb=(1.0, 1.0)))
    assert img is not None and img.shape == rgb.shape
