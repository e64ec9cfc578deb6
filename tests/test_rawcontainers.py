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
              cfa=(0, 1, 1, 2), compression=1, lin_table=None,
              stream=None) -> bytes:
    """Minimal NEF: TIFF-EP with a CFA SubIFD and a Nikon MakerNote
    (embedded TIFF, WB_RBLevels 0x000C).  compression=1 stores the
    mosaic as uncompressed MSB-packed samples; compression=34713 stores
    `stream` (a nef_huff_encode bitstream) and embeds `lin_table` as
    MakerNote tag 0x0096."""
    h, w = mosaic.shape
    if compression == 34713:
        assert stream is not None and lin_table is not None
        packed = stream
    else:
        packed = pack_bits(mosaic.reshape(-1), bits)

    # embedded MakerNote TIFF
    n_mn = 1 if lin_table is None else 2
    mn_extra = bytearray()
    mn_base = 8 + _size(n_mn)
    wb_vals = [(int(wb[0] * 1000), 1000), (int(wb[1] * 1000), 1000),
               (1, 1), (1, 1)]
    entries = _entry(0x000C, 5, wb_vals, mn_extra, mn_base)
    if lin_table is not None:
        entries += _entry(0x0096, 1, list(lin_table), mn_extra, mn_base)
    mn_ifd = (struct.pack("<H", n_mn) + entries + struct.pack("<I", 0))
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
               + _entry(259, 3, [compression], extra, extra_off)
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
    # neutral WB: the fixture sensor is unattenuated
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


# --------------------------------------------- NEF compression 34713

def _huff_inverse(tree: int) -> dict:
    inv = {}
    for (length, code), v in rawcontainers.nikon_huff_codes(tree).items():
        inv.setdefault(v, (length, code))
    return inv


def nef_huff_encode(vals: np.ndarray, tree: int, vpred, split=0) -> bytes:
    """Synthetic Nikon-34713 encoder (plain ssss leaves only): the
    inverse of ruppnative nef_decode for diffs whose magnitude category
    exists as an unshifted leaf in the tree."""
    cur = _huff_inverse(tree)
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(nbits: int, value: int):
        nonlocal acc, nacc
        acc = (acc << nbits) | (value & ((1 << nbits) - 1))
        nacc += nbits
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8
            acc &= (1 << nacc) - 1

    vp = [[int(vpred[0]), int(vpred[1])], [int(vpred[2]), int(vpred[3])]]
    hp = [0, 0]
    h, w = vals.shape
    for row in range(h):
        if split and row == split:
            cur = _huff_inverse(tree + 1)
        for col in range(w):
            target = int(vals[row, col]) & 0xFFFF
            pred = vp[row & 1][col] if col < 2 else hp[col & 1]
            diff = ((target - pred + 0x8000) & 0xFFFF) - 0x8000
            ssss = diff.bit_length() if diff >= 0 else (-diff).bit_length()
            assert ssss in cur, f"ssss={ssss} has no plain leaf here"
            length, code = cur[ssss]
            emit(length, code)
            if ssss:
                b = diff if diff > 0 else diff + (1 << ssss) - 1
                emit(ssss, b)
            if col < 2:
                vp[row & 1][col] = target
                hp[col] = target
            else:
                hp[col & 1] = target
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def nikon_lin_block(ver=(0x46, 0x30), vpred=(600, 600, 600, 600),
                    csize=1, curve_pts=None, split=None) -> bytes:
    """A MakerNote 0x0096 linearization block (little-endian fields)."""
    out = bytearray(bytes(ver))
    for v in vpred:
        out += struct.pack("<H", v)
    out += struct.pack("<H", csize)
    if curve_pts is not None:
        for v in curve_pts:
            out += struct.pack("<H", v)
    if split is not None:
        while len(out) < 562:
            out.append(0)
        out += struct.pack("<H", split)
        out += b"\x00\x00"
    return bytes(out)


@native_gated
def test_nef34713_cpp_matches_python_random_streams():
    """Differential oracle: the C++ and Python decoders agree bit-for-
    bit on arbitrary streams for every tree (incl. shifted lossy
    leaves), arbitrary curve LUTs and vpred seeds."""
    rng = np.random.default_rng(7)
    for tree in range(6):
        stream = rng.integers(0, 256, 220, dtype=np.uint8).tobytes()
        curve = rng.integers(0, 65536, 0x4000).astype(np.uint16)
        vpred = rng.integers(200, 2000, 4).astype(np.uint16)
        a = native.nef_huff_decode(stream, vpred, curve, 16, 8, tree)
        b = rawcontainers._nef_decode_py(stream, vpred, curve, 16, 8,
                                         tree)
        assert a is not None and b is not None
        assert np.array_equal(a, b), f"tree {tree} diverged"


@native_gated
def test_nef34713_split_tree_switch_matches_python():
    rng = np.random.default_rng(8)
    for tree in (0, 3):
        stream = rng.integers(0, 256, 400, dtype=np.uint8).tobytes()
        curve = np.arange(0x4000, dtype=np.uint16)
        vpred = np.array([700, 700, 700, 700], dtype=np.uint16)
        a = native.nef_huff_decode(stream, vpred, curve, 16, 10, tree,
                                   split=5)
        b = rawcontainers._nef_decode_py(stream, vpred, curve, 16, 10,
                                         tree, split=5)
        assert a is not None and np.array_equal(a, b)
        # and the split genuinely changes the decode
        c = native.nef_huff_decode(stream, vpred, curve, 16, 10, tree)
        assert not np.array_equal(a, c)


def test_nef34713_lossless_roundtrip_12_and_14():
    """Encode -> decode is exact for the lossless trees (identity
    curve, full 12/14-bit range)."""
    rng = np.random.default_rng(9)
    for bits, tree in ((12, 2), (14, 5)):
        vals = rng.integers(0, 1 << bits, (12, 20)).astype(np.uint16)
        vpred = (512, 512, 512, 512)
        stream = nef_huff_encode(vals, tree, vpred)
        curve = np.arange(0x4000, dtype=np.uint16)
        vp = np.asarray(vpred, dtype=np.uint16)
        if native.get_lib() is not None:
            got = native.nef_huff_decode(stream, vp, curve, 20, 12,
                                         tree)
            # a None here is a NATIVE regression, not a missing lib —
            # falling back would mask it
            assert got is not None
        else:
            got = rawcontainers._nef_decode_py(stream, vp, curve, 20,
                                               12, tree)
        assert np.array_equal(got, vals)


def test_parse_nikon_linearization_lossy_curve_and_split():
    """ver 0x44/0x20: sparse anchors integer-interpolate; the split row
    is read at block offset 562 (dcraw/LibRaw layout)."""
    bps = 12
    csize = 17
    step = (1 << bps) // (csize - 1)  # 256
    pts = [min(i * i * 16, 65535) for i in range(csize)]
    meta = nikon_lin_block(ver=(0x44, 0x20), vpred=(100, 200, 300, 400),
                           csize=csize, curve_pts=pts, split=37)
    parsed = rawcontainers.parse_nikon_linearization(meta, "<", bps)
    assert parsed is not None
    vpred, lut, tree, split = parsed
    assert list(vpred) == [100, 200, 300, 400]
    assert tree == 0 and split == 37
    # anchors hit exactly; midpoints follow the integer lerp
    for i in range(csize - 1):
        assert lut[i * step] == pts[i]
    i = 3 * step + 100
    expect = (pts[3] * (step - 100) + pts[4] * 100) // step
    assert lut[i] == expect
    # beyond the curve the LUT continues as identity
    assert lut[0x3FFF] == 0x3FFF


def test_parse_nikon_linearization_lossless_identity():
    meta = nikon_lin_block(ver=(0x46, 0x30), vpred=(1, 2, 3, 4))
    vpred, lut, tree, split = rawcontainers.parse_nikon_linearization(
        meta, "<", 14)
    assert tree == 5 and split == 0
    assert np.array_equal(lut, np.arange(0x4000, dtype=np.uint16))


def test_nef34713_full_container_roundtrip_and_wb():
    """A compressed NEF parses end-to-end: Huffman strip + MakerNote
    0x0096 + WB, mosaic exact (lossless tree, identity curve)."""
    rng = np.random.default_rng(10)
    vals = rng.integers(0, 4096, (24, 32)).astype(np.uint16)
    vpred = (800, 800, 800, 800)
    stream = nef_huff_encode(vals, 2, vpred)
    lin = nikon_lin_block(ver=(0x46, 0x30), vpred=vpred)
    data = write_nef(vals, bits=12, wb=(2.0, 1.25), compression=34713,
                     lin_table=lin, stream=stream)
    raw = rawcontainers.parse_raw_container(data)
    assert raw is not None
    assert np.array_equal(raw.mosaic, vals)
    assert raw.white == 4095.0
    np.testing.assert_allclose(raw.as_shot_neutral,
                               [1 / 2.0, 1.0, 1 / 1.25], rtol=1e-3)


def test_nef34713_lossy_split_container():
    """Lossy container: identity anchors + split row exercise the
    tree-switch inside a full parse (diffs kept plain-encodable)."""
    bps = 12
    csize = 17
    step = (1 << bps) // (csize - 1)
    pts = [i * step for i in range(csize)]  # identity anchors
    rng = np.random.default_rng(11)
    # smooth image: horizontal diffs bounded by the per-column base
    # spread, vertical by two rows of shared drift — ssss<=5 stays
    # plain-encodable in both tree 0 and split tree 1
    base = rng.integers(900, 931, (1, 24)).astype(np.int64)
    drift = rng.integers(-15, 16, (16, 1)).astype(np.int64)
    vals = np.clip(base + np.cumsum(drift, axis=0), 0, 4095)
    vals = vals.astype(np.uint16)
    vpred = (900, 900, 900, 900)
    split = 6
    stream = nef_huff_encode(vals, 0, vpred, split=split)
    lin = nikon_lin_block(ver=(0x44, 0x20), vpred=vpred, csize=csize,
                          curve_pts=pts, split=split)
    data = write_nef(vals, bits=12, compression=34713, lin_table=lin,
                     stream=stream)
    raw = rawcontainers.parse_raw_container(data)
    assert raw is not None
    assert np.array_equal(raw.mosaic, vals)


def test_nef34713_groups_with_png_sibling(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic14 = _scene14(96, 128, seed=13)
    vals = (mosaic14 >> 2).astype(np.uint16)  # 12-bit sensor
    vpred = (512, 512, 512, 512)
    stream = nef_huff_encode(vals, 2, vpred)
    lin = nikon_lin_block(ver=(0x46, 0x30), vpred=vpred)
    d = tmp_path / "s"
    d.mkdir()
    (d / "shot.nef").write_bytes(write_nef(
        vals, bits=12, wb=(1.0, 1.0), compression=34713, lin_table=lin,
        stream=stream))
    Image.fromarray(rgb).save(d / "twin.png")
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"shot.nef", "twin.png"}


# ------------------------------------------------------------ Sony ARW

def arw2_encode_block(p: list) -> bytes:
    """Inverse of ruppnative arw2_decode for one 16-pixel block (11-bit
    inputs; deltas quantize by the derived shift, exact when
    max-min < 0x80)."""
    mx, mn = max(p), min(p)
    imax = p.index(mx)
    imin = p.index(mn)
    if imin == imax:
        imin = (imax + 1) % 16
    sh = 0
    while sh < 4 and (0x80 << sh) <= mx - mn:
        sh += 1
    blob = mx | (mn << 11) | (imax << 22) | (imin << 26)
    bit = 30
    for i in range(16):
        if i == imax or i == imin:
            continue
        blob |= min((p[i] - mn) >> sh, 0x7F) << bit
        bit += 7
    return blob.to_bytes(16, "little")


def arw2_encode(vals: np.ndarray) -> bytes:
    h, w = vals.shape
    assert w % 32 == 0
    out = bytearray()
    for row in range(h):
        for base in range(0, w, 32):
            for par in (0, 1):
                out += arw2_encode_block(
                    [int(x) for x in vals[row, base + par:base + 32:2]])
    return bytes(out)


def write_arw(vals11: np.ndarray, knees=(0, 0, 0, 0),
              black=(512, 512, 512, 512),
              wb=(2200, 1024, 1024, 1700), key=0x12345678,
              cfa=(0, 1, 1, 2)) -> bytes:
    """Minimal ARW: TIFF with a CFA SubIFD (compression 32767, ARW2
    1-byte/px blocks) and an encrypted SR2 private block carrying the
    tone-curve knees (0x7010), black level (0x7310) and WB (0x7313)."""
    h, w = vals11.shape
    stream = arw2_encode(vals11)

    ifd0_off = 8
    sub_off = ifd0_off + _size(6)
    sr2_off = sub_off + _size(10)

    # SR2 private IFD: value offsets are absolute file offsets
    sr2_base = sr2_off + _size(3)
    sr2_extra = bytearray()
    sr2_ifd = (struct.pack("<H", 3)
               + _entry(0x7010, 3, [k << 2 for k in knees], sr2_extra,
                        sr2_base)
               + _entry(0x7310, 3, list(black), sr2_extra, sr2_base)
               + _entry(0x7313, 3, list(wb), sr2_extra, sr2_base)
               + struct.pack("<I", 0))
    sr2_plain = sr2_ifd + bytes(sr2_extra)
    if len(sr2_plain) % 4:
        sr2_plain += b"\x00" * (4 - len(sr2_plain) % 4)
    sr2_enc = rawcontainers.sony_decrypt(sr2_plain, key)  # XOR symmetric
    data_off = sr2_off + len(sr2_enc)

    extra_off = data_off + len(stream)

    def build() -> bytes:
        extra = bytearray()
        ifd0 = (struct.pack("<H", 6)
                + _entry2(271, "SONY", extra, extra_off)
                + _entry(274, 3, [1], extra, extra_off)
                + _entry(330, 4, [sub_off], extra, extra_off)
                + _entry(0x7200, 4, [sr2_off], extra, extra_off)
                + _entry(0x7201, 4, [len(sr2_enc)], extra, extra_off)
                + _entry(0x7221, 4, [key], extra, extra_off)
                + struct.pack("<I", 0))
        sub = (struct.pack("<H", 10)
               + _entry(256, 4, [w], extra, extra_off)
               + _entry(257, 4, [h], extra, extra_off)
               + _entry(258, 3, [8], extra, extra_off)
               + _entry(259, 3, [32767], extra, extra_off)
               + _entry(262, 3, [32803], extra, extra_off)
               + _entry(273, 4, [data_off], extra, extra_off)
               + _entry(278, 4, [h], extra, extra_off)
               + _entry(279, 4, [len(stream)], extra, extra_off)
               + _entry(33421, 3, [2, 2], extra, extra_off)
               + _entry(33422, 1, list(cfa), extra, extra_off)
               + struct.pack("<I", 0))
        header = struct.pack("<2sHI", b"II", 42, ifd0_off)
        return header + ifd0 + sub + sr2_enc + stream + bytes(extra)

    return build()


def test_sony_decrypt_is_involution():
    rng = np.random.default_rng(14)
    buf = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
    enc = rawcontainers.sony_decrypt(buf, 0xDEADBEEF)
    assert enc != buf
    assert rawcontainers.sony_decrypt(enc, 0xDEADBEEF) == buf
    # trailing non-word bytes pass through untouched
    buf2 = buf + b"\x07\x08\x09"
    enc2 = rawcontainers.sony_decrypt(buf2, 1)
    assert enc2[-3:] == b"\x07\x08\x09"


def test_sony_curve_lut_segments():
    """Knees (a,b,c,d) give slopes 1,2,4,8,16 across the segments."""
    lut = rawcontainers.sony_curve_lut(
        np.array([100 << 2, 200 << 2, 400 << 2, 800 << 2]))
    assert lut[0] == 0
    assert lut[100] == 100                      # slope 1
    assert lut[200] == 100 + 100 * 2            # slope 2
    assert lut[400] == 300 + 200 * 4            # slope 4
    assert lut[800] == 1100 + 400 * 8           # slope 8
    assert lut[4095] == 4300 + (4095 - 800) * 16  # slope 16
    # default: single slope-16 ramp
    d = rawcontainers.sony_curve_lut(None)
    assert d[1] == 16 and d[4095] == 4095 * 16


@native_gated
def test_arw2_cpp_matches_python_random_streams():
    rng = np.random.default_rng(15)
    curve = rng.integers(0, 65536, 0x1000).astype(np.uint16)
    stream = rng.integers(0, 256, 64 * 6, dtype=np.uint8).tobytes()
    a = native.arw2_decode(stream, curve, 64, 6)
    b = rawcontainers._arw2_decode_py(stream, curve, 64, 6)
    assert a is not None and b is not None
    assert np.array_equal(a, b)


def test_arw2_exact_roundtrip_small_range():
    """Blocks whose max-min < 0x80 carry unshifted deltas: encode ->
    decode is exact through a known curve."""
    rng = np.random.default_rng(16)
    vals = rng.integers(900, 1023, (6, 64)).astype(np.int64)
    stream = arw2_encode(vals)
    curve = rawcontainers.sony_curve_lut(None)  # slope 16 -> out = 8*pix
    if native.get_lib() is not None:
        got = native.arw2_decode(stream, curve, 64, 6)
        assert got is not None  # None would be a native regression
    else:
        got = rawcontainers._arw2_decode_py(stream, curve, 64, 6)
    assert np.array_equal(got, (vals * 8).astype(np.uint16))


def test_arw_full_container_parse():
    rng = np.random.default_rng(17)
    vals = rng.integers(600, 727, (8, 64)).astype(np.int64)
    data = write_arw(vals)
    raw = rawcontainers.parse_raw_container(data)
    assert raw is not None
    assert np.array_equal(raw.mosaic, (vals * 8).astype(np.uint16))
    assert raw.black == 512.0
    assert raw.white == float((0x7FF << 1) * 16 >> 2)
    np.testing.assert_allclose(raw.as_shot_neutral,
                               [1024 / 2200, 1.0, 1024 / 1700], rtol=1e-6)


def test_arw_demosaic_and_group_with_png(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic14 = _scene14(96, 128, seed=18)
    vals = (mosaic14 >> 3).astype(np.int64)  # 11-bit sensor
    d = tmp_path / "s"
    d.mkdir()
    (d / "shot.arw").write_bytes(write_arw(
        vals, black=(0, 0, 0, 0), wb=(1024, 1024, 1024, 1024)))
    Image.fromarray(rgb).save(d / "twin.png")

    arr, res = decode.load_image(d / "shot.arw")
    assert arr is not None and res == (128, 96)

    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"shot.arw", "twin.png"}


def write_arw4(mosaic: np.ndarray, bits: int = 14,
               black=(512, 512, 512, 512),
               wb=(2200, 1024, 1024, 1700), key=0x12345678,
               strips: int = 1, tiled: bool = False) -> bytes:
    """Minimal Sony lossless ARW (ARW4 class): TIFF with a CFA SubIFD
    (Compression 7) whose strip is a standard LJ92 stream of half-res
    4-component 2x2 Bayer quads, plus the encrypted SR2 private block
    (black 0x7310, WB 0x7313).  `strips` splits the quad rows into
    independent LJ92 streams (standard TIFF strip semantics);
    `tiled=True` stores the stream under TileOffsets/TileByteCounts
    instead — a layout the decoder must fail closed on."""
    h, w = mosaic.shape
    assert h % 2 == 0 and w % 2 == 0
    quad = np.stack([mosaic[0::2, 0::2], mosaic[0::2, 1::2],
                     mosaic[1::2, 0::2], mosaic[1::2, 1::2]],
                    axis=-1)
    qrows = quad.reshape(h // 2, (w // 2) * 4).astype(np.uint16)
    assert (h // 2) % strips == 0
    per = (h // 2) // strips
    streams = [lj92_encode(qrows[i * per:(i + 1) * per],
                           precision=bits, components=4)
               for i in range(strips)]
    stream = b"".join(streams)

    ifd0_off = 8
    sub_off = ifd0_off + _size(6)
    sr2_off = sub_off + _size(10)
    sr2_base = sr2_off + _size(2)
    sr2_extra = bytearray()
    sr2_ifd = (struct.pack("<H", 2)
               + _entry(0x7310, 3, list(black), sr2_extra, sr2_base)
               + _entry(0x7313, 3, list(wb), sr2_extra, sr2_base)
               + struct.pack("<I", 0))
    sr2_plain = sr2_ifd + bytes(sr2_extra)
    if len(sr2_plain) % 4:
        sr2_plain += b"\x00" * (4 - len(sr2_plain) % 4)
    sr2_enc = rawcontainers.sony_decrypt(sr2_plain, key)
    data_off = sr2_off + len(sr2_enc)
    extra_off = data_off + len(stream)

    extra = bytearray()
    ifd0 = (struct.pack("<H", 6)
            + _entry2(271, "SONY", extra, extra_off)
            + _entry(274, 3, [1], extra, extra_off)
            + _entry(330, 4, [sub_off], extra, extra_off)
            + _entry(0x7200, 4, [sr2_off], extra, extra_off)
            + _entry(0x7201, 4, [len(sr2_enc)], extra, extra_off)
            + _entry(0x7221, 4, [key], extra, extra_off)
            + struct.pack("<I", 0))
    s_offs, pos = [], data_off
    for s in streams:
        s_offs.append(pos)
        pos += len(s)
    s_cnts = [len(s) for s in streams]
    off_tag, cnt_tag = (0x0144, 0x0145) if tiled else (273, 279)
    sub = (struct.pack("<H", 10)
           + _entry(256, 4, [w], extra, extra_off)
           + _entry(257, 4, [h], extra, extra_off)
           + _entry(258, 3, [bits], extra, extra_off)
           + _entry(259, 3, [7], extra, extra_off)
           + _entry(262, 3, [32803], extra, extra_off)
           + _entry(off_tag, 4, s_offs, extra, extra_off)
           + _entry(278, 4, [h // strips], extra, extra_off)
           + _entry(cnt_tag, 4, s_cnts, extra, extra_off)
           + _entry(33421, 3, [2, 2], extra, extra_off)
           + _entry(33422, 1, [0, 1, 1, 2], extra, extra_off)
           + struct.pack("<I", 0))
    header = struct.pack("<2sHI", b"II", 42, ifd0_off)
    return header + ifd0 + sub + sr2_enc + stream + bytes(extra)


@native_gated
def test_arw4_lossless_roundtrip_and_levels():
    """Sony lossless (ARW4): the LJ92 quad stream reassembles to the
    exact mosaic; black/WB come from the SR2 private block."""
    rng = np.random.default_rng(95)
    mosaic = rng.integers(0, 1 << 14, (24, 40), dtype=np.uint16)
    raw = rawcontainers.parse_raw_container(write_arw4(mosaic))
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.black == 512.0
    np.testing.assert_allclose(raw.as_shot_neutral,
                               [1024 / 2200, 1.0, 1024 / 1700],
                               rtol=1e-6)
    assert raw.white == float((1 << 14) - 1)


@native_gated
def test_arw4_multi_strip_and_tiled_fail_closed():
    """Review regression: (a) a multi-strip ARW4 decodes strip-by-strip
    (a single concatenated LJ92 decode would return only the first
    strip's rows); (b) a tiled layout — or any layout the Sony
    lossless reader does not recognize — must return None (fail closed
    to the embedded preview), never fall through to the generic
    _raster reshape, whose size check the half-res 4-component quads
    satisfy exactly while scrambling the mosaic."""
    rng = np.random.default_rng(96)
    mosaic = rng.integers(0, 1 << 14, (24, 40), dtype=np.uint16)
    raw = rawcontainers.parse_raw_container(write_arw4(mosaic, strips=3))
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert rawcontainers.parse_raw_container(
        write_arw4(mosaic, tiled=True)) is None


@native_gated
def test_arw4_demosaic_and_group_with_png(tmp_path):
    """ARW4 full-decodes through the scanner and groups with its PNG
    twin (VERDICT-r3 item 3 'done' bar)."""
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic14 = _scene14(96, 128, seed=97)
    d = tmp_path / "s"
    d.mkdir()
    (d / "shot4.arw").write_bytes(write_arw4(
        mosaic14, black=(0, 0, 0, 0), wb=(1024, 1024, 1024, 1024)))
    Image.fromarray(rgb).save(d / "twin.png")

    arr, res = decode.load_image(d / "shot4.arw")
    assert arr is not None and res == (128, 96)

    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"shot4.arw", "twin.png"}


def test_raw_container_parsers_survive_mutations():
    """Scan input is untrusted: byte-mutated NEF/ARW/CR2 containers must
    decode, fail cleanly (None), or raise a contained Python error —
    never crash the native decoders (whose bounds are asserted here by
    running them on hundreds of corrupted streams)."""
    rng = np.random.default_rng(20)
    _, mosaic = _scene14(16, 32)
    vals12 = (mosaic >> 2).astype(np.uint16)
    vpred = (512, 512, 512, 512)
    stream = nef_huff_encode(vals12, 2, vpred)
    lin = nikon_lin_block(ver=(0x46, 0x30), vpred=vpred)
    raf_m = np.clip(vals12, 16, 4080) & 0xFF0
    seeds = [
        write_nef(vals12, bits=12, compression=34713, lin_table=lin,
                  stream=stream),
        write_arw((vals12 >> 1).astype(np.int64), black=(0, 0, 0, 0)),
        write_cr2(vals12),
        write_raf(vals12, bits=12),
        write_rw2(rw2_encode(np.clip(raf_m[:16, :28], 16, 4080)
                             .astype(np.uint16)), 28, 16),
        write_orf(orf_encode(vals12), 32, 16),
        write_cr3(vals12),
    ]
    for seed_data in seeds:
        buf = bytearray(seed_data)
        for _ in range(120):
            n_mut = int(rng.integers(1, 8))
            positions = rng.integers(0, len(buf), n_mut)
            saved = [(int(p), buf[int(p)]) for p in positions]
            for p in positions:
                buf[int(p)] = int(rng.integers(0, 256))
            try:
                mutated = bytes(buf)
                rawcontainers.parse_raw_container(mutated)
                if mutated[4:8] == b"ftyp":
                    from rupphash_tpu.pipeline import cr3 as _cr3
                    _cr3.parse_cr3(mutated)
            except Exception:
                pass  # a contained Python error is the accepted
                      # contract; the real assertion is that the
                      # process (native decoders) survives every
                      # mutation — a segfault aborts pytest itself
            for p, v in saved:
                buf[p] = v


# ------------------------------------------------------------------ RAF

XTRANS = np.array([  # Fujifilm X-Trans 6x6 (0=R 1=G 2=B)
    [1, 2, 1, 1, 0, 1],
    [0, 1, 0, 2, 1, 2],
    [1, 2, 1, 1, 0, 1],
    [1, 0, 1, 1, 2, 1],
    [2, 1, 2, 0, 1, 0],
    [1, 0, 1, 1, 2, 1]], dtype=np.int64)


def _scene_xtrans14(h=64, w=96, seed=5):
    """Textured sRGB scene + linear-light 14-bit mosaic sampled through
    the X-Trans lattice (the 6x6 analogue of _scene14)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, (8, 12, 3), dtype=np.uint8)
    rgb = np.asarray(Image.fromarray(base).resize((w, h),
                                                  Image.BILINEAR))
    srgb = rgb.astype(np.float64) / 255.0
    lin = np.where(srgb <= 0.04045, srgb / 12.92,
                   ((srgb + 0.055) / 1.055) ** 2.4)
    site = XTRANS[np.arange(h)[:, None] % 6, np.arange(w)[None, :] % 6]
    mosaic = np.round(np.take_along_axis(
        lin, site[:, :, None], axis=2)[:, :, 0] * 16383.0
    ).astype(np.uint16)
    return rgb, mosaic


def pack_lsb(vals: np.ndarray, bits: int) -> bytes:
    """LSB-first bit packing (inverse of rawcontainers._unpack_lsb)."""
    v = vals.astype(np.int64).reshape(-1)
    b = ((v[:, None] >> np.arange(bits)) & 1).astype(np.uint8)
    return np.packbits(b.reshape(-1), bitorder="little").tobytes()


def write_raf(mosaic: np.ndarray, bits: int = 16, wb=None,
              xtrans: np.ndarray | None = None,
              jpeg_preview: bytes = b"",
              raster: bytes | None = None) -> bytes:
    """Structurally correct minimal RAF: 16-byte magic, big-endian
    offset table at 0x54, tagged CFA header records, raster (pass
    raster= for a pre-compressed stream)."""
    h, w = mosaic.shape
    recs = [(0x0100, struct.pack(">HH", h, w))]
    if bits != 16:
        recs.append((0x0121, struct.pack(">H", bits)))
    if wb is not None:
        g, r, b = wb
        # on-disk order is (G, R, G2, B)
        recs.append((0x2FF0, struct.pack(">4H", g, r, g, b)))
    if xtrans is not None:
        # the container stores the 6x6 pattern reversed
        recs.append((0x0131,
                     bytes(int(v) for v in xtrans.reshape(-1)[::-1])))
    hdr = struct.pack(">I", len(recs))
    for tag, payload in recs:
        hdr += struct.pack(">HH", tag, len(payload)) + payload
    if raster is None:
        raster = mosaic.astype("<u2").tobytes() if bits == 16 \
            else pack_lsb(mosaic, bits)
    head = bytearray(b"FUJIFILMCCD-RAW 0201FF129502".ljust(0x54, b"\0"))
    jpeg_off = 0x70
    hdr_off = jpeg_off + len(jpeg_preview)
    cfa_off = hdr_off + len(hdr)
    head += struct.pack(">6I", jpeg_off if jpeg_preview else 0,
                        len(jpeg_preview), hdr_off, len(hdr),
                        cfa_off, len(raster))
    head = head.ljust(jpeg_off, b"\0")
    return bytes(head) + jpeg_preview + hdr + raster


def raf_compress(mosaic: np.ndarray, bits: int, lattice6: np.ndarray,
                 block_size: int = 32) -> bytes:
    """Encoder mirror of native raf_decode / raf_compressed_decode_py:
    'IS' header + u32 stripe table + per-stripe gradient-adaptive
    Golomb bitstreams (nearest-same-color prediction on the 6x6
    lattice)."""
    from rupphash_tpu.pipeline.cr3 import ESCAPE_Q, RESET_N
    from rupphash_tpu.pipeline.rawcontainers import _raf_gclass

    h, w = mosaic.shape
    xt = np.asarray(lattice6, dtype=np.int64) & 3
    dleft = np.zeros((6, 6), np.int64)
    dup = np.zeros((6, 6), np.int64)
    for rm in range(6):
        for cm in range(6):
            k = xt[rm, cm]
            dleft[rm, cm] = next(d for d in range(1, 7)
                                 if xt[rm, (cm - d) % 6] == k)
            dup[rm, cm] = next(d for d in range(1, 7)
                               if xt[(rm - d) % 6, cm] == k)
    blocks = -(-w // block_size)
    stripes = []
    m = mosaic.astype(np.int64)
    for s in range(blocks):
        c0 = s * block_size
        c1 = min(c0 + block_size, w)
        wr = _MsbWriter()
        ctx = [[[4, 1] for _ in range(4)] for _ in range(3)]
        for r in range(h):
            for c in range(c0, c1):
                rm, cm = r % 6, c % 6
                k = int(xt[rm, cm])
                dl, du = int(dleft[rm, cm]), int(dup[rm, cm])
                has_a = c - dl >= c0
                has_b = r - du >= 0
                a = int(m[r, c - dl]) if has_a else 0
                b = int(m[r - du, c]) if has_b else 0
                if has_a and has_b:
                    pred = (a + b) >> 1
                    cx = ctx[k][_raf_gclass(abs(a - b))]
                else:
                    pred = a if has_a else (b if has_b else 0)
                    cx = ctx[k][0]
                err = int(m[r, c]) - pred
                u = 2 * err if err >= 0 else -2 * err - 1
                kk = 0
                while (cx[1] << kk) < cx[0] and kk < 15:
                    kk += 1
                q = u >> kk
                if q < ESCAPE_Q:
                    wr.put(1, q + 1)
                    wr.put(u & ((1 << kk) - 1), kk)
                else:
                    wr.put(1, ESCAPE_Q + 1)
                    assert u < (1 << (bits + 2)), u
                    wr.put(u, bits + 2)
                cx[0] += u
                cx[1] += 1
                if cx[1] == RESET_N:
                    cx[0] >>= 1
                    cx[1] >>= 1
        stripes.append(wr.done())
    header = (bytes([0x49, 0x53, 1, 0, bits])
              + struct.pack(">H", h) + struct.pack(">H", w)
              + struct.pack(">H", w) + struct.pack(">H", block_size)
              + bytes([blocks]) + struct.pack(">H", h))
    assert len(header) == 16
    return (header
            + b"".join(struct.pack(">I", len(s)) for s in stripes)
            + b"".join(stripes))


def test_raf_u16_roundtrip_and_wb():
    rng = np.random.default_rng(17)
    mosaic = rng.integers(0, 16384, (24, 36), dtype=np.uint16)
    raw = rawcontainers.parse_raf(write_raf(mosaic, wb=(1024, 512, 256)))
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert np.allclose(raw.as_shot_neutral, [2.0, 1.0, 4.0])
    assert np.array_equal(raw.cfa, [[0, 1], [1, 2]])


@pytest.mark.parametrize("bits", [12, 14])
def test_raf_packed_roundtrip(bits):
    rng = np.random.default_rng(bits)
    mosaic = rng.integers(0, 1 << bits, (30, 42), dtype=np.uint16)
    raw = rawcontainers.parse_raf(write_raf(mosaic, bits=bits))
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.white == float((1 << bits) - 1)


def test_raf_xtrans_pattern_and_demosaic():
    """X-Trans RAF: 6x6 CFA flows through the generic normalized-conv
    demosaic and recovers a flat-color scene."""
    from rupphash_tpu.ops import demosaic

    h, w = 36, 48
    # flat mid-gray linear scene sampled through the X-Trans mosaic
    lin = 0.2
    site = XTRANS[np.arange(h)[:, None] % 6, np.arange(w)[None, :] % 6]
    # no 0x0121 record: the parser infers 14-bit white for <=16383
    mosaic = np.full((h, w), round(lin * 16383), np.uint16)
    raw = rawcontainers.parse_raf(write_raf(mosaic, xtrans=XTRANS))
    assert raw is not None and raw.cfa.shape == (6, 6)
    assert np.array_equal(raw.cfa, XTRANS)
    rgb = demosaic.process_raw(raw)
    assert rgb is not None
    # a flat field must stay flat and neutral after demosaic
    expect = round((1.055 * lin ** (1 / 2.4) - 0.055) * 255)
    assert np.all(np.abs(rgb.astype(int) - expect) <= 2), \
        (rgb.min(), rgb.max(), expect)
    assert site.shape == (h, w)


def test_raf_bayer_2x2_periodic_xtrans_record_collapses():
    """Bayer bodies fill record 0x0131 with a 2x2-periodic pattern; the
    parser must collapse it so the Malvar path engages."""
    grid = np.tile(np.array([[2, 1], [1, 0]]), (3, 3))
    mosaic = np.zeros((12, 12), np.uint16)
    raw = rawcontainers.parse_raf(write_raf(mosaic, xtrans=grid))
    assert raw is not None
    assert raw.cfa.shape == (2, 2)
    assert np.array_equal(raw.cfa, [[2, 1], [1, 0]])


def test_raf_demosaic_recovers_scene_and_groups(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic = _scene14(240, 320, seed=21)
    d = tmp_path / "s"
    d.mkdir()
    (d / "shot.raf").write_bytes(
        write_raf((mosaic.astype(np.uint32) * 4).astype(np.uint16),
                  bits=16, wb=(1024, 1024, 1024)))
    Image.fromarray(rgb).save(d / "twin.png")
    arr, res = decode.load_image(d / "shot.raf")
    assert arr is not None and res == (320, 240)
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"shot.raf", "twin.png"}


def test_raf_preview_is_hashed_when_compressed_raster(tmp_path):
    """A RAF whose raster is unsupported (simulating Fuji lossless
    compression) must fall back to its embedded JPEG preview — the
    reference's hashing source (scanner.rs:1353-1380)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    pimg = Image.fromarray(base).resize((320, 240), Image.BILINEAR)
    buf = io.BytesIO()
    pimg.save(buf, format="JPEG", quality=92)
    preview = buf.getvalue()
    mosaic = np.zeros((64, 64), np.uint16)
    data = bytearray(write_raf(mosaic, jpeg_preview=preview))
    # truncate the raster so the native path cannot decode it
    raf = bytes(data[:len(data) - 64 * 64 * 2 + 100])
    p = tmp_path / "comp.raf"
    p.write_bytes(raf)
    assert rawcontainers.parse_raf(raf) is None
    arr, res = decode.load_image(p)
    assert arr is not None and res == (320, 240)


@native_gated
def test_raf_compressed_roundtrip_and_differential():
    """Fuji lossless-compressed class: encoder roundtrip exact through
    the C++ decoder and the Python oracle on X-Trans and Bayer
    lattices; random-stream differential."""
    rng = np.random.default_rng(91)
    for lattice in (XTRANS, np.tile(np.array([[0, 1], [1, 2]]), (3, 3))):
        mosaic = rng.integers(0, 1 << 14, (30, 44), dtype=np.uint16)
        blob = raf_compress(mosaic, 14, lattice, block_size=16)
        cpp = native.raf_decode(blob, 44, 30, lattice)
        assert cpp is not None and np.array_equal(cpp, mosaic)
        py = rawcontainers.raf_compressed_decode_py(blob, 44, 30,
                                                    lattice)
        assert py is not None and np.array_equal(py, mosaic)
    # differential on random streams: both reject or both identical
    hdr = raf_compress(np.zeros((6, 12), np.uint16), 12, XTRANS,
                       block_size=12)[:16]
    for trial in range(4):
        body = rng.integers(0, 256, 80, dtype=np.uint8).tobytes()
        stream = hdr + struct.pack(">I", len(body)) + body
        c = native.raf_decode(stream, 12, 6, XTRANS)
        p = rawcontainers.raf_compressed_decode_py(stream, 12, 6,
                                                   XTRANS)
        if c is None or p is None:
            assert c is None and p is None, trial
        else:
            assert np.array_equal(c, p), trial
    # strictness: a trailing unread byte rejects
    mosaic = rng.integers(0, 1 << 12, (12, 12), dtype=np.uint16)
    blob = raf_compress(mosaic, 12, XTRANS, block_size=12)
    bad = blob[:16] + struct.pack(">I", len(blob) - 20 + 1) \
        + blob[20:] + b"\x00"
    assert native.raf_decode(bad, 12, 12, XTRANS) is None
    assert rawcontainers.raf_compressed_decode_py(
        bad, 12, 12, XTRANS) is None


@native_gated
def test_raf_compressed_xtrans_demosaic_groups(tmp_path):
    """A compressed X-Trans RAF full-decodes through the container
    parser, feeds the normalized-conv demosaic, and groups with its
    PNG twin (VERDICT-r3 item 2 'done' bar: the RAF row stops saying
    'uncompressed/packed only')."""
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic = _scene_xtrans14(240, 320, seed=93)
    raw = rawcontainers.parse_raf(write_raf(
        mosaic, bits=14, wb=(1024, 1024, 1024), xtrans=XTRANS,
        raster=raf_compress(mosaic, 14, XTRANS, block_size=64)))
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.cfa.shape == (6, 6)

    d = tmp_path / "s"
    d.mkdir()
    (d / "shot_comp.raf").write_bytes(write_raf(
        mosaic, bits=14, wb=(1024, 1024, 1024), xtrans=XTRANS,
        raster=raf_compress(mosaic, 14, XTRANS, block_size=64)))
    Image.fromarray(rgb).save(d / "twin.png")
    arr, res = decode.load_image(d / "shot_comp.raf")
    # the X-Trans normalized-conv demosaic trims the lattice border
    assert arr is not None and abs(res[0] - 320) <= 4 \
        and abs(res[1] - 240) <= 4
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == \
        {"shot_comp.raf", "twin.png"}


# ------------------------------------------------------------------ RW2

class _PanaWriter:
    """Inverse of the RW2 bitstream reader: places bit fields at the
    positions rw2::pana_bits will read them from, emitting 0x4000-byte
    blocks with the tail-first byte order."""

    LF = 0x2008

    def __init__(self):
        self.blocks = []
        self.buf = None
        self.vbits = 0

    def put(self, val: int, nbits: int):
        if not self.vbits:
            if self.buf is not None:
                self._flush()
            self.buf = bytearray(0x4000)
        self.vbits = (self.vbits - nbits) & 0x1FFFF
        byte = (self.vbits >> 3) ^ 0x3FF0
        sh = self.vbits & 7
        word = self.buf[byte] | (self.buf[byte + 1] << 8
                                 if byte + 1 < 0x4000 else 0)
        word |= (val & ((1 << nbits) - 1)) << sh
        self.buf[byte] = word & 0xFF
        if byte + 1 < 0x4000:
            self.buf[byte + 1] = (word >> 8) & 0xFF

    def _flush(self):
        n1 = 0x4000 - self.LF
        # reader builds buf = blk[n1:] + blk[:n1]; invert that
        self.blocks.append(bytes(self.buf[self.LF:])
                           + bytes(self.buf[:self.LF]))

    def done(self) -> bytes:
        if self.buf is not None:
            self._flush()
            self.buf = None
        return b"".join(self.blocks)


def rw2_encode(mosaic: np.ndarray) -> bytes:
    """Encode a mosaic whose values are multiples of 16 in [16, 4080]
    (the subset the two-predictor scheme can reach exactly when every
    group starts from the absolute path): first use of each parity in a
    14-pixel group writes nonz+low-nibble, later pixels write the j
    code with sh pinned to 4 (2-bit code 3 at every i%3==2 slot)."""
    h, w = mosaic.shape
    # each 14-pixel group consumes exactly 128 bits = one 16-byte cell;
    # fields must never straddle a cell's top byte (the reader's 16-bit
    # window would collide with the next cell), so valid streams need
    # width padded to a multiple of 14 — real Panasonic rasters are
    assert w % 14 == 0, "RW2 raster width must be a multiple of 14"
    wr = _PanaWriter()
    for row in range(h):
        nonz = [0, 0]
        for col in range(w):
            i = col % 14
            if i == 0:
                nonz = [0, 0]
            if i % 3 == 2:
                wr.put(3, 2)          # sh = 4
            v = int(mosaic[row, col])
            assert 16 <= v <= 4080 and v % 16 == 0, v
            p = i & 1
            if nonz[p]:
                wr.put(v >> 4, 8)     # new = (old&0xF) | (j<<4), old&0xF=0
            else:
                nonz[p] = v >> 4
                wr.put(nonz[p], 8)
                wr.put(v & 0xF, 4)
    return wr.done()


def write_rw2(raster: bytes, sw: int, sh: int, bits: int = 12,
              borders=None, cfa: int = 1, wb=None, black=None,
              raw_format: int | None = None) -> bytes:
    """Structurally correct minimal RW2: TIFF with magic 0x55 and the
    PanasonicRaw IFD tags."""
    entries = [(0x0002, 3, [sw]), (0x0003, 3, [sh]),
               (0x0009, 3, [cfa]), (0x000A, 3, [bits])]
    if raw_format is not None:
        entries.append((0x002D, 3, [raw_format]))
    if borders is not None:
        t, le, bo, ri = borders
        entries += [(0x0004, 3, [t]), (0x0005, 3, [le]),
                    (0x0006, 3, [bo]), (0x0007, 3, [ri])]
    if wb is not None:
        entries += [(0x0024, 3, [wb[0]]), (0x0025, 3, [wb[1]]),
                    (0x0026, 3, [wb[2]])]
    if black is not None:
        entries += [(0x001C, 3, [black]), (0x001D, 3, [black]),
                    (0x001E, 3, [black])]
    n = len(entries) + 1
    ifd_off = 0x18
    data_off = ifd_off + _size(n)
    extra = bytearray()
    body = struct.pack("<H", n)
    for tag, typ, vals in sorted(entries):
        body += _entry(tag, typ, vals, extra, data_off)
    body += _entry(0x0118, 4, [data_off], extra, data_off)
    body += struct.pack("<I", 0)
    assert not extra, "inline-only entries expected"
    head = (b"II\x55\x00" + struct.pack("<I", ifd_off)).ljust(
        ifd_off, b"\0")
    return head + body + raster


@native_gated
def test_rw2_cpp_matches_python_random_streams():
    """Differential fuzz: the C++ and Python RW2 bitstream decoders
    must agree bit-for-bit on arbitrary streams."""
    rng = np.random.default_rng(31)
    for trial in range(4):
        stream = rng.integers(0, 256, 0x4000 * 2 + 1234,
                              dtype=np.uint8).tobytes()
        w, h = 56, 9
        cpp = native.rw2_decode(stream, w, h)
        assert cpp is not None
        py = rawcontainers._rw2_decode_py(stream, w, h)
        assert np.array_equal(cpp, py), trial


@native_gated
def test_rw2_encoder_roundtrip_exact():
    rng = np.random.default_rng(33)
    # multi-block stream (> 0x4000 bytes) to cover block transitions
    mosaic = (rng.integers(1, 256, (50, 14 * 23), dtype=np.uint16) * 16)
    stream = rw2_encode(mosaic)
    assert len(stream) > 0x4000  # spans a block transition
    cpp = native.rw2_decode(stream, 14 * 23, 50)
    assert np.array_equal(cpp, mosaic)
    py = rawcontainers._rw2_decode_py(stream, 14 * 23, 50)
    assert np.array_equal(py, mosaic)


def test_rw2_container_u16_crop_and_wb():
    rng = np.random.default_rng(35)
    sensor = rng.integers(0, 4096, (24, 32), dtype=np.uint16)
    data = write_rw2(sensor.astype("<u2").tobytes(), 32, 24, bits=12,
                     borders=(2, 4, 22, 28), wb=(2048, 1024, 512),
                     black=144)
    raw = rawcontainers.parse_rw2(data)
    assert raw is not None
    assert np.array_equal(raw.mosaic, sensor[2:22, 4:28])
    assert raw.white == 4095.0 and raw.black == 144.0
    assert np.allclose(raw.as_shot_neutral, [0.5, 1.0, 2.0])
    # even borders keep the base CFA phase
    assert np.array_equal(raw.cfa, [[0, 1], [1, 2]])
    # odd left border rolls the pattern
    raw2 = rawcontainers.parse_rw2(write_rw2(
        sensor.astype("<u2").tobytes(), 32, 24, bits=12,
        borders=(2, 5, 22, 29)))
    assert np.array_equal(raw2.cfa, [[1, 0], [2, 1]])


@native_gated
def test_rw2_demosaic_and_group_with_png(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic14 = _scene14(240, 320, seed=41)
    # 12-bit RW2 domain, quantized to the encoder's exact subset; the
    # sensor raster pads to 322 (14 | width) and the border tags crop
    # back to the 320x240 active area, like real files
    m12 = np.clip((mosaic14 >> 2) & 0xFF0, 16, 4080).astype(np.uint16)
    sensor = np.full((240, 322), 16, np.uint16)
    sensor[:, :320] = m12
    stream = rw2_encode(sensor)
    d = tmp_path / "s"
    d.mkdir()
    (d / "shot.rw2").write_bytes(write_rw2(stream, 322, 240, bits=12,
                                           borders=(0, 0, 240, 320),
                                           wb=(1024, 1024, 1024)))
    Image.fromarray(rgb).save(d / "twin.png")
    arr, res = decode.load_image(d / "shot.rw2")
    assert arr is not None and res == (320, 240)
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"shot.rw2", "twin.png"}


def _rw2_v6_pack_page(e: list[int]) -> bytes:
    """Invert the v6 16-byte page bit-slicing (14 entries -> bytes)."""
    b = [0] * 16
    b[3] = (e[0] >> 6) & 0xFF
    b[2] = ((e[0] & 0x3F) << 2) | ((e[1] >> 12) & 3)
    b[1] = (e[1] >> 4) & 0xFF
    b[0] = ((e[1] & 0xF) << 4) | (e[2] << 2) | (e[3] >> 8)
    b[7] = e[3] & 0xFF
    b[6] = (e[4] >> 2) & 0xFF
    b[5] = ((e[4] & 3) << 6) | ((e[5] >> 4) & 0x3F)
    b[4] = ((e[5] & 0xF) << 4) | (e[6] << 2) | (e[7] >> 8)
    b[11] = e[7] & 0xFF
    b[10] = (e[8] >> 2) & 0xFF
    b[9] = ((e[8] & 3) << 6) | ((e[9] >> 4) & 0x3F)
    b[8] = ((e[9] & 0xF) << 4) | (e[10] << 2) | (e[11] >> 8)
    b[15] = e[11] & 0xFF
    b[14] = (e[12] >> 2) & 0xFF
    b[13] = ((e[12] & 3) << 6) | ((e[13] >> 4) & 0x3F)
    b[12] = (e[13] & 0xF) << 4
    return bytes(b)


def rw2_v6_encode(mosaic: np.ndarray) -> bytes:
    """Encoder mirror of rw2_v6_decode: per 11-pixel block, two full
    14-bit pixels then per-group minimal scale + 10-bit deltas,
    tracking the decoder's odd/even base state.  Exact when same-parity
    deltas stay within +-511 x the chosen scale."""
    h, w = mosaic.shape
    bpr = -(-w // 11)
    m = mosaic.astype(np.int64)
    out = bytearray()
    for row in range(h):
        for blk in range(bpr):
            tgt = [int(m[row, blk * 11 + k]) if blk * 11 + k < w else 0
                   for k in range(11)]
            e = [0] * 14
            e[0], e[1] = tgt[0], tgt[1]
            oddeven = [tgt[0], tgt[1]]
            vidx = ((3, 4, 5), (7, 8, 9), (11, 12, 13))
            sidx = (2, 6, 10)
            for g in range(3):
                # choose the smallest representable scale for the group
                base_sim = list(oddeven)
                sel = 0
                for cand, shc in ((0, 0), (1, 1), (2, 2), (3, 4)):
                    sim = list(oddeven)
                    ok = True
                    for k in range(3):
                        pixi = 2 + g * 3 + k
                        delta = tgt[pixi] - sim[pixi & 1]
                        v = (delta >> shc) + 0x200
                        if not (0 <= v <= 0x3FF):
                            ok = False
                            break
                        sim[pixi & 1] = max(0, min(0x3FFF,
                                                   sim[pixi & 1]
                                                   + ((v - 0x200)
                                                      << shc)))
                    if ok:
                        sel = cand
                        break
                else:
                    sel = 3
                sh = 4 if sel == 3 else sel
                e[sidx[g]] = sel
                for k in range(3):
                    pixi = 2 + g * 3 + k
                    delta = tgt[pixi] - oddeven[pixi & 1]
                    v = max(0, min(0x3FF, (delta >> sh) + 0x200))
                    e[vidx[g][k]] = v
                    r = oddeven[pixi & 1] + ((v - 0x200) << sh)
                    oddeven[pixi & 1] = max(0, min(0x3FFF, r))
                del base_sim
            out += _rw2_v6_pack_page(e)
    return bytes(out)


def rw2_v7_encode(mosaic: np.ndarray, bps: int) -> bytes:
    """Encoder mirror of rw2_v7_decode: little-endian fixed-rate
    packing, 9x14-bit or 10x12-bit pixels per 16-byte block."""
    h, w = mosaic.shape
    ppb = 9 if bps == 14 else 10
    bpr = -(-w // ppb)
    padded = np.zeros((h, bpr * ppb), np.uint16)
    padded[:, :w] = mosaic
    vals = padded.reshape(h, bpr, ppb).astype(np.uint32)
    bits = ((vals[..., None] >> np.arange(bps)) & 1).astype(np.uint8)
    flat = bits.reshape(h, bpr, ppb * bps)
    blocks = np.zeros((h, bpr, 128), np.uint8)
    blocks[:, :, :ppb * bps] = flat
    return np.packbits(blocks, axis=-1,
                       bitorder="little").reshape(-1).tobytes()


@native_gated
def test_rw2_v7_roundtrip_and_differential():
    rng = np.random.default_rng(101)
    for bps in (12, 14):
        mosaic = rng.integers(0, 1 << bps, (18, 50), dtype=np.uint16)
        blob = rw2_v7_encode(mosaic, bps)
        cpp = native.rw2_v7_decode(blob, 50, 18, bps)
        assert cpp is not None and np.array_equal(cpp, mosaic), bps
        py = rawcontainers.rw2_v7_decode_py(blob, 50, 18, bps)
        assert np.array_equal(py, mosaic), bps
    # differential on random blobs (fixed-rate unpack: always agrees)
    for trial in range(3):
        blob = rng.integers(0, 256, 6 * 16 * 4,
                            dtype=np.uint8).tobytes()
        c = native.rw2_v7_decode(blob, 50, 4, 14)
        p = rawcontainers.rw2_v7_decode_py(blob, 50, 4, 14)
        assert c is not None and np.array_equal(c, p), trial
    # size gate
    assert native.rw2_v7_decode(blob[:-1], 50, 4, 14) is None
    assert rawcontainers.rw2_v7_decode_py(blob[:-1], 50, 4, 14) is None


@native_gated
def test_rw2_v6_roundtrip_and_differential():
    rng = np.random.default_rng(103)
    # same-parity steps within +-511: scale-0 groups reconstruct exact
    base = rng.integers(2048, 12288, (1, 2), dtype=np.int64)
    steps = rng.integers(-255, 256, (20, 44), dtype=np.int64)
    m = np.zeros((20, 44), np.int64)
    for r in range(20):
        for c in range(44):
            prev = m[r, c - 2] if c >= 2 else base[0, c % 2]
            m[r, c] = np.clip(prev + steps[r, c], 0, 0x3FFF)
    mosaic = m.astype(np.uint16)
    blob = rw2_v6_encode(mosaic)
    cpp = native.rw2_v6_decode(blob, 44, 20)
    assert cpp is not None and np.array_equal(cpp, mosaic)
    py = rawcontainers.rw2_v6_decode_py(blob, 44, 20)
    assert np.array_equal(py, mosaic)
    # large jumps engage coarser scales: C++ == Python bit-exact and
    # the reconstruction stays within the scale-4 truncation bound
    # (deltas within the +-8176 scale-4 representable range)
    wild = rng.integers(4096, 12100, (12, 22), dtype=np.uint16)
    blob = rw2_v6_encode(wild)
    cpp = native.rw2_v6_decode(blob, 22, 12)
    py = rawcontainers.rw2_v6_decode_py(blob, 22, 12)
    assert cpp is not None and np.array_equal(cpp, py)
    assert np.abs(cpp.astype(np.int64)
                  - wild.astype(np.int64)).max() <= 15
    # differential on random pages
    for trial in range(3):
        blob = rng.integers(0, 256, 2 * 16 * 6,
                            dtype=np.uint8).tobytes()
        c = native.rw2_v6_decode(blob, 22, 6)
        p = rawcontainers.rw2_v6_decode_py(blob, 22, 6)
        assert c is not None and np.array_equal(c, p), trial


@native_gated
def test_rw2_v6_v7_container_and_group(tmp_path):
    """RW2 RawFormat 6 and 7 route through parse_rw2 and the v7 file
    groups with its PNG twin through the scanner (VERDICT-r3 item 3)."""
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic14 = _scene14(240, 320, seed=105)
    # v7 container roundtrip (exact: fixed-rate packing)
    raw = rawcontainers.parse_rw2(write_rw2(
        rw2_v7_encode(mosaic14, 14), 320, 240, bits=14, raw_format=7,
        wb=(1024, 1024, 1024)))
    assert raw is not None and np.array_equal(raw.mosaic, mosaic14)
    assert raw.white == float((1 << 14) - 1)
    # v6 container roundtrip (bilinear scene: smooth, scale-0 exact)
    raw6 = rawcontainers.parse_rw2(write_rw2(
        rw2_v6_encode(mosaic14), 320, 240, bits=14, raw_format=6,
        wb=(1024, 1024, 1024)))
    assert raw6 is not None
    assert np.abs(raw6.mosaic.astype(np.int64)
                  - mosaic14.astype(np.int64)).max() <= 15

    d = tmp_path / "s"
    d.mkdir()
    (d / "shot7.rw2").write_bytes(write_rw2(
        rw2_v7_encode(mosaic14, 14), 320, 240, bits=14, raw_format=7,
        wb=(1024, 1024, 1024)))
    Image.fromarray(rgb).save(d / "twin.png")
    arr, res = decode.load_image(d / "shot7.rw2")
    assert arr is not None and res == (320, 240)
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"shot7.rw2", "twin.png"}


# ------------------------------------------------------------------ ORF

class _MsbWriter:
    def __init__(self):
        self.bits = []

    def put(self, val: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bits.append((val >> k) & 1)

    def done(self) -> bytes:
        b = np.array(self.bits + [0] * (-len(self.bits) % 8),
                     dtype=np.uint8)
        return np.packbits(b).tobytes()


def orf_encode(mosaic: np.ndarray) -> bytes:
    """Encode an arbitrary <=12-bit mosaic as an Olympus-compressed
    stream by simulating the decoder's carry/predictor state and
    emitting the exact fields it will read."""
    h, w = mosaic.shape
    wr = _MsbWriter()
    out = np.zeros((h, w), np.int64)
    for row in range(h):
        acarry = [[0, 0, 0], [0, 0, 0]]
        for col in range(w):
            carry = acarry[col & 1]
            i = 2 * (carry[2] < 3)
            nbits = 2 + i
            while (carry[0] & 0xFFFF) >> (nbits + i):
                nbits += 1
            if row < 2 and col < 2:
                pred = 0
            elif row < 2:
                pred = int(out[row, col - 2])
            elif col < 2:
                pred = int(out[row - 2, col])
            else:
                w_ = int(out[row, col - 2])
                n_ = int(out[row - 2, col])
                nw = int(out[row - 2, col - 2])
                if (w_ < nw < n_) or (n_ < nw < w_):
                    if abs(w_ - nw) > 32 or abs(n_ - nw) > 32:
                        pred = w_ + n_ - nw
                    else:
                        pred = (w_ + n_) >> 1
                else:
                    pred = w_ if abs(w_ - nw) > abs(n_ - nw) else n_
            v = int(mosaic[row, col])
            delta = v - pred
            low = delta & 3
            diff = delta >> 2
            t = diff - carry[1]
            sign = 0 if t >= 0 else -1
            c0 = t if t >= 0 else ~t
            wr.put((4 if sign else 0) | low, 3)
            high = c0 >> nbits
            if high < 12:
                wr.put(1, high + 1)        # `high` zeros then the 1
            else:
                wr.put(0, 12)
                assert high < (1 << (15 - nbits)), (high, nbits)
                wr.put(high << 1, 16 - nbits)
            wr.put(c0 & ((1 << nbits) - 1), nbits)
            carry[0] = c0
            carry[1] = (diff * 3 + carry[1]) >> 5
            carry[2] = 0 if c0 > 16 else carry[2] + 1
            out[row, col] = v & 0xFFFF
    return b"\x00" * 7 + wr.done()


def write_orf(raster: bytes, w: int, h: int, bits: int = 12,
              cfa=(0, 1, 1, 2), wb=None) -> bytes:
    """Structurally correct minimal ORF: 'IIRO' header, IFD0 with the
    CFA raster strip, EXIF IFD + OLYMP MakerNote Red/BlueBalance."""
    n0 = 8 if wb is not None else 7
    ifd0_off = 8
    exif_off = ifd0_off + _size(n0)
    mn_off = exif_off + _size(1)
    mn_hdr = b"OLYMP\x00\x02\x00"
    mn_ifd_off = mn_off + len(mn_hdr)
    data_off = mn_ifd_off + _size(2) + 16

    def build(doff: int) -> bytes:
        extra = bytearray()
        entries = (_entry(256, 4, [w], extra, data_off)
                   + _entry(257, 4, [h], extra, data_off)
                   + _entry(258, 3, [bits], extra, data_off)
                   + _entry(273, 4, [doff], extra, data_off)
                   + _entry(279, 4, [len(raster)], extra, data_off)
                   + _entry(33421, 3, [2, 2], extra, data_off)
                   + _entry(33422, 1, list(cfa), extra, data_off))
        n = 7
        if wb is not None:
            entries += _entry(34665, 4, [exif_off], extra, data_off)
            n += 1
        ifd0 = struct.pack("<H", n) + entries + struct.pack("<I", 0)
        body = b"IIRO" + struct.pack("<I", ifd0_off) + ifd0
        if wb is not None:
            exif = (struct.pack("<H", 1)
                    + struct.pack("<HHII", 37500, 7,
                                  len(mn_hdr) + _size(2) + 16, mn_off)
                    + struct.pack("<I", 0))
            mn_extra = bytearray()
            mn = (struct.pack("<H", 2)
                  + _entry(0x1017, 3, [wb[0]], mn_extra, mn_ifd_off)
                  + _entry(0x1018, 3, [wb[1]], mn_extra, mn_ifd_off)
                  + struct.pack("<I", 0))
            body = body.ljust(exif_off, b"\0") + exif
            body = body.ljust(mn_off, b"\0") + mn_hdr + mn \
                + bytes(mn_extra)
        return body.ljust(doff, b"\0")

    head = build(data_off)
    return head + raster


@native_gated
def test_orf_cpp_matches_python_random_streams():
    rng = np.random.default_rng(51)
    for trial in range(4):
        stream = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
        cpp = native.orf_decode(stream, 20, 8)
        assert cpp is not None
        py = rawcontainers._orf_decode_py(stream, 20, 8)
        assert np.array_equal(cpp, py), trial


@native_gated
def test_orf_encoder_roundtrip_exact():
    rng = np.random.default_rng(53)
    mosaic = rng.integers(0, 4096, (24, 30), dtype=np.uint16)
    stream = orf_encode(mosaic)
    cpp = native.orf_decode(stream, 30, 24)
    assert np.array_equal(cpp, mosaic)
    py = rawcontainers._orf_decode_py(stream, 30, 24)
    assert np.array_equal(py, mosaic)


def test_orf_container_u16_and_wb():
    rng = np.random.default_rng(55)
    mosaic = rng.integers(0, 4096, (16, 24), dtype=np.uint16)
    data = write_orf(mosaic.astype("<u2").tobytes(), 24, 16,
                     wb=(512, 384))
    raw = rawcontainers.parse_orf(data)
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.white == 4095.0
    # RedBalance 512/256=2.0, BlueBalance 384/256=1.5 -> neutral 1/gain
    assert np.allclose(raw.as_shot_neutral, [0.5, 1.0, 1 / 1.5])


@native_gated
def test_orf_compressed_demosaic_and_group_with_png(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic14 = _scene14(240, 320, seed=61)
    m12 = (mosaic14 >> 2).astype(np.uint16)
    stream = orf_encode(m12)
    assert len(stream) < 2 * m12.size  # actually compressed path
    d = tmp_path / "s"
    d.mkdir()
    (d / "shot.orf").write_bytes(write_orf(stream, 320, 240))
    Image.fromarray(rgb).save(d / "twin.png")
    arr, res = decode.load_image(d / "shot.orf")
    assert arr is not None and res == (320, 240)
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"shot.orf", "twin.png"}


# ------------------------------------------------------------------ CR3

from rupphash_tpu.pipeline import cr3 as cr3mod  # noqa: E402


def crx_encode_plane(plane: np.ndarray, nbits: int) -> bytes:
    """Encoder mirror of crx_decode_plane: MED prediction + adaptive
    Golomb-Rice with the 20-zero escape."""
    h, w = plane.shape
    wr = _MsbWriter()
    A, N = 4, 1
    out = plane.astype(np.int64)
    for row in range(h):
        for col in range(w):
            a = int(out[row, col - 1]) if col else 0
            if row == 0:
                pred = a if col else 0
            elif col == 0:
                pred = int(out[row - 1, 0])
            else:
                b = int(out[row - 1, col])
                c = int(out[row - 1, col - 1])
                mx, mn = (a, b) if a > b else (b, a)
                if c >= mx:
                    pred = mn
                elif c <= mn:
                    pred = mx
                else:
                    pred = a + b - c
            err = int(out[row, col]) - pred
            u = 2 * err if err >= 0 else -2 * err - 1
            k = 0
            while (N << k) < A and k < 15:
                k += 1
            q = u >> k
            if q < cr3mod.ESCAPE_Q:
                wr.put(1, q + 1)
                wr.put(u & ((1 << k) - 1), k)
            else:
                wr.put(1, cr3mod.ESCAPE_Q + 1)   # 20 zeros + 1
                assert u < (1 << (nbits + 2)), u
                wr.put(u, nbits + 2)
            A += u
            N += 1
            if N == cr3mod.RESET_N:
                A >>= 1
                N >>= 1
    return wr.done()


def _fwd53(x: list[int]) -> list[int]:
    """Forward reversible 5/3 lifting (mirror of cr3._inv53):
    interleaved -> [s|d] packed."""
    n = len(x)
    if n == 1:
        return list(x)
    ns, nd = (n + 1) // 2, n // 2
    d = [0] * nd
    s = [0] * ns
    for j in range(nd):
        e0 = x[2 * j]
        e1 = x[2 * j + 2] if 2 * j + 2 <= n - 1 else e0
        d[j] = x[2 * j + 1] - ((e0 + e1) >> 1)
    for j in range(ns):
        dm1 = d[j - 1 if j > 0 else 0]
        dj = d[j if j < nd else nd - 1]
        s[j] = x[2 * j] + ((dm1 + dj + 2) >> 2)
    return s + d


def _encode_band(band: np.ndarray, nbits: int, ll: bool,
                 q_exp: int) -> bytes:
    """Mirror of cr3._decode_band_py: quantization-exponent byte, then
    adaptive Golomb-Rice zigzag coefficients (DPCM on LL)."""
    bh, bw = band.shape
    if q_exp:
        step = 1 << q_exp
        q = np.floor_divide(band + (step >> 1), step)
    else:
        q = band.astype(np.int64)
    wr = _MsbWriter()
    A, N = 4, 1
    for row in range(bh):
        for col in range(bw):
            pred = 0
            if ll:
                if col > 0:
                    pred = int(q[row, col - 1])
                elif row > 0:
                    pred = int(q[row - 1, 0])
            err = int(q[row, col]) - pred
            u = 2 * err if err >= 0 else -2 * err - 1
            k = 0
            while (N << k) < A and k < 15:
                k += 1
            qq = u >> k
            if qq < cr3mod.ESCAPE_Q:
                wr.put(1, qq + 1)
                wr.put(u & ((1 << k) - 1), k)
            else:
                wr.put(1, cr3mod.ESCAPE_Q + 1)
                assert u < (1 << (nbits + 4)), u
                wr.put(u, nbits + 4)
            A += u
            N += 1
            if N == cr3mod.RESET_N:
                A >>= 1
                N >>= 1
    return bytes([q_exp]) + wr.done()


def crx_encode_plane_wavelet(plane: np.ndarray, nbits: int, levels: int,
                             q_exp: int = 0):
    """Encoder mirror of crx_decode_plane_wavelet: forward 5/3 pyramid
    (rows then columns per level), per-band encode (LL kept exact,
    detail bands quantized by q_exp).  Returns (blob, band_sizes)."""
    h, w = plane.shape
    canvas = plane.astype(np.int64)
    lw, lh = [w], [h]
    for _ in range(levels):
        lw.append((lw[-1] + 1) // 2)
        lh.append((lh[-1] + 1) // 2)
    for l in range(1, levels + 1):
        nr, nc = lh[l - 1], lw[l - 1]
        for r in range(nr):
            canvas[r, :nc] = _fwd53(canvas[r, :nc].tolist())
        for c in range(nc):
            canvas[:nr, c] = _fwd53(canvas[:nr, c].tolist())
    blobs = [_encode_band(canvas[:lh[levels], :lw[levels]], nbits,
                          True, 0)]
    for l in range(levels, 0, -1):
        cw, ch = lw[l], lh[l]
        dw, dh = lw[l - 1] - cw, lh[l - 1] - ch
        if dw > 0:
            blobs.append(_encode_band(canvas[:ch, cw:cw + dw], nbits,
                                      False, q_exp))
        if dh > 0:
            blobs.append(_encode_band(canvas[ch:ch + dh, :cw], nbits,
                                      False, q_exp))
        if dw > 0 and dh > 0:
            blobs.append(_encode_band(canvas[ch:ch + dh, cw:cw + dw],
                                      nbits, False, q_exp))
    return b"".join(blobs), [len(b) for b in blobs]


def _box(t: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + t + payload


def _tiff_blob(entries) -> bytes:
    """Bare little-endian TIFF with one IFD."""
    extra = bytearray()
    base = 8 + _size(len(entries))
    body = struct.pack("<H", len(entries))
    for tag, typ, vals in entries:
        body += _entry(tag, typ, vals, extra, base)
    body += struct.pack("<I", 0)
    return struct.pack("<2sHI", b"II", 42, 8) + body + bytes(extra)


def write_cr3(mosaic: np.ndarray, nbits: int = 14, wb=None,
              preview_jpeg: bytes | None = None,
              enc_type: int = 0, levels: int = 0,
              q_exp: int = 0) -> bytes:
    """Structurally correct minimal CR3: ftyp('crx '), moov with the
    Canon uuid (CNCV + CMT1/CMT3), a preview track (when given) and a
    CRAW raw track (CMP1 + stsz/co64), mdat.  levels > 0 emits the
    wavelet (CRAW) class with per-band ff03 header entries; enc_type 1
    + q_exp quantizes the detail bands (lossy)."""
    fh, fw = mosaic.shape
    planes = [mosaic[0::2, 0::2], mosaic[0::2, 1::2],
              mosaic[1::2, 0::2], mosaic[1::2, 1::2]]
    hdr = b""
    blobs = []
    if levels > 0:
        for p in planes:
            blob, bands = crx_encode_plane_wavelet(p, nbits, levels,
                                                   q_exp)
            blobs.append(blob)
            hdr += struct.pack(">HHII", 0xFF02, 0, len(blob), 0)
            hdr += b"".join(struct.pack(">HHII", 0xFF03, 0, b, 0)
                            for b in bands)
    else:
        blobs = [crx_encode_plane(p, nbits) for p in planes]
        hdr = b"".join(struct.pack(">HHII", 0xFF02, 0, len(b), 0)
                       for b in blobs)
    raw_sample = hdr + b"".join(blobs)

    cmp1_payload = (b"\0\0\0\0"
                    + struct.pack(">HH4I", 0, 0, fw, fh, fw, fh)
                    + bytes([nbits, (4 << 4) | 0,
                             (enc_type << 4) | levels, 0])
                    + struct.pack(">I", len(hdr)))
    cmp1 = _box(b"CMP1", cmp1_payload)

    cmt1 = _tiff_blob([(274, 3, [1])])
    cd = [0] * 1312
    if wb is not None:
        cd[63:67] = list(wb)
    cmt3 = _tiff_blob([(0x4001, 3, cd)])
    uuid_box = _box(b"uuid", cr3mod.CANON_UUID
                    + _box(b"CNCV", b"CanonCR3_001/synthetic")
                    + _box(b"CMT1", cmt1) + _box(b"CMT3", cmt3))

    def trak(sample_type: bytes, child: bytes, size: int,
             offset: int) -> bytes:
        entry = struct.pack(">I", 8 + 70 + len(child)) + sample_type \
            + b"\0" * 70 + child
        stsd = _box(b"stsd", b"\0\0\0\0" + struct.pack(">I", 1) + entry)
        stsz = _box(b"stsz", b"\0\0\0\0"
                    + struct.pack(">III", 0, 1, size))
        co64 = _box(b"co64", b"\0\0\0\0" + struct.pack(">IQ", 1,
                                                       offset))
        stbl = _box(b"stbl", stsd + stsz + co64)
        return _box(b"trak", _box(b"mdia", _box(b"minf", stbl)))

    ftyp = _box(b"ftyp", b"crx " + b"\0\0\0\1" + b"crx isom")

    def build(data_base: int) -> bytes:
        pv_off = data_base
        raw_off = pv_off + (len(preview_jpeg) if preview_jpeg else 0)
        traks = b""
        if preview_jpeg:
            traks += trak(b"CRAW", b"", len(preview_jpeg), pv_off)
        traks += trak(b"CRAW", cmp1, len(raw_sample), raw_off)
        moov = _box(b"moov", uuid_box + traks)
        return ftyp + moov

    head = build(0)
    data_base = len(head) + 8   # mdat payload starts after its header
    head = build(data_base)
    mdat = _box(b"mdat", (preview_jpeg or b"") + raw_sample)
    return head + mdat


@native_gated
def test_crx_plane_roundtrip_and_differential():
    rng = np.random.default_rng(71)
    plane = rng.integers(0, 1 << 14, (30, 22), dtype=np.uint16)
    blob = crx_encode_plane(plane, 14)
    cpp = native.crx_decode_plane(blob, 22, 30, 14)
    assert np.array_equal(cpp, plane)
    py = cr3mod.crx_decode_plane_py(blob, 22, 30, 14)
    assert np.array_equal(py, plane)
    # differential on random (usually invalid) streams: both reject or
    # both produce identical output
    for trial in range(4):
        stream = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
        c = native.crx_decode_plane(stream, 16, 10, 12)
        p = cr3mod.crx_decode_plane_py(stream, 16, 10, 12)
        if c is None or p is None:
            assert c is None and p is None, trial
        else:
            assert np.array_equal(c, p), trial


def test_crx_hand_derived_bitstream_vectors():
    """Hand-derived CRX entropy-layer vectors (VERDICT-r3 missing #2):
    the constants (A0=4, N0=1, RESET_N=64, ESCAPE_Q=20, escape field =
    nbits+2) and state transitions walked on paper, byte-exact.

    Vector 1 — 2x2 plane, nbits=4, pixels [[5,6],[4,4]]:
      (0,0) pred=0  A=4 N=1 -> k=2; err=+5 u=10: q=2 -> '001' + '10'
      (0,1) pred=5  A=14 N=2 -> k=3; err=+1 u=2:  q=0 -> '1' + '010'
      (1,0) pred=5 (above) A=16 N=3 -> k=3; err=-1 u=1: '1' + '001'
      (1,1) MED: a=4 b=6 c=5 -> pred=a+b-c=5; A=17 N=4 -> k=3;
            err=-1 u=1: '1' + '001'
      bits 00110'1010'1001'1001 + pad -> 0x35 0x4C 0x80

    Vector 2 — 1x5 plane, nbits=4, pixels [0,0,0,0,12]: k adapts to 0
    after three zero residuals (N catches up to A), then u=24 >= 20
    escapes: 20 zeros + stop + 6-bit explicit field '011000'.
      bits 100'10'10'1 + 0*20 + 1 + 011000 -> 0x95 00 00 0x0B 00"""
    v1 = bytes([0x35, 0x4C, 0x80])
    expect1 = np.array([[5, 6], [4, 4]], np.uint16)
    py = cr3mod.crx_decode_plane_py(v1, 2, 2, 4)
    assert np.array_equal(py, expect1)
    assert crx_encode_plane(expect1, 4) == v1
    if native.get_lib() is not None:
        assert np.array_equal(native.crx_decode_plane(v1, 2, 2, 4),
                              expect1)

    v2 = bytes([0x95, 0x00, 0x00, 0x0B, 0x00])
    expect2 = np.array([[0, 0, 0, 0, 12]], np.uint16)
    py = cr3mod.crx_decode_plane_py(v2, 5, 1, 4)
    assert np.array_equal(py, expect2)
    assert crx_encode_plane(expect2, 4) == v2
    if native.get_lib() is not None:
        assert np.array_equal(native.crx_decode_plane(v2, 5, 1, 4),
                              expect2)

    # strictness: a trailing unread byte or an out-of-range sample
    # rejects (the foreign-bitstream gates)
    assert cr3mod.crx_decode_plane_py(v1 + b"\x00", 2, 2, 4) is None
    if native.get_lib() is not None:
        assert native.crx_decode_plane(v1 + b"\x00", 2, 2, 4) is None


def test_crx_cmp1_routing_table():
    """Explicit CMP1 (enc_type, levels) routing: which combinations
    raw-decode vs fall back to the embedded preview."""
    assert cr3mod.crx_route(0, 0) == "med"
    for l in (1, 2, 3, 8):
        assert cr3mod.crx_route(0, l) == "wavelet-lossless"
        assert cr3mod.crx_route(1, l) == "wavelet-lossy"
    assert cr3mod.crx_route(1, 0) is None
    assert cr3mod.crx_route(2, 0) is None
    assert cr3mod.crx_route(2, 3) is None
    assert cr3mod.crx_route(0, 9) is None
    assert cr3mod.crx_route(3, 1) is None


@native_gated
def test_crx_wavelet_roundtrip_and_differential():
    """LeGall 5/3 wavelet class: lossless roundtrip exact (C++ and
    Python oracle), lossy within the quantization bound, C++/Python
    bit-identical on both, random-stream differential."""
    rng = np.random.default_rng(77)
    for h, w, levels in ((30, 22, 2), (17, 13, 3), (8, 8, 1)):
        plane = rng.integers(0, 1 << 14, (h, w), dtype=np.uint16)
        blob, bands = crx_encode_plane_wavelet(plane, 14, levels)
        cpp = native.crx_decode_plane_wavelet(blob, bands, w, h, 14,
                                              levels, True)
        assert cpp is not None and np.array_equal(cpp, plane), (h, w)
        py = cr3mod.crx_decode_plane_wavelet_py(blob, bands, w, h, 14,
                                                levels, True)
        assert np.array_equal(py, plane), (h, w)

    # lossy: quantized detail bands; C++ == Python bit-exact, output
    # within a loose synthesis-amplified step bound of the original
    plane = rng.integers(200, 1 << 13, (24, 36), dtype=np.uint16)
    blob, bands = crx_encode_plane_wavelet(plane, 14, 3, q_exp=3)
    cpp = native.crx_decode_plane_wavelet(blob, bands, 36, 24, 14, 3,
                                          False)
    py = cr3mod.crx_decode_plane_wavelet_py(blob, bands, 36, 24, 14, 3,
                                            False)
    assert cpp is not None and py is not None
    assert np.array_equal(cpp, py)
    diff = np.abs(cpp.astype(np.int64) - plane.astype(np.int64))
    assert diff.max() <= 128 and diff.mean() <= 8

    # differential on random (usually invalid) streams
    for trial in range(4):
        stream = rng.integers(0, 256, 600, dtype=np.uint8).tobytes()
        sizes = [150, 150, 150, 150]
        c = native.crx_decode_plane_wavelet(stream, sizes, 12, 10, 12,
                                            1, False)
        p = cr3mod.crx_decode_plane_wavelet_py(stream, sizes, 12, 10,
                                               12, 1, False)
        if c is None or p is None:
            assert c is None and p is None, trial
        else:
            assert np.array_equal(c, p), trial


@native_gated
def test_cr3_craw_container_decode():
    """CR3 with a wavelet-class raw track: lossless reconstructs the
    mosaic exactly; lossy (CRAW, enc_type 1) reconstructs within the
    quantization bound."""
    rng = np.random.default_rng(79)
    mosaic = rng.integers(0, 1 << 14, (32, 48), dtype=np.uint16)
    data = write_cr3(mosaic, wb=(1024, 1024, 1024, 1024), levels=3)
    parsed = cr3mod.parse_cr3(data)
    assert parsed["raw"] is not None
    assert np.array_equal(parsed["raw"].mosaic, mosaic)

    _, scene = _scene14(32, 48, seed=85)
    lossy = write_cr3(scene, enc_type=1, levels=3, q_exp=2)
    parsed = cr3mod.parse_cr3(lossy)
    assert parsed["raw"] is not None
    diff = np.abs(parsed["raw"].mosaic.astype(np.int64)
                  - scene.astype(np.int64))
    assert diff.max() <= 64


@native_gated
def test_cr3_craw_groups_with_jpeg_sibling(tmp_path):
    """Preview-less lossy CRAW CR3 full-decodes through the scanner and
    groups with its JPEG sibling (VERDICT-r3 item 1 'done' bar)."""
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic = _scene14(240, 320, seed=87)
    d = tmp_path / "s"
    d.mkdir()
    (d / "shot_craw.cr3").write_bytes(
        write_cr3(mosaic, wb=(1024, 1024, 1024, 1024), enc_type=1,
                  levels=3, q_exp=2))
    Image.fromarray(rgb).save(d / "sibling.jpg", quality=95)
    arr, res = decode.load_image(d / "shot_craw.cr3")
    assert arr is not None and res == (320, 240)
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == \
        {"shot_craw.cr3", "sibling.jpg"}


@native_gated
def test_cr3_craw_views_in_gui_engine(tmp_path):
    """The viewer path full-decodes a lossy CRAW CR3."""
    from rupphash_tpu.gui import imaging

    _, mosaic = _scene14(64, 96, seed=89)
    p = tmp_path / "view_craw.cr3"
    p.write_bytes(write_cr3(mosaic, enc_type=1, levels=2, q_exp=2))
    eng = imaging.ImageEngine()
    out = eng.render(p)
    assert out is not None and out[:2] == b"\xff\xd8"


@native_gated
def test_cr3_container_roundtrip_preview_and_raw():
    import io

    from PIL import Image

    rng = np.random.default_rng(73)
    mosaic = rng.integers(0, 1 << 14, (32, 48), dtype=np.uint16)
    buf = io.BytesIO()
    Image.new("RGB", (48, 32), (90, 120, 30)).save(buf, format="JPEG")
    data = write_cr3(mosaic, wb=(1024, 1024, 1024, 1024),
                     preview_jpeg=buf.getvalue())
    parsed = cr3mod.parse_cr3(data)
    assert parsed is not None
    assert parsed["cncv"].startswith("CanonCR3")
    assert parsed["preview"][:2] == b"\xff\xd8"
    assert parsed["raw"] is not None
    assert np.array_equal(parsed["raw"].mosaic, mosaic)
    assert np.allclose(parsed["raw"].as_shot_neutral, [1.0, 1.0, 1.0])


@native_gated
def test_cr3_lossy_track_falls_back_to_preview(tmp_path):
    import io

    from PIL import Image

    rng = np.random.default_rng(75)
    base = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    pimg = Image.fromarray(base).resize((320, 240), Image.BILINEAR)
    buf = io.BytesIO()
    pimg.save(buf, format="JPEG", quality=92)
    mosaic = rng.integers(0, 1 << 14, (16, 16), dtype=np.uint16)
    data = write_cr3(mosaic, preview_jpeg=buf.getvalue(), enc_type=1)
    parsed = cr3mod.parse_cr3(data)
    assert parsed["raw"] is None          # lossy: not decoded
    p = tmp_path / "lossy.cr3"
    p.write_bytes(data)
    arr, res = decode.load_image(p)
    assert arr is not None and res == (320, 240)   # preview hashed


@native_gated
def test_cr3_full_decode_groups_with_jpeg_sibling(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic = _scene14(240, 320, seed=81)
    d = tmp_path / "s"
    d.mkdir()
    # preview-less CR3: the scanner must full-decode the raw track
    (d / "shot.cr3").write_bytes(
        write_cr3(mosaic, wb=(1024, 1024, 1024, 1024)))
    Image.fromarray(rgb).save(d / "sibling.jpg", quality=95)
    arr, res = decode.load_image(d / "shot.cr3")
    assert arr is not None and res == (320, 240)
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == \
        {"shot.cr3", "sibling.jpg"}


@native_gated
def test_cr3_views_in_gui_engine(tmp_path):
    """The viewer path full-decodes a CR3 (gui/image.rs:1839-1962)."""
    from rupphash_tpu.gui import imaging

    rgb, mosaic = _scene14(64, 96, seed=83)
    p = tmp_path / "view.cr3"
    p.write_bytes(write_cr3(mosaic))
    eng = imaging.ImageEngine()
    out = eng.render(p)
    assert out is not None and out[:2] == b"\xff\xd8"


def test_raf_xtrans_on_disk_byte_order_is_reversed():
    """Regression for the bidirectional blind spot: the 0x0131 record
    stores the 6x6 pattern REVERSED (dcraw fills
    xtrans_abs[0][35 - c]).  Hard-code the on-disk byte sequence for an
    asymmetric pattern and assert the parser recovers the logical grid
    (an unreversed read would return it rotated 180 degrees)."""
    # NB the true X-Trans pattern is 180-degree symmetric (the
    # reversal is invisible for it); use an asymmetric pattern so the
    # byte order is actually observable
    grid = XTRANS.copy()
    grid[0, 0], grid[0, 1] = 2, 1
    assert not np.array_equal(grid, grid[::-1, ::-1])
    on_disk = bytes(int(v) for v in grid.reshape(-1)[::-1])
    mosaic = np.zeros((12, 12), np.uint16)
    raw = write_raf(mosaic)
    # splice a hand-built record list: dims + raw 0x0131 payload
    hdr = struct.pack(">I", 2)
    hdr += struct.pack(">HH", 0x0100, 4) + struct.pack(">HH", 12, 12)
    hdr += struct.pack(">HH", 0x0131, 36) + on_disk
    raster = mosaic.astype("<u2").tobytes()
    head = bytearray(b"FUJIFILMCCD-RAW 0201FF129502".ljust(0x54, b"\0"))
    hdr_off = 0x70
    cfa_off = hdr_off + len(hdr)
    head += struct.pack(">6I", 0, 0, hdr_off, len(hdr), cfa_off,
                        len(raster))
    head = head.ljust(hdr_off, b"\0")
    parsed = rawcontainers.parse_raf(bytes(head) + hdr + raster)
    assert parsed is not None
    assert np.array_equal(parsed.cfa, grid)
    assert raw is not None  # silence unused


def test_orf_big_endian_u16_raster():
    """'MMOR' ORFs store the u16 raster big-endian; the parser must
    honor the container byte order (regression: always-LE read)."""
    rng = np.random.default_rng(57)
    mosaic = rng.integers(0, 4096, (8, 12), dtype=np.uint16)
    # hand-build a minimal big-endian ORF
    extra = bytearray()
    data_off = 8 + _size(5)

    def ent(tag, typ, val):
        return struct.pack(">HHI", tag, typ, 1) + struct.pack(">I", val)

    # SHORT values sit left-justified in the 4-byte field for MM files
    def ent_s(tag, val):
        return struct.pack(">HHI", tag, 3, 1) + struct.pack(">HH",
                                                            val, 0)

    raster = mosaic.astype(">u2").tobytes()
    ifd = (struct.pack(">H", 5)
           + ent(256, 4, 12) + ent(257, 4, 8) + ent_s(258, 12)
           + ent(273, 4, data_off) + ent(279, 4, len(raster))
           + struct.pack(">I", 0))
    data = b"MMOR" + struct.pack(">I", 8) + ifd + bytes(extra) + raster
    raw = rawcontainers.parse_orf(data)
    assert raw is not None
    assert np.array_equal(raw.mosaic, mosaic)
