"""DNG raw decode: LJ92 codec, TIFF/CFA container, TPU MHC demosaic.

Test strategy mirrors the reference's naive-oracle + physical-ground-
truth pattern (SURVEY.md §4): a from-scratch Python LJ92 *encoder*
exercises the C++ decoder bit-exactly across predictors; synthetic
Bayer scenes validate the demosaic against the original RGB.
"""
import struct

import numpy as np
import pytest

from rupphash_tpu import native
from rupphash_tpu.pipeline import decode, dng


# ------------------------------------------------------------- LJ92

def lj92_encode(img16: np.ndarray, predictor: int = 1,
                precision: int = 16, components: int = 1,
                restart_interval: int = 0, rst_fill: int = 0) -> bytes:
    """Minimal lossless-JPEG encoder (ITU-T T.81 process 14) used as an
    independent oracle for the native decoder.  img16 is (h, w*components)
    with samples interleaved along the row.  restart_interval emits a
    DRI segment and byte-aligned RSTn markers every that many MCUs (the
    first MCU after a restart predicts from the default, H.2.1);
    rst_fill prepends that many spec-legal 0xFF fill bytes (B.1.1.2)
    to each restart marker."""
    h, ws = img16.shape
    assert ws % components == 0
    w = ws // components
    img = img16.astype(np.int64).reshape(h, w, components)
    default = 1 << (precision - 1)
    diffs = np.zeros((h, w, components), dtype=np.int64)
    mcu = 0
    for y in range(h):
        for x in range(w):
            restarted = (restart_interval and mcu
                         and mcu % restart_interval == 0)
            for c in range(components):
                plane = img[:, :, c]
                if (y == 0 and x == 0) or restarted:
                    pred = default
                elif y == 0:
                    pred = plane[0, x - 1]
                elif x == 0:
                    pred = plane[y - 1, 0]
                else:
                    a, b, cc = (plane[y, x - 1], plane[y - 1, x],
                                plane[y - 1, x - 1])
                    pred = {1: a, 2: b, 3: cc, 4: a + b - cc,
                            5: a + ((b - cc) >> 1),
                            6: b + ((a - cc) >> 1),
                            7: (a + b) >> 1}[predictor]
                d = (int(plane[y, x]) - int(pred)) & 0xFFFF
                diffs[y, x, c] = d - 65536 if d >= 32768 else d
            mcu += 1

    def cat(d):
        return 0 if d == 0 else int(np.floor(np.log2(abs(d)))) + 1

    # fixed canonical Huffman table covering ssss 0..16
    lens = {0: 2, 1: 2, 2: 2}
    for s in range(3, 17):
        lens[s] = s
    by_len: dict[int, list[int]] = {}
    for v, l in lens.items():
        by_len.setdefault(l, []).append(v)
    counts = [0] * 16
    for l, vs in by_len.items():
        counts[l - 1] = len(vs)
    codes = {}
    code = 0
    for l in range(1, 17):
        for v in sorted(by_len.get(l, [])):
            codes[v] = (code, l)
            code += 1
        code <<= 1

    out = bytearray()
    acc = n = 0

    def emit(v, l):
        nonlocal acc, n
        acc = (acc << l) | v
        n += l
        while n >= 8:
            byte = (acc >> (n - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            n -= 8
        acc &= (1 << n) - 1

    def flush_align():
        nonlocal acc, n
        if n:
            byte = ((acc << (8 - n)) | ((1 << (8 - n)) - 1)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            acc = n = 0

    mcu = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu and mcu % restart_interval == 0:
                flush_align()
                out.extend(b"\xff" * rst_fill)
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
            for c in range(components):
                d = int(diffs[y, x, c])
                s = cat(d)
                emit(*codes[s])
                if s and s < 16:
                    v = d if d >= 0 else d + (1 << s) - 1
                    emit(v & ((1 << s) - 1), s)
            mcu += 1
    flush_align()

    def seg(marker, payload):
        return (bytes([0xFF, marker])
                + (len(payload) + 2).to_bytes(2, "big") + payload)

    sof = (bytes([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
           + bytes([components])
           + b"".join(bytes([i + 1, 0x11, 0]) for i in range(components)))
    dht = bytes([0x00]) + bytes(counts) + bytes(
        v for l in sorted(by_len) for v in sorted(by_len[l]))
    sos = (bytes([components])
           + b"".join(bytes([i + 1, 0x00]) for i in range(components))
           + bytes([predictor, 0, 0]))
    dri = b""
    if restart_interval:
        dri = seg(0xDD, restart_interval.to_bytes(2, "big"))
    return (b"\xff\xd8" + seg(0xC3, sof) + seg(0xC4, dht) + dri
            + seg(0xDA, sos) + bytes(out) + b"\xff\xd9")


native_gated = pytest.mark.skipif(native.get_lib() is None,
                                  reason="native library unavailable")


@native_gated
@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lj92_roundtrip_predictors(predictor):
    rng = np.random.default_rng(predictor)
    img = rng.integers(0, 65536, (19, 27), dtype=np.uint16)
    out = native.lj92_decode(lj92_encode(img, predictor))
    assert out is not None and np.array_equal(out, img)


@native_gated
def test_lj92_two_component_interleave():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 65536, (16, 40), dtype=np.uint16)  # w=20, nc=2
    out = native.lj92_decode(lj92_encode(img, 1, components=2))
    assert out is not None and np.array_equal(out, img)


@native_gated
def test_lj92_rejects_garbage():
    assert native.lj92_decode(b"\xff\xd8garbage") is None
    assert native.lj92_decode(b"") is None


# ------------------------------------------------------------- DNG

def _entry(tag, typ, values, extra: bytearray, base: int):
    sizes = {1: 1, 3: 2, 4: 4, 5: 8, 10: 8, 12: 8}
    if typ == 1:
        payload = bytes(values)
    elif typ == 3:
        payload = b"".join(struct.pack("<H", v) for v in values)
    elif typ == 4:
        payload = b"".join(struct.pack("<I", v) for v in values)
    elif typ in (5, 10):
        fmt = "<II" if typ == 5 else "<ii"
        payload = b"".join(struct.pack(fmt, *v) for v in values)
    elif typ == 12:
        payload = b"".join(struct.pack("<d", v) for v in values)
    else:
        raise ValueError(typ)
    cnt = len(values)
    if len(payload) <= 4:
        return struct.pack("<HHI4s", tag, typ, cnt,
                           payload.ljust(4, b"\x00"))
    off = base + len(extra)
    extra.extend(payload)
    if len(extra) % 2:
        extra.append(0)
    return struct.pack("<HHII", tag, typ, cnt, off)


def write_dng(mosaic: np.ndarray, cfa=(0, 1, 1, 2), compression=1,
              black=0, white=65535, asn=None, cm=None,
              active_area=None, bits=16, tile=None) -> bytes:
    """Assemble a minimal but structurally correct DNG: IFD0 carries
    DNGVersion/ColorMatrix/AsShotNeutral and a SubIFD holding the CFA
    raster (16-bit strips, or LJ92 tiles when compression=7)."""
    h, w = mosaic.shape
    assert bits == 16
    if compression == 1:
        blobs = [mosaic.astype("<u2").tobytes()]
        tiled = False
    else:
        tw, tl = tile or (w, h)
        tiled = tile is not None
        blobs = []
        for ty in range(0, h, tl):
            for tx in range(0, w, tw):
                t = np.zeros((tl, tw), np.uint16)
                block = mosaic[ty:ty + tl, tx:tx + tw]
                t[:block.shape[0], :block.shape[1]] = block
                # DNG convention: SOF3 declares 2 interleaved
                # components, halving the sample width
                blobs.append(lj92_encode(t.reshape(tl, tw),
                                         predictor=1, components=2))
    asn = asn if asn is not None else (1.0, 1.0, 1.0)
    if cm is None:
        # our synthetic scenes are sRGB-primary: ColorMatrix (XYZ->cam)
        # is then exactly the XYZ->sRGB matrix, making the pipeline's
        # cam->sRGB step the identity
        from rupphash_tpu.ops.demosaic import _XYZ2SRGB
        cm = _XYZ2SRGB

    def build(data_off: int) -> bytes:
        offsets, cur = [], data_off
        for b in blobs:
            offsets.append(cur)
            cur += len(b) + (len(b) & 1)
        sub_tags = [
            (254, 4, [0]),
            (256, 4, [w]), (257, 4, [h]), (258, 3, [bits]),
            (259, 3, [compression]), (262, 3, [32803]),
            (33421, 3, [2, 2]), (33422, 1, list(cfa)),
            (50714, 4, [black]), (50717, 4, [white]),
        ]
        if active_area is not None:
            sub_tags.append((50829, 4, list(active_area)))
        if tiled:
            tw, tl = tile
            sub_tags += [(322, 4, [tw]), (323, 4, [tl]),
                         (324, 4, offsets),
                         (325, 4, [len(b) for b in blobs])]
        else:
            sub_tags += [(273, 4, offsets), (278, 4, [h]),
                         (279, 4, [len(b) for b in blobs])]
        sub_tags.sort()
        n0, ns = 6, len(sub_tags)
        ifd0_off = 8
        sub_off = ifd0_off + 2 + n0 * 12 + 4
        extra_off = sub_off + 2 + ns * 12 + 4
        extra = bytearray()
        ifd0 = b"".join([
            _entry(254, 4, [1], extra, extra_off),
            _entry(274, 3, [1], extra, extra_off),
            _entry(330, 4, [sub_off], extra, extra_off),
            _entry(50706, 1, [1, 4, 0, 0], extra, extra_off),
            _entry(50721, 10, [(int(v * 10000), 10000)
                               for v in np.asarray(cm).flatten()],
                   extra, extra_off),
            _entry(50728, 5, [(int(v * 10000), 10000) for v in asn],
                   extra, extra_off),
        ])
        sub = b"".join(_entry(t, typ, v, extra, extra_off)
                       for t, typ, v in sub_tags)
        out = bytearray()
        out += struct.pack("<2sHI", b"II", 42, ifd0_off)
        out += struct.pack("<H", n0) + ifd0 + struct.pack("<I", 0)
        out += struct.pack("<H", ns) + sub + struct.pack("<I", 0)
        out += extra
        return bytes(out)

    # two passes: measure header size with dummy offsets, then rebuild
    head = build(0)
    head = build(len(head))
    out = bytearray(head)
    for b in blobs:
        out += b
        if len(b) & 1:
            out += b"\x00"
    return bytes(out)


def _scene(h=64, w=96, seed=3):
    """Smooth textured sRGB scene + its *linear-light* RGGB mosaic
    (a sensor records linear values; the pipeline re-encodes sRGB)."""
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
                lin[dy::2, dx::2, ch[dy, dx]] * 65535.0).astype(np.uint16)
    return rgb, mosaic


def test_write_dng_parses():
    rgb, mosaic = _scene()
    raw = dng.parse_dng(write_dng(mosaic))
    assert raw is not None
    assert raw.mosaic.shape == mosaic.shape
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.white == 65535 and raw.black == 0
    assert np.array_equal(raw.cfa, [[0, 1], [1, 2]])
    assert raw.color_matrix is not None


def test_is_dng_sniff():
    _, mosaic = _scene(16, 16)
    assert dng.is_dng(write_dng(mosaic))
    assert not dng.is_dng(b"II*\x00junk")
    assert not dng.is_dng(b"not a tiff at all")


def test_demosaic_recovers_scene():
    rgb, mosaic = _scene()
    out = dng.decode_dng(write_dng(mosaic))
    assert out is not None and out.shape == rgb.shape
    # MHC on a smooth scene: small error away from borders
    diff = np.abs(out[4:-4, 4:-4].astype(int)
                  - rgb[4:-4, 4:-4].astype(int))
    assert float(diff.mean()) < 3.0
    assert float(np.percentile(diff, 99)) < 30.0


@native_gated
def test_dng_lj92_tiles_match_uncompressed():
    _, mosaic = _scene(64, 96)
    plain = dng.parse_dng(write_dng(mosaic))
    tiled = dng.parse_dng(write_dng(mosaic, compression=7,
                                    tile=(32, 32)))
    assert tiled is not None
    assert np.array_equal(plain.mosaic, tiled.mosaic)


def test_active_area_and_levels():
    _, mosaic = _scene(32, 32)
    padded = np.zeros((40, 40), np.uint16)
    padded[4:36, 4:36] = mosaic
    raw = dng.parse_dng(write_dng(padded, active_area=(4, 4, 36, 36),
                                  black=256, white=60000))
    assert raw.mosaic.shape == (32, 32)
    assert np.array_equal(raw.mosaic, mosaic)
    assert raw.black == 256.0 and raw.white == 60000.0


def test_white_balance_applied():
    rgb, mosaic = _scene()
    # simulate camera response: red channel attenuated 2x on the sensor
    cam = mosaic.copy()
    cam[0::2, 0::2] = cam[0::2, 0::2] // 2
    out = dng.decode_dng(write_dng(cam, asn=(0.5, 1.0, 1.0)))
    ref = dng.decode_dng(write_dng(mosaic))
    # WB restores the red plane to within rounding of the unattenuated
    diff = np.abs(out.astype(int) - ref.astype(int)).mean()
    assert diff < 2.0


def test_preview_less_dng_through_pipeline(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rgb, mosaic = _scene(240, 320, seed=11)
    d = tmp_path / "s"
    d.mkdir()
    (d / "photo.dng").write_bytes(write_dng(mosaic))
    Image.fromarray(rgb).save(d / "twin.png")
    arr, res = decode.load_image(d / "photo.dng")
    assert arr is not None and res == (320, 240)
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"photo.dng", "twin.png"}


@native_gated
def test_lj92_restart_markers_and_fill_bytes():
    """Restart intervals roundtrip; spec-legal 0xFF fill bytes before
    RSTn (T.81 B.1.1.2) are skipped (previously treated as a foreign
    marker, silently zero-decoding the rest of the scan); a stream
    whose expected RSTn is missing fails loudly instead of returning
    success with corrupted pixels."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 65536, (13, 17), dtype=np.uint16)

    plain = lj92_encode(img, 1, restart_interval=7)
    out = native.lj92_decode(plain)
    assert out is not None and np.array_equal(out, img)

    filled = lj92_encode(img, 1, restart_interval=7, rst_fill=3)
    out = native.lj92_decode(filled)
    assert out is not None and np.array_equal(out, img)

    # clobber the first restart marker (FF D0 -> FF C5): missing RSTn
    broken = bytearray(plain)
    i = broken.find(b"\xff\xd0")
    assert i > 0
    broken[i + 1] = 0xC5
    assert native.lj92_decode(bytes(broken)) is None


@native_gated
def test_lj92_rejects_invalid_point_transform():
    """SOS Pt >= precision would shift negatively in the default
    predictor; the decoder must reject it."""
    good = lj92_encode(np.full((4, 4), 100, np.uint16), 1, precision=8)
    sos_at = good.find(b"\xff\xda")
    assert sos_at > 0
    bad = bytearray(good)
    # SOS payload: len(2) ns(1) [id,td](2) pred(1) se(1) ah_al(1)
    # FF DA | len(2) | ns(1) | id,td(2) | pred(1) | se(1) | AhAl(1)
    bad[sos_at + 9] = 0x0F  # Al nibble = 15
    assert native.lj92_decode(bytes(bad)) is None
