"""JXL decode (system libjxl binding) and PDF embedded-image extraction."""
import io
import zlib

import numpy as np
import pytest

from rupphash_tpu.native import jxl
from rupphash_tpu.pipeline import decode, pdfimg


def _gradient(h, w):
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    return np.stack([y + 0 * x, x + 0 * y, (x + y) / 2],
                    axis=-1).astype(np.uint8)


# ---------------------------------------------------------------- JXL

jxl_gated = pytest.mark.skipif(jxl._load() is None,
                               reason="libjxl unavailable")


@jxl_gated
def test_jxl_version():
    v = jxl.version()
    assert v and v[0].isdigit()


@jxl_gated
def test_jxl_lossless_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (41, 67, 3), dtype=np.uint8)
    data = jxl.encode_jxl(img)
    assert data is not None and data[:2] == b"\xff\x0a"
    out = jxl.decode_jxl(data)
    assert out is not None
    assert np.array_equal(out[..., :3], img)


@jxl_gated
def test_jxl_through_pipeline(tmp_path):
    img = _gradient(96, 128)
    data = jxl.encode_jxl(img)
    assert data is not None
    p = tmp_path / "sample.jxl"
    p.write_bytes(data)
    arr, res = decode.load_image(p)
    assert arr is not None and res == (128, 96)
    assert np.array_equal(arr[..., :3], img)
    # extensionless sniffing path
    q = tmp_path / "noext.png"  # wrong ext: PIL fails, sniffer catches
    q.write_bytes(data)
    arr2, _ = decode.load_image(q)
    assert arr2 is not None and np.array_equal(arr2[..., :3], img)


@jxl_gated
def test_jxl_garbage_returns_none():
    assert jxl.decode_jxl(b"\xff\x0anot a real jxl") is None


@jxl_gated
def test_jxl_scan_groups_with_png(tmp_path):
    """Textured fixture (CLAUDE.md rule): a smooth gradient gates the
    pair to exact-match-only, which lossless JXL would satisfy even
    with the perceptual path broken."""
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    rng = np.random.default_rng(6)
    base = rng.integers(30, 220, (24, 32, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((320, 240),
                                                  Image.BILINEAR))
    d = tmp_path / "s"
    d.mkdir()
    (d / "a.jxl").write_bytes(jxl.encode_jxl(img))
    Image.fromarray(img).save(d / "b.png")
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"a.jxl", "b.png"}


# ---------------------------------------------------------------- PDF

def _make_pdf(objects: list[bytes]) -> bytes:
    """Assemble a structurally plausible PDF from raw object bodies."""
    out = io.BytesIO()
    out.write(b"%PDF-1.5\n")
    for i, body in enumerate(objects, start=1):
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    out.write(b"trailer\n<< /Size %d >>\n%%%%EOF\n" % (len(objects) + 1))
    return out.getvalue()


def _jpeg_bytes(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    return buf.getvalue()


def _image_obj(w, h, filt, colorspace, stream, extra=b""):
    head = (b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
            b" /ColorSpace %s /BitsPerComponent 8 /Filter %s"
            b" /Length %d %s>>\nstream\n" %
            (w, h, colorspace, filt, len(stream), extra))
    return head + stream + b"\nendstream"


def test_pdf_dct_image():
    img = _gradient(120, 160)
    pdf = _make_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        _image_obj(160, 120, b"/DCTDecode", b"/DeviceRGB",
                   _jpeg_bytes(img)),
    ])
    out = pdfimg.extract_largest_pdf_image(pdf)
    assert out is not None and out.shape == (120, 160, 3)
    assert float(np.abs(out.astype(int) - img.astype(int)).mean()) < 4


def test_pdf_flate_rgb_and_largest_wins():
    big = _gradient(64, 96)
    small = _gradient(8, 8)
    pdf = _make_pdf([
        _image_obj(8, 8, b"/FlateDecode", b"/DeviceRGB",
                   zlib.compress(small.tobytes())),
        _image_obj(96, 64, b"/FlateDecode", b"/DeviceRGB",
                   zlib.compress(big.tobytes())),
    ])
    out = pdfimg.extract_largest_pdf_image(pdf)
    assert out is not None and out.shape == (64, 96, 3)
    assert np.array_equal(out, big)


def test_pdf_flate_gray_with_png_predictor():
    img = _gradient(32, 48)[..., 0]  # gray
    # PNG Up predictor (type 2) rows
    rows = []
    prev = np.zeros(48, dtype=np.uint8)
    for r in range(32):
        rows.append(b"\x02" + ((img[r].astype(np.int32) - prev) %
                               256).astype(np.uint8).tobytes())
        prev = img[r]
    stream = zlib.compress(b"".join(rows))
    pdf = _make_pdf([
        _image_obj(48, 32, b"/FlateDecode", b"/DeviceGray", stream,
                   b"/DecodeParms << /Predictor 15 /Colors 1 "
                   b"/Columns 48 >> "),
    ])
    out = pdfimg.extract_largest_pdf_image(pdf)
    assert out is not None and out.shape == (32, 48)
    assert np.array_equal(out, img)


def test_pdf_vector_only_returns_none():
    pdf = _make_pdf([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Length 20 >>\nstream\n0 0 m 100 100 l S\nendstream",
    ])
    assert pdfimg.extract_largest_pdf_image(pdf) is None
    assert pdfimg.extract_largest_pdf_image(b"not a pdf") is None


def test_pdf_through_pipeline(tmp_path):
    from PIL import Image

    from rupphash_tpu.pipeline import scan

    # textured fixture: smooth gradients have near-zero PDQ quality and
    # would be gated to exact-only matching (scanner.rs:1588-1594)
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((320, 240),
                                                  Image.BILINEAR))
    pdf = _make_pdf([_image_obj(320, 240, b"/DCTDecode", b"/DeviceRGB",
                                _jpeg_bytes(img))])
    d = tmp_path / "s"
    d.mkdir()
    (d / "doc.pdf").write_bytes(pdf)
    Image.fromarray(img).save(d / "twin.png")
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"doc.pdf", "twin.png"}


jxl_container_gated = pytest.mark.skipif(jxl._load() is None,
                                         reason="libjxl unavailable")


@jxl_gated
def test_sniff_decodes_container_jxl_and_preamble_pdf():
    """Serve queries carry no filename: the sniff tier must handle
    ISO-BMFF JXL (via the ftyp branch) and PDFs with preamble bytes."""
    img = _gradient(40, 56)
    code = jxl.encode_jxl(img)
    assert code is not None
    # wrap the codestream in the ISO-BMFF container (JXL spec boxes)
    def box(tag, payload):
        return (len(payload) + 8).to_bytes(4, "big") + tag + payload
    container = (box(b"JXL ", b"\x0d\x0a\x87\x0a")
                 + box(b"ftyp", b"jxl \x00\x00\x00\x00jxl ")
                 + box(b"jxlc", code))
    out = decode.sniff_decode_bytes(container)
    assert out is not None and np.array_equal(out[..., :3], img)

    pdf = _make_pdf([_image_obj(56, 40, b"/DCTDecode", b"/DeviceRGB",
                                _jpeg_bytes(img))])
    out = decode.sniff_decode_bytes(b"\xef\xbb\xbfjunkheader" + pdf)
    assert out is not None and out.shape[:2] == (40, 56)
