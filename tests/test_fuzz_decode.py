"""Mutation fuzz over the pure-Python untrusted-input parsers.

Scan directories are untrusted input; beyond the native-codec fuzz in
test_rawcontainers.py, the Python parsers' failure class is hangs
(non-terminating parse loops) and uncontained exceptions.  Each
iteration runs under a SIGALRM budget so a stuck loop fails the test
instead of wedging the scanner (this caught a real one: a stray
delimiter byte made the PDF tokenizer yield empty tokens forever).
"""
import io
import signal
import warnings

import numpy as np
import pytest

from rupphash_tpu.pipeline import animated, decode, exif
from test_pdfraster import make_pdf


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout


@pytest.fixture(scope="module")
def seeds():
    from PIL import Image

    rng = np.random.default_rng(5)
    base = rng.integers(30, 220, (24, 32, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((96, 64),
                                                  Image.BILINEAR))
    out = []
    for fmt, kw in (("JPEG", {}), ("PNG", {}), ("WEBP", {})):
        b = io.BytesIO()
        Image.fromarray(img).save(b, fmt, **kw)
        out.append(b.getvalue())
    gif = io.BytesIO()
    Image.fromarray(img).convert("P").save(
        gif, "GIF", save_all=True, duration=50,
        append_images=[Image.fromarray(img[::-1]).convert("P")])
    out.append(gif.getvalue())
    out.append(make_pdf(b"0.9 0.2 0.2 rg 20 20 120 80 re f "
                        b"0 0 1 RG 4 w 10 10 m 180 140 l S"))
    return out


def test_decoders_survive_mutations(seeds):
    rng = np.random.default_rng(6)
    old = signal.signal(signal.SIGALRM, _alarm)
    hangs = 0
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            for seed in seeds:
                buf = bytearray(seed)
                for _ in range(20):
                    n_mut = int(rng.integers(1, 10))
                    pos = rng.integers(0, len(buf), n_mut)
                    saved = [(int(p), buf[int(p)]) for p in pos]
                    for p in pos:
                        buf[int(p)] = int(rng.integers(0, 256))
                    data = bytes(buf)
                    signal.alarm(20)
                    try:
                        decode.sniff_decode_bytes(data)
                        exif.extract(data=data)
                        animated.is_animated_webp(data)
                        animated.is_animated_gif(data)
                        animated.is_animated_png(data)
                    except _Timeout:
                        hangs += 1
                    except Exception:
                        pass  # contained per-file failure is the contract
                    finally:
                        signal.alarm(0)
                    for p, v in saved:
                        buf[p] = v
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    assert hangs == 0


def _truetype_subset_seed() -> bytes | None:
    """A ~4.5 KB DejaVuSans subset (A, o, composite é, space): small
    enough that random byte flips land in every table the parser
    walks (glyf, loca, cmap, hmtx, head)."""
    import io

    path = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
    try:
        from fontTools import subset
        from fontTools.ttLib import TTFont

        f = TTFont(path)
        ss = subset.Subsetter(subset.Options())
        ss.populate(text="Aoé ")
        ss.subset(f)
        b = io.BytesIO()
        f.save(b)
        return b.getvalue()
    except Exception:
        return None


def test_pdf_font_parsers_survive_mutations():
    """Round-5 attack surface: embedded font programs come out of
    untrusted PDFs, so the TrueType (glyf/loca/cmap/hmtx, composite
    recursion) and CFF (INDEX walk, Type2 charstring interpreter,
    subr recursion) parsers must terminate on mutated input —
    contained exceptions allowed, hangs and runaway parses not."""
    from rupphash_tpu.pipeline import pdffont, pdfraster
    from test_pdfraster import _build_test_cff, _cff_text_pdf

    cff_raw = bytes(_build_test_cff()[0])
    tt_raw = _truetype_subset_seed()

    def fuzz_cff(data: bytes):
        f = pdffont.CFFFont(data)
        for gid in range(6):
            f.glyph_contours(gid)
            f.glyph_width(gid)
        f.gid_for_name("A")
        f.gid_for_code(65)

    def fuzz_tt(data: bytes):
        f = pdffont.TrueTypeFont(data)
        for gid in range(8):
            f.glyph_contours(gid)
            f.advance(gid)
        f.gid_for_unicode(0x41)
        f.gid_for_unicode(0xE9)   # composite in the seed

    plans = [(cff_raw, fuzz_cff, 250)]
    if tt_raw is not None:
        plans.append((tt_raw, fuzz_tt, 250))
    # full pipeline: mutations inside the embedded font stream of a
    # real PDF must stay contained behind rasterize_first_page
    pdf = _cff_text_pdf(cff_raw)
    font_off = pdf.find(cff_raw)
    assert font_off > 0

    def fuzz_pdf(data: bytes):
        pdfraster.rasterize_first_page(data)

    rng = np.random.default_rng(8)
    old = signal.signal(signal.SIGALRM, _alarm)
    hangs = 0
    try:
        for seed, fn, iters in plans + [(pdf, fuzz_pdf, 12)]:
            buf = bytearray(seed)
            lo, hi = ((font_off, font_off + len(cff_raw))
                      if fn is fuzz_pdf else (0, len(buf)))
            for _ in range(iters):
                n_mut = int(rng.integers(1, 8))
                pos = rng.integers(lo, hi, n_mut)
                saved = [(int(p), buf[int(p)]) for p in pos]
                for p in pos:
                    buf[int(p)] = int(rng.integers(0, 256))
                signal.alarm(30)
                try:
                    fn(bytes(buf))
                except _Timeout:
                    hangs += 1
                except Exception:
                    pass  # contained per-file failure is the contract
                finally:
                    signal.alarm(0)
                for p, v in saved:
                    buf[p] = v
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    assert hangs == 0


def test_metadata_parsers_survive_mutations(seeds):
    """cICP detection, .cube LUT parsing, and the search query parser
    take user/file input too: random mutations and garbage strings must
    terminate (contained exceptions allowed, hangs not)."""
    from rupphash_tpu import search_index
    from rupphash_tpu.gui import lut
    from rupphash_tpu.pipeline import hdr

    rng = np.random.default_rng(7)
    old = signal.signal(signal.SIGALRM, _alarm)
    hangs = 0
    cube = ("TITLE \"t\"\nLUT_3D_SIZE 2\n"
            + "\n".join("0 0 0 1 1 1 0 1 0 1 0 1".split()) + "\n") * 2
    try:
        for seed in seeds[:2]:
            buf = bytearray(seed)
            for _ in range(15):
                pos = rng.integers(0, len(buf), 4)
                saved = [(int(p), buf[int(p)]) for p in pos]
                for p in pos:
                    buf[int(p)] = int(rng.integers(0, 256))
                signal.alarm(10)
                try:
                    hdr.detect_cicp(bytes(buf))
                except _Timeout:
                    hangs += 1
                except Exception:
                    pass
                finally:
                    signal.alarm(0)
                for p, v in saved:
                    buf[p] = v
        for _ in range(40):
            n = int(rng.integers(1, 60))
            junk = bytes(rng.integers(32, 127, n)).decode()
            signal.alarm(10)
            try:
                search_index.parse_search_query(junk)
                lut.parse_cube(junk)
                lut.parse_cube(cube[:int(rng.integers(0, len(cube)))])
            except _Timeout:
                hangs += 1
            except Exception:
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    assert hangs == 0
