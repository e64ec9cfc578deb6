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
