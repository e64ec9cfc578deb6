"""HEIC decode through the system libheif binding (gated)."""
import numpy as np
import pytest

from rupphash_tpu.native import heif


pytestmark = pytest.mark.skipif(heif._load() is None,
                                reason="libheif unavailable")


def test_version():
    v = heif.version()
    assert v and v[0].isdigit()


@pytest.fixture(scope="module")
def heic_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("heic")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    from PIL import Image
    rgb = np.asarray(Image.fromarray(base).resize((128, 96),
                                                  Image.BILINEAR))
    p = d / "sample.heic"
    if not heif.encode_heif_file(rgb, p):
        pytest.skip("no HEVC encoder plugin")
    return p, rgb


def test_heic_roundtrip(heic_file):
    p, rgb = heic_file
    out = heif.decode_heif(p.read_bytes())
    assert out is not None
    assert out.shape == rgb.shape
    # lossy but close
    assert float(np.abs(out.astype(int) - rgb.astype(int)).mean()) < 12


def test_heic_through_pipeline(heic_file, tmp_path):
    from rupphash_tpu.pipeline import decode, scan

    p, rgb = heic_file
    img, res = decode.load_image(p)
    assert img is not None and res == (128, 96)
    # full scan path hashes it
    import shutil
    d = tmp_path / "s"
    d.mkdir()
    shutil.copyfile(p, d / "a.heic")
    from PIL import Image
    Image.fromarray(rgb).save(d / "b.png")
    groups, infos, records, stats = scan.scan_and_group(
        [d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 0
    # HEIC and its PNG twin group together
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"a.heic", "b.png"}


def test_decode_garbage_returns_none():
    assert heif.decode_heif(b"not a heif file") is None
