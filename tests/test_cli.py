"""CLI frontend: argument surface, scan/list flow, ignore lifecycle."""
import numpy as np
import pytest
from PIL import Image

from rupphash_tpu import cli


@pytest.fixture
def corpus(tmp_path, monkeypatch):
    monkeypatch.setenv("RUPPHASH_CONFIG_DIR", str(tmp_path / "cfg"))
    monkeypatch.setenv("RUPPHASH_CACHE_DIR", str(tmp_path / "cache"))
    d = tmp_path / "photos"
    d.mkdir()
    rng = np.random.default_rng(0)
    base = np.asarray(Image.fromarray(
        rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)).resize(
        (320, 240), Image.BILINEAR))
    Image.fromarray(base).save(d / "a.png")
    Image.fromarray(base).save(d / "b.jpg", quality=92)
    Image.fromarray(rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)).save(
        d / "c.png")
    return d


def test_parser_surface():
    p = cli.build_parser()
    args = p.parse_args(["--similarity", "31", "--pixel-hash", "--sort",
                         "size-desc", "--use-trash", "/tmp/x"])
    assert args.similarity == 31 and args.pixel_hash
    assert args.sort == "size-desc"


def test_similarity_validation(capsys):
    assert cli.main(["--similarity", "99", "/tmp"]) == 2


def test_paths_required(capsys):
    assert cli.main([]) == 2


def test_show_build_info(capsys):
    assert cli.main(["--show-build-info"]) == 0
    out = capsys.readouterr().out
    assert "rupphash_tpu" in out and "jax" in out


def test_show_exif_tags(capsys):
    assert cli.main(["--show-exif-tags"]) == 0
    out = capsys.readouterr().out
    assert "SunAzimuth" in out and "DateTimeOriginal" in out


def test_scan_list_flow(corpus, capsys):
    rc = cli.main([str(corpus)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "duplicate groups" in out
    assert "a.png" in out and "b.jpg" in out
    assert "c.png" not in out


def test_rehash_only(corpus, capsys):
    assert cli.main(["--rehash-only", str(corpus)]) == 0


def test_prune_and_ignored_flow(corpus, capsys):
    assert cli.main([str(corpus)]) == 0
    capsys.readouterr()
    assert cli.main(["--show-ignored"]) == 0
    assert capsys.readouterr().out == ""  # registered but not ignored
    assert cli.main(["--prune", "0"]) == 0
    out = capsys.readouterr().out
    assert "Pruned" in out


def test_no_cache_flow(corpus, capsys):
    assert cli.main(["--no-cache", str(corpus)]) == 0
    assert "duplicate groups" in capsys.readouterr().out


def test_format_size():
    assert cli.format_size(512) == "512 B"
    assert cli.format_size(2048) == "2.0 KiB"
    assert "MiB" in cli.format_size(5 * 1024 * 1024)
