"""CLI frontend: argument surface, scan/list flow, ignore lifecycle."""
import re

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
    assert re.search(r"Pruned \d+ stale", out)


def test_no_cache_flow(corpus, capsys):
    assert cli.main(["--no-cache", str(corpus)]) == 0
    assert "duplicate groups" in capsys.readouterr().out


def test_format_size():
    assert cli.format_size(512) == "512 B"
    assert cli.format_size(2048) == "2.0 KiB"
    assert "MiB" in cli.format_size(5 * 1024 * 1024)


def test_ignore_unignore_cli_roundtrip(tmp_path, monkeypatch):
    """End-to-end ignore flow at the CLI surface: ignore a group via
    AppState, see it filtered on rescan, then --unignore by path and by
    UUID hex brings it back (phdupes.rs --show-ignored/--unignore)."""
    import io
    import contextlib


    monkeypatch.setenv("RUPPHASH_CONFIG_DIR", str(tmp_path / "cfg"))
    monkeypatch.setenv("RUPPHASH_CACHE_DIR", str(tmp_path / "cache"))

    d = tmp_path / "pics"
    d.mkdir()
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((96, 64),
                                                  Image.BILINEAR))
    Image.fromarray(img).save(d / "a.png")
    arr = img.copy(); arr[0, 0, 0] ^= 1
    Image.fromarray(arr).save(d / "b.png")

    def run(argv):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli.main(argv)
        return rc, buf.getvalue()

    rc, out = run([str(d)])
    assert rc == 0 and "Found 1 duplicate groups" in out

    # ignore the group through the session-state API (what x/X do)
    from rupphash_tpu.cache import config as cfgmod
    from rupphash_tpu.cache.store import CacheStore
    from rupphash_tpu.grouping.engine import GroupInfo
    from rupphash_tpu.pipeline import scan as scanmod
    from rupphash_tpu.state import AppState, Intent

    cfg = cfgmod.load_config()
    store = CacheStore(cfgmod.cache_dir() / "cache.db",
                       cfg["_master_key_bytes"], start_writer=False)
    groups, infos, records, stats = scanmod.scan_and_group([d], None,
                                                           store)
    store.register_duplicate_groups(
        [[(f.content_hash, f.pdqhash) for f in g] for g in groups])
    st = AppState(groups, infos, store=store)
    st.handle_input(Intent.IGNORE_GROUP)   # arms confirm
    st.handle_input(Intent.IGNORE_GROUP)   # confirms
    store.flush()

    rc, out = run(["--show-ignored"])
    assert rc == 0 and "a.png" not in out  # listing shows hashes/uuids
    ignored = store.list_ignored()
    assert len(ignored) == 2
    store.close()

    # reference parity: the plain CLI listing does NOT filter ignored
    # groups (filter_ignored_groups lives only in the GUI's
    # check_reload, gui/app.rs:829; phdupes.rs:879 prints unfiltered)
    rc, out = run([str(d)])
    assert "Found 1 duplicate groups" in out

    # ...but the GUI scan path filters them (register_and_filter)
    from rupphash_tpu.cache.store import CacheStore as _CS
    st2 = _CS(cfgmod.cache_dir() / "cache.db",
              cfg["_master_key_bytes"], start_writer=False)
    g2, i2, r2, _ = scanmod.scan_and_group([d], None, st2)
    assert g2, "scan must still produce the group to filter"
    kept = [[f for f in g if not st2.is_ignored(f.content_hash)]
            for g in g2]
    assert all(len(g) <= 1 for g in kept)  # group fully ignored
    st2.close()

    # unignore by file path restores matching
    rc, out = run(["--unignore", str(d / "a.png"), str(d / "b.png")])
    assert "Cleared ignore flag on 2 entries." in out
    st3 = _CS(cfgmod.cache_dir() / "cache.db",
              cfg["_master_key_bytes"], start_writer=False)
    assert not any(st3.is_ignored(f.content_hash)
                   for g in g2 for f in g)
    st3.close()
