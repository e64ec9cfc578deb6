"""End-to-end host pipeline: walk, decode, cache tiers, scan_and_group."""
import os
import shutil
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from rupphash_tpu.cache.store import CacheStore
from rupphash_tpu.pipeline import decode, exif, scan, walker
from rupphash_tpu.utils import hashes as H


@pytest.fixture
def corpus(tmp_path):
    """A small synthetic corpus: an original, a re-encode, a rotation,
    an exact byte copy, and two unrelated images."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    # smooth it so JPEG survives re-encode with low distortion
    base = np.asarray(Image.fromarray(base).resize((640, 480), Image.BILINEAR))

    d = tmp_path / "photos"
    (d / "sub").mkdir(parents=True)
    Image.fromarray(base).save(d / "orig.png")
    Image.fromarray(base).save(d / "reencode.jpg", quality=92)
    Image.fromarray(np.rot90(base, k=3).copy()).save(d / "rot90.png")
    shutil.copyfile(d / "orig.png", d / "sub" / "copy.png")
    other = np.asarray(Image.fromarray(
        rng.integers(0, 256, (60, 80, 3), dtype=np.uint8)).resize(
        (640, 480), Image.BILINEAR))
    Image.fromarray(other).save(d / "other.png")
    Image.fromarray(255 - other).save(d / "inverted.png")
    (d / "notes.txt").write_text("not an image")
    return d


def test_collect_files(corpus):
    files = walker.collect_files([corpus])
    names = {f.name for f in files}
    assert "notes.txt" not in names
    assert {"orig.png", "reencode.jpg", "rot90.png", "copy.png",
            "other.png", "inverted.png"} <= names
    # duplicate path arguments dedup
    files2 = walker.collect_files([corpus, corpus])
    assert len(files2) == len(files)


def test_collect_files_symlinks(corpus):
    """Canonicalization is per-directory with a per-file realpath only
    for symlinks: link-to-image dedups against its target, the gate runs
    on the *resolved* name, and directory symlinks are not followed
    (os.walk semantics)."""
    base = walker.collect_files([corpus])
    # symlink to an already-collected image dedups to one entry
    (corpus / "alias.png").symlink_to(corpus / "orig.png")
    files = walker.collect_files([corpus])
    assert len(files) == len(base)
    # extension gate applies to the resolved target, both directions
    (corpus / "link.txt").symlink_to(corpus / "other.png")     # in
    (corpus / "link.jpg").symlink_to(corpus / "notes.txt")     # out
    names = {f.name for f in walker.collect_files([corpus])}
    assert "other.png" in names and "notes.txt" not in names
    assert "link.jpg" not in names
    # a directory symlink is not descended (no duplicate of sub/copy.png)
    (corpus / "subdir_link").symlink_to(corpus / "sub",
                                        target_is_directory=True)
    files3 = walker.collect_files([corpus])
    assert sum(1 for f in files3 if f.name == "copy.png") == 1


def test_decode_tiers(corpus):
    img, res = decode.load_image(corpus / "orig.png")
    assert img is not None and res == (640, 480)
    img, res = decode.load_image(corpus / "notes.txt")
    assert img is None


def test_jpeg_carver():
    from io import BytesIO
    buf = BytesIO()
    arr = np.random.default_rng(1).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    Image.fromarray(arr).save(buf, format="JPEG")
    jpeg = buf.getvalue()
    fake_raw = b"\x00" * 1000 + jpeg + b"\xff" * 100
    out = decode.extract_largest_jpeg(fake_raw, min_bytes=100)
    assert out is not None and out.shape[:2] == (32, 32)


def test_scan_and_group_end_to_end(corpus):
    cfg = scan.ScanConfig(similarity=40, batch_size=4)
    groups, infos, records, stats = scan.scan_and_group([corpus], cfg)
    assert stats.total >= 6
    assert stats.failed == 0
    # the original, re-encode, rot90 and byte-copy must land in one group
    gnames = [sorted(f.path.name for f in g) for g in groups]
    target = next((g for g in gnames if "orig.png" in g), None)
    assert target is not None
    assert {"orig.png", "reencode.jpg", "rot90.png", "copy.png"} <= set(target)
    # unrelated images must not join it
    assert "other.png" not in target and "inverted.png" not in target


def test_scan_cache_roundtrip(corpus, tmp_path):
    store = CacheStore(tmp_path / "cache.db", master_key=b"\x01" * 32)
    cfg = scan.ScanConfig(batch_size=4)
    _, stats1 = scan.scan([corpus], cfg, store)
    assert stats1.decoded == 6 and stats1.cache_full == 0
    store.flush()
    records2, stats2 = scan.scan([corpus], cfg, store)
    assert stats2.cache_full == 6 and stats2.decoded == 0
    # cached records carry hashes + dihedral variants
    for r in records2:
        assert r.pdqhash is not None and r.dihedral is not None
    # rehash forces recompute
    _, stats3 = scan.scan([corpus], scan.ScanConfig(batch_size=4,
                                                    rehash=True), store)
    assert stats3.decoded == 6
    store.close()


def test_cached_and_fresh_hashes_agree(corpus, tmp_path):
    store = CacheStore(tmp_path / "c2.db", master_key=b"\x02" * 32)
    fresh, _ = scan.scan([corpus], scan.ScanConfig(batch_size=4), store)
    store.flush()
    cached, _ = scan.scan([corpus], scan.ScanConfig(batch_size=4), store)
    fmap = {r.path: r for r in fresh}
    for r in cached:
        assert r.pdqhash == fmap[r.path].pdqhash
        assert r.pdq_quality == fmap[r.path].pdq_quality
        assert np.array_equal(r.dihedral, fmap[r.path].dihedral)
    store.close()


def test_pixel_hash_tier(corpus, tmp_path):
    store = CacheStore(tmp_path / "c3.db", master_key=b"\x03" * 32)
    cfg = scan.ScanConfig(batch_size=4, pixel_hash=True)
    records, _ = scan.scan([corpus], cfg, store)
    by_name = {r.path.name: r for r in records}
    # png original and its byte copy share pixel hash
    assert by_name["orig.png"].pixel_hash == by_name["copy.png"].pixel_hash
    assert by_name["orig.png"].pixel_hash != by_name["other.png"].pixel_hash
    store.close()


def test_hardlink_identity(tmp_path):
    d = tmp_path / "hl"
    d.mkdir()
    arr = np.zeros((64, 64, 3), dtype=np.uint8)
    Image.fromarray(arr).save(d / "a.png")
    os.link(d / "a.png", d / "b.png")
    records, _ = scan.scan([d], scan.ScanConfig(batch_size=2))
    assert records[0].unique_file_id == records[1].unique_file_id
    groups = walker.dedup_hardlinks(records)
    assert len(groups) == 1


def test_exif_gps_and_sun():
    """The Kaanapali fixture documents the GPS-UTC-vs-local regression
    (tests/Kaanapali_*.txt): sun must compute from satellite time."""
    fix = Path("/root/reference/tests/"
               "Kaanapali_beach_sunrise_on_Maui_Hawaii.720p.jpg")
    if not fix.exists():
        pytest.skip("fixture unavailable")
    feats = exif.extract(fix)
    assert feats["gps"] is not None
    lat, lon = feats["gps"]
    assert abs(lat - 20.91297) < 0.001
    assert abs(lon - (-156.69383)) < 0.001
    sun = exif.derive_sun_position(feats, use_gps_time=True)
    assert sun is not None
    assert abs(sun["sun_altitude"] - (-2.9160)) < 0.3
    assert abs(sun["sun_azimuth"] - 288.2067) < 0.3


def test_gps_validity_rules():
    assert not exif.gps_valid(0.0, 0.0)          # Null Island
    assert not exif.gps_valid(float("nan"), 10)
    assert not exif.gps_valid(91.0, 10.0)
    assert not exif.gps_valid(10.0, 181.0)
    assert exif.gps_valid(61.5, 23.8)


def test_dms_conversion():
    assert abs(exif.dms_to_decimal([20, 54, 46.7], "N") - 20.912972) < 1e-4
    assert exif.dms_to_decimal([156, 41, 37.8], "W") < 0


def test_scan_process_pool_path(tmp_path):
    """Force the spawn-based process pool (>=64 misses, workers>1): the
    1-core CI box otherwise never exercises heavy_prepare pickling or
    the as_completed merge path."""

    rng = np.random.default_rng(0)
    d = tmp_path / "many"
    d.mkdir()
    base = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((96, 96),
                                                  Image.BILINEAR))
    for i in range(66):
        arr = img.copy()
        arr[0, 0, 0] = i
        Image.fromarray(arr).save(d / f"f{i:03d}.png")
    records, stats = scan.scan([d], scan.ScanConfig(workers=2,
                                                    batch_size=32))
    assert stats.failed == 0 and stats.hashed == 66
    assert all(r.pdqhash is not None and r.resolution == (96, 96)
               for r in records)
    # all near-identical: one big group
    from rupphash_tpu.grouping import engine
    groups, infos, _ = engine.group_files(records, similarity=40)
    assert len(groups) == 1 and len(groups[0]) == 66


def test_scan_device_sink_aligns_with_records(tmp_path):
    """scan(device_sink=...) retains per-batch device dihedral arrays
    aligned row-for-row with the records (fresh hashes, cache hits,
    and hardlink clones all get rows), and the grouping gather produces
    identical edges to the host-array path."""
    import os

    import numpy as np
    from PIL import Image

    from rupphash_tpu.cache.store import CacheStore
    from rupphash_tpu.grouping import engine
    from rupphash_tpu.ops import hamming
    from rupphash_tpu.pipeline import scan

    d = tmp_path / "s"
    d.mkdir()
    rng = np.random.default_rng(8)
    base = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    im = Image.fromarray(base).resize((320, 240), Image.BILINEAR)
    im.save(d / "a.png")
    im.save(d / "a_twin.jpg", quality=92)
    Image.fromarray(rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
                    ).resize((320, 240), Image.BILINEAR).save(
        d / "other.png")
    os.link(d / "a.png", d / "clone.png")

    store = CacheStore(tmp_path / "c.db", master_key=b"\x02" * 32)

    def run():
        sink = []
        records, stats = scan.scan([d], scan.ScanConfig(batch_size=2),
                                   store, device_sink=sink)
        assert stats.failed == 0
        files = sorted(records, key=lambda r: r.path.name)
        idx = [i for i, f in enumerate(files) if f.pdqhash is not None]
        var_sel = engine._resident_rows(files, idx, sink)
        assert var_sel is not None, "a record lacked a device row"
        low = np.array([files[i].is_low_quality for i in idx])
        ei, ej = hamming.find_edges_fast_resident(var_sel, low, 31)
        base_h = np.stack([np.frombuffer(files[i].pdqhash, np.uint8)
                           for i in idx])
        variants = np.stack([files[i].dihedral for i in idx])
        wi, wj = hamming.find_edges_fast(base_h, variants, low, 31)
        assert np.array_equal(ei, wi) and np.array_equal(ej, wj)
        # the duplicate pair + hardlink clone all interconnect
        names = {files[i].path.name for i in idx}
        assert {"a.png", "a_twin.jpg", "clone.png"} <= names
        assert len(ei) >= 3
        return stats

    s1 = run()
    assert s1.decoded == 3          # clone deduped by (dev, inode)
    store.flush()
    s2 = run()                      # warm: the cache-hit sink path
    assert s2.cache_full == 3
    store.close()


def test_probe_and_dihedral_chunking(tmp_path, monkeypatch):
    """The warm-rescan probe and the cached-dihedral regen run in
    bounded chunks (peak RAM is O(chunk), not O(corpus)).  With chunk
    size forced below the corpus size the results must be identical:
    full cache hits, per-record hashes/dihedrals, and a device sink
    whose per-batch rows still satisfy the device_slot contract."""
    import numpy as np
    from PIL import Image

    from rupphash_tpu.cache.store import CacheStore
    from rupphash_tpu.grouping import engine
    from rupphash_tpu.ops import hamming
    from rupphash_tpu.pipeline import scan

    d = tmp_path / "s"
    d.mkdir()
    rng = np.random.default_rng(11)
    for k in range(5):
        arr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).resize((320, 240), Image.BILINEAR).save(
            d / f"f{k}.png")

    store = CacheStore(tmp_path / "c.db", master_key=b"\x07" * 32)
    cold, _ = scan.scan([d], scan.ScanConfig(batch_size=4), store)
    store.flush()

    monkeypatch.setattr(scan, "_PROBE_CHUNK", 2)
    monkeypatch.setattr(scan, "_DIHEDRAL_CHUNK", 2)
    sink = []
    warm, stats = scan.scan([d], scan.ScanConfig(batch_size=4), store,
                            device_sink=sink)
    assert stats.cache_full == 5 and stats.decoded == 0
    assert len(sink) == 3          # 5 cache hits in chunks of 2
    cmap = {r.path: r for r in cold}
    for r in warm:
        assert r.pdqhash == cmap[r.path].pdqhash
        assert np.array_equal(r.dihedral, cmap[r.path].dihedral)
    # device rows stay aligned with records across the chunked batches
    files = sorted(warm, key=lambda r: r.path.name)
    idx = list(range(len(files)))
    var_sel = engine._resident_rows(files, idx, sink)
    assert var_sel is not None
    host = np.stack([f.dihedral for f in files])
    assert np.array_equal(np.asarray(var_sel), host)
    store.close()


def test_device_slot_contract(tmp_path, capsys):
    """The device-resident grouping contract: records carry an explicit
    (batch, row) device_slot stamp.  dataclasses.replace copies keep the
    zero-re-upload path; reconstructed records (no stamp) degrade
    LOUDLY — [GROUP] trace tag + GROUP-RESIDENT-FALLBACK counter — not
    silently."""
    import dataclasses

    import numpy as np
    from PIL import Image

    from rupphash_tpu.grouping import engine
    from rupphash_tpu.pipeline import scan
    from rupphash_tpu.utils import trace

    d = tmp_path / "s"
    d.mkdir()
    rng = np.random.default_rng(11)
    for k in range(3):
        Image.fromarray(rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
                        ).resize((320, 240), Image.BILINEAR).save(
            d / f"f{k}.png")

    sink = []
    records, stats = scan.scan([d], scan.ScanConfig(batch_size=2),
                               device_sink=sink)
    assert stats.failed == 0 and sink
    idx = list(range(len(records)))
    assert all(r.device_slot is not None for r in records)

    # a copied record list still routes resident (the stamp survives)
    copies = [dataclasses.replace(r) for r in records]
    assert engine._resident_rows(copies, idx, sink) is not None

    # a reconstructed list (stampless) degrades loudly
    rebuilt = [engine.FileRecord(path=r.path, pdqhash=r.pdqhash,
                                 pdq_quality=r.pdq_quality,
                                 dihedral=r.dihedral) for r in records]
    before = trace.counters().get("GROUP-RESIDENT-FALLBACK", 0)
    assert engine._resident_rows(rebuilt, idx, sink) is None
    assert trace.counters()["GROUP-RESIDENT-FALLBACK"] == before + 1
    assert "device-resident path unavailable" in capsys.readouterr().err

    # a stale stamp pointing at a different record's row is rejected
    swapped = [dataclasses.replace(r) for r in records]
    swapped[0].device_slot = swapped[1].device_slot
    assert engine._resident_rows(swapped, idx, sink) is None


def test_device_resident_group_skips_host_arrays(tmp_path, monkeypatch):
    """Regression: group_files on the device-resident branch must not
    materialize the host base/variants stacks — at the 1M headline
    scale that is a ~244 MiB allocation built by a million-iteration
    Python loop on the one-core host, for arrays the branch never
    reads.  Poisoned dihedral attributes prove the stacks are built
    lazily only on the branches that need them."""
    import dataclasses

    import jax
    import numpy as np
    from PIL import Image

    from rupphash_tpu.grouping import engine
    from rupphash_tpu.pipeline import scan

    d = tmp_path / "s"
    d.mkdir()
    rng = np.random.default_rng(23)
    for k in range(3):
        Image.fromarray(rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
                        ).resize((320, 240), Image.BILINEAR).save(
            d / f"f{k}.png")
    sink = []
    records, stats = scan.scan([d], scan.ScanConfig(batch_size=2),
                               device_sink=sink)
    assert stats.failed == 0 and sink

    class Poison:
        def __array__(self, *a, **k):
            raise AssertionError(
                "host variants materialized on the device-resident path")

    poisoned = [dataclasses.replace(r, dihedral=Poison())
                for r in records]
    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **kw: one)
    groups, infos, edges = engine.group_files(
        poisoned, use_device=True, device_batches=sink)
    assert groups == [] and edges == 0


def test_png_exif_chunk_walk():
    """PNG EXIF extraction must not pay PIL's full-image decode:
    a direct eXIf chunk walk reads the same blob, preserving the tag
    sweep for EXIF-bearing PNGs and fast-skipping the common bare
    case (round-4 decode-profile finding: getexif() decoded every
    PNG at scan rate)."""
    import io

    import numpy as np
    from PIL import Image

    from rupphash_tpu.pipeline import exif as exifmod

    rng = np.random.default_rng(13)
    im = Image.fromarray(rng.integers(0, 256, (24, 32, 3), np.uint8))
    ex = Image.Exif()
    ex[274] = 6                         # orientation
    ex[306] = "2024:03:01 10:00:00"     # DateTime
    buf = io.BytesIO()
    im.save(buf, format="PNG", exif=ex)
    out = exifmod.extract(data=buf.getvalue())
    assert out["orientation"] == 6
    assert out["width"] == 32 and out["height"] == 24
    assert out["tags"].get("DateTime") == "2024:03:01 10:00:00"

    buf2 = io.BytesIO()
    im.save(buf2, format="PNG")
    out2 = exifmod.extract(data=buf2.getvalue())
    assert out2["orientation"] == 1 and out2["tags"] == {}


def test_png_text_exif_routes_to_pil():
    """A PNG whose EXIF rides an ImageMagick-style 'Raw profile type
    exif' tEXt chunk (no eXIf chunk) must still extract: the cheap
    chunk walk flags the text carrier and routes to im.getexif(),
    which decodes the hex profile — the fast-skip must not eat it."""
    import io

    import numpy as np
    from PIL import Image
    from PIL.PngImagePlugin import PngInfo

    from rupphash_tpu.pipeline import exif as exifmod

    rng = np.random.default_rng(14)
    im = Image.fromarray(rng.integers(0, 256, (16, 20, 3), np.uint8))
    ex = Image.Exif()
    ex[274] = 3
    raw = ex.tobytes()
    hexed = raw.hex()
    lines = [hexed[i:i + 72] for i in range(0, len(hexed), 72)]
    profile = "\nexif\n%8d\n%s" % (len(raw), "\n".join(lines))
    info = PngInfo()
    info.add_text("Raw profile type exif", profile)
    buf = io.BytesIO()
    im.save(buf, format="PNG", pnginfo=info)
    out = exifmod.extract(data=buf.getvalue())
    assert out["orientation"] == 3


def test_collect_files_deep_tree(tmp_path):
    """The walk is iterative (explicit stack): a tree deeper than the
    Python recursion limit must not RecursionError (os.walk parity)."""
    import os
    d = str(tmp_path)
    for _ in range(1100):
        d = d + "/0"
        os.mkdir(d)
    open(d + "/x.png", "wb").write(b"\x89PNG\r\n\x1a\n" + b"0" * 20)
    files = walker.collect_files([tmp_path])
    assert len(files) == 1 and files[0].name == "x.png"
