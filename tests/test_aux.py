"""Aux subsystems: tracing, failure containment, multihost sharding,
fileops, animated/odd-file decode behavior."""
import os

import numpy as np
import pytest
from PIL import Image

from rupphash_tpu.parallel import multihost
from rupphash_tpu.utils import fileops, trace


def test_trace_counters_and_phase(capsys):
    trace.reset_counters()
    trace.count("CACHE-FULL")
    trace.count("CACHE-FULL")
    trace.count("CACHE-MISS")
    assert trace.counters() == {"CACHE-FULL": 2, "CACHE-MISS": 1}
    with trace.Phase("unit") as p:
        p.add(10)
    err = capsys.readouterr().err
    assert "[TIMING] unit:" in err and "10 items" in err
    trace.reset_counters()


def test_scan_failure_containment(tmp_path):
    """Undecodable files are skipped per-file, never fatally
    (scanner.rs:1488-1492)."""
    from rupphash_tpu.pipeline import scan

    d = tmp_path / "bad"
    d.mkdir()
    (d / "truncated.jpg").write_bytes(b"\xff\xd8\xff\xe0 garbage")
    (d / "empty.png").write_bytes(b"")
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(d / "ok.png")
    records, stats = scan.scan([d], scan.ScanConfig(batch_size=2))
    assert stats.failed == 2
    assert len([r for r in records if r.pdqhash]) == 1


def test_cache_corruption_is_a_miss(tmp_path):
    """A tampered value decrypts to nothing and reads as a cache miss
    (db.rs:685-693 semantics)."""
    from rupphash_tpu.cache.store import CacheStore, NS_HASH

    s = CacheStore(tmp_path / "c.db", master_key=b"\x0b" * 32,
                   start_writer=False)
    ch = b"\x01" * 32
    s.put_pdqhash(ch, b"\x02" * 32, 7)
    assert s.get_pdqhash(ch) is not None
    con = s._conn()
    row = con.execute("SELECT v FROM kv WHERE ns=? AND k=?",
                      (NS_HASH, ch)).fetchone()
    tampered = bytearray(row[0])
    tampered[-1] ^= 0xFF
    con.execute("UPDATE kv SET v=? WHERE ns=? AND k=?",
                (bytes(tampered), NS_HASH, ch))
    con.commit()
    assert s.get_pdqhash(ch) is None
    s.close()


def test_shard_files_partitions_completely():
    files = [f"/p/img{i:04d}.jpg" for i in range(1000)]
    for by in ("hash", "stride"):
        shards = [multihost.shard_files(files, pi, 4, by=by)
                  for pi in range(4)]
        combined = sorted(sum(shards, []))
        assert combined == sorted(files)
        sizes = [len(s) for s in shards]
        assert max(sizes) - min(sizes) < 200  # roughly balanced
    # single host: identity
    assert multihost.shard_files(files, 0, 1) == files


def test_allgather_single_process_identity():
    h = np.zeros((3, 32), dtype=np.uint8)
    out, v, l = multihost.allgather_hashes(h)
    assert out is h and v is None and l is None
    var = np.zeros((3, 8, 32), dtype=np.uint8)
    low = np.zeros(3, dtype=bool)
    out, v, l = multihost.allgather_hashes(h, var, low)
    assert out is h and v is var and l is low


def test_safe_move_no_replace(tmp_path):
    src = tmp_path / "a.txt"
    src.write_text("one")
    dst_dir = tmp_path / "out"
    dst_dir.mkdir()
    (dst_dir / "a.txt").write_text("existing")
    moved = fileops.safe_move(src, dst_dir)
    assert moved.name != "a.txt"          # never replaces
    assert (dst_dir / "a.txt").read_text() == "existing"
    assert moved.read_text() == "one"


def test_safe_move_name_truncation(tmp_path):
    long = tmp_path / ("x" * 240 + ".jpeg")
    long.write_text("data")
    out = tmp_path / "o"
    out.mkdir()
    moved = fileops.safe_move(long, out)
    assert moved.exists()
    assert len(moved.name.encode()) <= 255
    assert moved.suffix == ".jpeg"


def test_trash_file(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_DATA_HOME", str(tmp_path / "share"))
    f = tmp_path / "victim.png"
    f.write_bytes(b"png")
    moved = fileops.trash_file(f)
    assert not f.exists()
    assert moved.exists()
    info = tmp_path / "share/Trash/info" / (moved.name + ".trashinfo")
    assert info.exists()
    assert "victim.png" in info.read_text()


def test_animated_gif_first_frame_hashable(tmp_path):
    from rupphash_tpu.pipeline import decode

    frames = [Image.fromarray(np.full((32, 32, 3), c, np.uint8))
              for c in (10, 200)]
    p = tmp_path / "anim.gif"
    frames[0].save(p, save_all=True, append_images=frames[1:],
                   duration=100, loop=0)
    img, res = decode.load_image(p)
    assert img is not None and res == (32, 32)
    # first frame decoded: mean near 10, not near the 2-frame average
    assert float(np.asarray(img, dtype=np.float64).mean()) < 60


def test_backend_probe_states(tmp_path, monkeypatch):
    """The accelerator liveness probe (utils/backendprobe.py): skipped
    when CPU is forced or a recent marker exists, "ok" when the probe
    subprocess initializes a backend, CPU fallback (with a loud log
    line) when it times out or dies — the production answer to a dead
    TPU transport hanging device init forever."""
    import tempfile

    from rupphash_tpu.utils import backendprobe

    logs = []
    log = lambda *a: logs.append(" ".join(map(str, a)))

    # forced-CPU env short-circuits
    monkeypatch.setenv("RUPPHASH_PLATFORM", "cpu")
    assert backendprobe.ensure_backend_alive(log=log) == "skipped"
    monkeypatch.delenv("RUPPHASH_PLATFORM")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    # zero timeout disables
    monkeypatch.setenv("RUPPHASH_BACKEND_PROBE_S", "0")
    assert backendprobe.ensure_backend_alive(log=log) == "skipped"
    monkeypatch.delenv("RUPPHASH_BACKEND_PROBE_S")

    # isolate the marker file
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))

    # healthy probe: use a trivial subprocess (a real jax init costs
    # seconds and is exercised by every CLI run anyway)
    monkeypatch.setattr(backendprobe, "_PROBE_SNIPPET", "pass")
    assert backendprobe.ensure_backend_alive(timeout_s=30,
                                             log=log) == "ok"
    # the success marker makes the next call free
    assert backendprobe.ensure_backend_alive(timeout_s=30,
                                             log=log) == "skipped"
    assert not logs                     # no warnings so far

    # dead transport: the probe hangs -> timeout -> CPU fallback
    monkeypatch.setenv("RUPPHASH_BACKEND_PROBE_TTL_S", "0")
    monkeypatch.setattr(backendprobe, "_PROBE_SNIPPET",
                        "import time; time.sleep(60)")
    assert backendprobe.ensure_backend_alive(timeout_s=1,
                                             log=log) == "cpu-fallback"
    assert logs and "falling" in logs[-1] and "CPU" in logs[-1]

    # hard failure (plugin crash) -> CPU fallback too
    monkeypatch.setattr(backendprobe, "_PROBE_SNIPPET",
                        "raise SystemExit(3)")
    assert backendprobe.ensure_backend_alive(timeout_s=30,
                                             log=log) == "cpu-fallback"

    # use_ttl=False (bench.py / tpu_selftest): a FRESH success marker
    # must NOT stand in for a live probe — the tunnel can die right
    # after the marker was written, and these callers exist to catch
    # exactly that
    monkeypatch.delenv("RUPPHASH_BACKEND_PROBE_TTL_S")
    monkeypatch.setattr(backendprobe, "_PROBE_SNIPPET",
                        "raise SystemExit(3)")
    # the marker from the earlier healthy probe is still fresh...
    assert backendprobe.ensure_backend_alive(
        timeout_s=30, log=log) == "skipped"          # TTL path trusts it
    assert backendprobe.ensure_backend_alive(
        timeout_s=30, log=log, use_ttl=False) == "cpu-fallback"

    # marker hygiene: the marker lives in a 0o700 per-uid dir; if the
    # dir is tampered group-writable the marker is ignored (probe still
    # works, nothing crashes)
    import os
    mdir = tmp_path / f"rupphash-probe-{os.getuid()}"
    os.chmod(mdir, 0o755)
    assert backendprobe._marker_path() is None
    monkeypatch.setattr(backendprobe, "_PROBE_SNIPPET", "pass")
    assert backendprobe.ensure_backend_alive(timeout_s=30,
                                             log=log) == "ok"
