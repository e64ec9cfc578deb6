"""Near-duplicate lookup service: index, TPU query path, HTTP surface."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from PIL import Image

from rupphash_tpu import serve


def _photo(seed, size=(320, 240)):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    return np.asarray(Image.fromarray(base).resize(size, Image.BILINEAR))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    paths = []
    for i in range(4):
        p = d / f"img{i}.png"
        Image.fromarray(_photo(i)).save(p)
        paths.append(p)
    from rupphash_tpu.pipeline import scan
    records, stats = scan.scan(paths, scan.ScanConfig())
    assert stats.failed == 0
    return d, paths, records


def test_mesh_query_matches_single_device():
    """The mesh-sharded query path (corpus split over every device)
    must return exactly the single-device results, including the
    low-quality exact-only gate."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rupphash_tpu.parallel import sharded

    rng = np.random.default_rng(9)
    n = 203  # odd: exercises the 8*ndev padding
    hashes = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    ix = serve.HashIndex()
    for i in range(n):
        ix.add(f"/x/{i}.png", bytes(hashes[i]),
               quality=30 if i == 50 else 90)
    # queries: exact hit, 3-bit-flip hit, exact hit on the gated row
    q = np.zeros((3, 8, 32), dtype=np.uint8)
    q[0, :] = hashes[7]
    flip = hashes[120].copy()
    flip[0] ^= 0b111
    q[1, :] = flip
    q[2, :] = hashes[50]

    mesh = sharded.make_mesh(8)
    single = ix.query(q, similarity=8)
    meshed = ix.query(q, similarity=8, mesh=mesh)
    assert single == meshed
    assert meshed[0][0][:1] == (7,) and meshed[0][0][2] == 0
    assert any(i == 120 and d == 3 for i, _, d in meshed[1])
    assert meshed[2][0][0] == 50  # gated row still matches at dist 0
    # gated row must NOT match at nonzero distance
    q2 = np.zeros((1, 8, 32), dtype=np.uint8)
    g = hashes[50].copy()
    g[0] ^= 0b1
    q2[0, :] = g
    assert all(i != 50 for i, _, d in
               ix.query(q2, similarity=8, mesh=mesh)[0])


def test_mesh_query_radius_does_not_recompile():
    """Regression: /v1/query lets unauthenticated clients pick the
    radius per request.  The mesh path must trace similarity as an
    operand — baking it into the shard_map executable let 256 distinct
    values force 256 recompiles (minutes each on hardware)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rupphash_tpu.parallel import sharded

    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    ix = serve.HashIndex()
    for i in range(64):
        ix.add(f"/x/{i}.png", bytes(hashes[i]), quality=90)
    q = np.zeros((1, 8, 32), dtype=np.uint8)
    flip = hashes[9].copy()
    flip[0] ^= 0b11
    q[0, :] = flip

    mesh = sharded.make_mesh(8)
    serve._mesh_query_fn.cache_clear()
    fn = serve._mesh_query_fn(mesh)
    for sim in (2, 5, 8, 13, 21, 34):
        res = ix.query(q, similarity=sim, mesh=mesh)[0]
        assert any(i == 9 and d == 2 for i, _, d in res)
    # radius 0/1 exclude the 2-bit flip
    assert all(i != 9 for i, _, d in
               ix.query(q, similarity=1, mesh=mesh)[0])
    # one executable serves every radius: the serve-side factory cache
    # holds a single mesh-keyed entry, and the jit under it compiled a
    # single (shape, k)-keyed executable across all 7 radii
    assert serve._mesh_query_fn.cache_info().currsize == 1
    assert fn._cache_size() == 1


def test_index_build_save_load(corpus, tmp_path):
    d, paths, records = corpus
    ix = serve.HashIndex.from_records(records)
    assert len(ix) == 4
    f = tmp_path / "index.npz"
    ix.save(f)
    ix2 = serve.HashIndex.load(f)
    assert len(ix2) == 4
    assert np.array_equal(ix.hashes, ix2.hashes)
    assert ix.paths == ix2.paths


def test_query_finds_reencoded_and_rotated(corpus):
    d, paths, records = corpus
    ix = serve.HashIndex.from_records(records)
    svc = serve.NearDupService(ix)

    # re-encode img2 as JPEG, query bytes -> img2 is the best match
    buf = io.BytesIO()
    Image.fromarray(_photo(2)).save(buf, format="JPEG", quality=90)
    out = svc.query_bytes(buf.getvalue())
    assert out is not None and out["matches"]
    assert out["matches"][0]["path"].endswith("img2.png")
    assert out["matches"][0]["distance"] <= 16

    # physically rotate img1 90 degrees: dihedral variants still match
    buf = io.BytesIO()
    Image.fromarray(np.rot90(_photo(1))).save(buf, format="PNG")
    out = svc.query_bytes(buf.getvalue())
    assert out["matches"]
    assert out["matches"][0]["path"].endswith("img1.png")

    # unrelated photo: no match at tight threshold
    buf = io.BytesIO()
    Image.fromarray(_photo(99)).save(buf, format="PNG")
    out = svc.query_bytes(buf.getvalue(), similarity=10)
    assert out["matches"] == []

    # garbage bytes are rejected, not fatal
    assert svc.query_bytes(b"not an image") is None


def test_low_quality_index_entries_gate_to_exact(corpus):
    d, paths, records = corpus
    ix = serve.HashIndex.from_records(records)
    h = bytes(ix.hashes[0])
    ix2 = serve.HashIndex()
    ix2.add("lowq.png", h, quality=10)  # below PDQ_MIN_QUALITY
    # distance-0 query still matches
    var = np.asarray(records[0].dihedral, dtype=np.uint8)
    res = ix2.query(var[None], similarity=40)[0]
    assert res and res[0][2] == 0
    # a 1-bit-different query does not (exact-only gating)
    h2 = bytearray(h)
    h2[0] ^= 1
    var2 = var.copy()
    var2[:] = np.frombuffer(bytes(h2), dtype=np.uint8)
    res = ix2.query(var2[None], similarity=40)[0]
    assert res == []


def test_incremental_add(corpus):
    d, paths, records = corpus
    ix = serve.HashIndex.from_records(records[:2])
    svc = serve.NearDupService(ix)
    out = svc.add_path(str(paths[3]))
    assert out is not None and out["size"] == 3
    buf = io.BytesIO()
    Image.fromarray(_photo(3)).save(buf, format="JPEG", quality=92)
    res = svc.query_bytes(buf.getvalue())
    assert res["matches"][0]["path"].endswith("img3.png")


def test_http_surface(corpus):
    d, paths, records = corpus
    ix = serve.HashIndex.from_records(records)
    svc = serve.NearDupService(ix, roots=[d])
    httpd, port = svc.serve()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/stats", timeout=10) as r:
            st = json.loads(r.read())
        assert st["indexed"] == 4 and st["queries"] == 0

        buf = io.BytesIO()
        Image.fromarray(_photo(0)).save(buf, format="JPEG", quality=95)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/query?similarity=31",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert out["matches"][0]["path"].endswith("img0.png")

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/add?path={paths[1]}",
            data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert out["size"] == 5

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/query", data=b"junk",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 415

        # add/remove outside the indexed roots is refused (ADVICE r1:
        # remote callers must not probe arbitrary server-readable files)
        for ep in ("add", "remove"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/{ep}?path=/etc/passwd",
                data=b"", method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=10)
            assert ei.value.code == 403

        # a NUL byte in the path must 403 like any other bad path —
        # Path.resolve() raises ValueError (not OSError) on embedded
        # NULs, which used to escape as a traceback + connection reset
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/add?path=%00x",
            data=b"", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 403

        # oversized query body is rejected up front
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/query", data=b"x",
            headers={"Content-Length": str(serve.NearDupService.MAX_BODY
                                           + 1)}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()  # shutdown() leaves the socket bound


def test_quality_scale_is_0_to_100(corpus):
    """Regression: service quality must use the record scale (0-100),
    not the device's [0,1] — a [0,1] value gates every query to
    exact-only (quality<50 rule)."""
    d, paths, records = corpus
    svc = serve.NearDupService(serve.HashIndex.from_records(records))
    buf = io.BytesIO()
    Image.fromarray(_photo(0)).save(buf, format="PNG")
    variants, quality = svc.hash_bytes(buf.getvalue())
    assert quality > 1.5  # 0-100 scale, textured fixture is high
    assert quality == records[0].pdq_quality or \
        abs(quality - records[0].pdq_quality) <= 1


def test_nonzero_distance_match_not_gated(corpus):
    """A good-quality query must match at distance > 0."""
    d, paths, records = corpus
    ix = serve.HashIndex()
    # index a 2-bit-corrupted copy of img0's hash at good quality
    h = bytearray(records[0].pdqhash)
    h[0] ^= 0x03
    ix.add("near.png", bytes(h), quality=records[0].pdq_quality)
    svc = serve.NearDupService(ix)
    buf = io.BytesIO()
    Image.fromarray(_photo(0)).save(buf, format="PNG")
    out = svc.query_bytes(buf.getvalue())
    assert out["matches"], "distance-2 match must not be gated away"
    assert 0 < out["matches"][0]["distance"] <= 4


def test_add_path_quality_scale(corpus, tmp_path):
    d, paths, records = corpus
    ix = serve.HashIndex()
    svc = serve.NearDupService(ix)
    out = svc.add_path(str(paths[0]))
    assert out["quality"] > 1.5            # 0-100
    assert ix.quality[0] > 1               # persisted on record scale


def test_query_accepts_dng_and_pdf_bytes(corpus, tmp_path):
    """Queries arrive with no filename; the sniff tiering must handle
    DNG and PDF bodies, not just JPEG/PNG."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_dng import _scene, write_dng
    from test_jxl_pdf import _image_obj, _jpeg_bytes, _make_pdf

    rgb, mosaic = _scene(240, 320, seed=11)
    ix = serve.HashIndex()
    svc = serve.NearDupService(ix)
    p = tmp_path / "base.png"
    Image.fromarray(rgb).save(p)
    svc.add_path(str(p))

    out = svc.query_bytes(write_dng(mosaic))
    assert out is not None and out["matches"]
    assert out["matches"][0]["path"].endswith("base.png")

    pdf = _make_pdf([_image_obj(320, 240, b"/DCTDecode", b"/DeviceRGB",
                                _jpeg_bytes(rgb))])
    out = svc.query_bytes(pdf)
    assert out is not None and out["matches"]
    assert out["matches"][0]["path"].endswith("base.png")


def test_index_remove(corpus):
    d, paths, records = corpus
    ix = serve.HashIndex.from_records(records)
    n0 = len(ix)
    assert ix.remove(str(paths[1])) == 1
    assert len(ix) == n0 - 1
    assert str(paths[1]) not in ix.paths
    # removed entry no longer matches
    var = np.asarray(records[1].dihedral, dtype=np.uint8)
    res = ix.query(var[None], similarity=0)[0]
    assert all(p != str(paths[1]) for _, p, _ in res)
    assert ix.remove("/no/such") == 0


def test_topk_truncation_and_tie_order():
    """Device-side top-k selection: with more hits than max_results the
    best max_results come back sorted, distance ties resolving to the
    lower corpus index (the host stable-sort semantics it replaced);
    padded device rows never surface even for an all-zero query hash."""
    import numpy as np

    ix = serve.HashIndex()
    h0 = bytes(range(32))
    for i in range(40):
        ix.add(f"/dup/{i}.png", h0, quality=90)
    far = bytearray(h0)
    far[0] ^= 0xFF
    ix.add("/far.png", bytes(far), quality=90)
    qv = np.frombuffer(h0, dtype=np.uint8)[None, None, :].repeat(8, 1)
    hits = ix.query(qv, similarity=40, max_results=5)[0]
    assert len(hits) == 5
    assert [i for i, _, _ in hits] == [0, 1, 2, 3, 4]
    assert all(d == 0 for _, _, d in hits)

    # all-zero hashes match each other, and the device padding rows
    # (also all-zero bit patterns) must stay invisible
    ix2 = serve.HashIndex()
    for i in range(3):
        ix2.add(f"/z/{i}.png", b"\x00" * 32, quality=90)
    qz = np.zeros((1, 8, 32), dtype=np.uint8)
    hits = ix2.query(qz, similarity=0, max_results=100)[0]
    assert len(hits) == 3
    assert {i for i, _, _ in hits} == {0, 1, 2}


def test_similarity_clamped_to_hash_width():
    """A client-supplied radius >= nbits+1 must neither surface device
    padding rows (IndexError on the paths tuple) nor bypass the
    low-quality exact-only gate."""
    import numpy as np

    ix = serve.HashIndex()
    for i in range(5):  # n=5: device pads to 8 rows
        ix.add(f"/f/{i}.png", bytes([i]) * 32, quality=90)
    ix.add("/lowq.png", bytes([250]) * 32, quality=10)
    qv = np.zeros((1, 8, 32), dtype=np.uint8)
    hits = ix.query(qv, similarity=10_000, max_results=100)[0]
    idxs = {i for i, _, _ in hits}
    assert all(i < 6 for i in idxs)            # no padding rows
    assert not any(p == "/lowq.png" for _, p, _ in hits)  # gate holds


def test_concurrent_query_vs_remove_stress():
    """Queries racing add/remove must never crash or return paths that
    mismatch their indices (the mesh path once recomputed distances
    from live hashes with snapshot indices; single-device snapshots
    are captured under the lock)."""
    import threading

    import numpy as np

    ix = serve.HashIndex()
    rng = np.random.default_rng(30)
    hs = [bytes(rng.integers(0, 256, 32, dtype=np.uint8).tolist())
          for _ in range(64)]
    for i, h in enumerate(hs):
        ix.add(f"/s/{i}.png", h, quality=90)

    errors = []
    stop = threading.Event()

    def churn():
        k = 64
        while not stop.is_set():
            try:
                ix.add(f"/s/{k}.png", hs[k % 64], quality=90)
                ix.remove(f"/s/{k}.png")
                k += 1
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    t = threading.Thread(target=churn, daemon=True)
    t.start()
    try:
        for q in range(40):
            h = hs[q % 64]
            qv = np.frombuffer(h, dtype=np.uint8)[None, None, :]
            qv = qv.repeat(8, 1)
            hits = ix.query(qv, similarity=0)[0]
            # rows 0..63 are permanent, so a hit is guaranteed — an
            # empty result would mean the snapshot machinery broke
            assert hits, "query lost its guaranteed match"
            for idx, path, dist in hits:
                # the snapshot contract: index, path and distance agree
                assert path.startswith("/s/")
                assert dist == 0
    finally:
        stop.set()
        t.join(timeout=10)
    assert not errors, errors


def test_incremental_device_corpus_upload_traffic():
    """VERDICT r2 weak #2: add/remove must be O(delta) device traffic.
    Build a corpus, query once (full push), then interleave adds and
    removes with queries and assert the additional upload bytes scale
    with the delta — never with the corpus size."""
    import numpy as np

    rng = np.random.default_rng(42)
    ix = serve.HashIndex()
    n0 = 3000
    hs = rng.integers(0, 256, (n0 + 64, 32), dtype=np.uint8)
    for i in range(n0):
        ix.add(f"/c/{i}.png", bytes(hs[i]), quality=90)

    def q(h):
        v = np.asarray(h, np.uint8)[None, None, :].repeat(8, 1)
        return ix.query(v, similarity=4)[0]

    assert q(hs[5])  # first query: full push (cap 4096 x 33 B + query)
    base = serve.UPLOAD_BYTES

    # 40 adds + queries: each sync uploads O(rows) not O(corpus)
    for j in range(40):
        ix.add(f"/c/n{j}.png", bytes(hs[n0 + j]), quality=90)
        res = q(hs[n0 + j])
        assert any(p == f"/c/n{j}.png" for _, p, _ in res)
    added = serve.UPLOAD_BYTES - base
    # corpus is 3040*33 ~ 100 KB on device; 40 single-row syncs must
    # stay tiny: row pad (1*33) + status + index pads + query uploads
    # (8*32 variants each).  Generous bound: 40 * 4 KB.
    assert added < 40 * 4096, f"adds re-shipped the corpus: {added} B"

    base = serve.UPLOAD_BYTES
    for j in range(20):
        assert ix.remove(f"/c/{j}.png") == 1
        res = q(hs[j])
        assert all(p != f"/c/{j}.png" for _, p, _ in res)
    removed = serve.UPLOAD_BYTES - base
    assert removed < 20 * 4096, f"removes re-shipped: {removed} B"
    assert len(ix) == n0 + 40 - 20


def test_incremental_corpus_growth_and_compaction():
    """Capacity growth re-pushes once (amortized); compaction engages
    past 50% dead and preserves query exactness."""
    import numpy as np

    rng = np.random.default_rng(43)
    ix = serve.HashIndex()
    hs = rng.integers(0, 256, (3000, 32), dtype=np.uint8)
    for i in range(1000):
        ix.add(f"/g/{i}.png", bytes(hs[i]), quality=90)

    def q(h):
        v = np.asarray(h, np.uint8)[None, None, :].repeat(8, 1)
        return ix.query(v, similarity=4)[0]

    assert q(hs[0])            # push at cap 1024
    for i in range(1000, 1100):   # crosses capacity -> one re-push
        ix.add(f"/g/{i}.png", bytes(hs[i]), quality=90)
    assert q(hs[1099])
    assert ix._dev["cap"] == 2048
    # kill >50% -> compaction on next query
    for i in range(600):
        ix.remove(f"/g/{i}.png")
    res = q(hs[700])
    assert any(p == "/g/700.png" for _, p, _ in res)
    assert ix._n_dead == 0 and len(ix) == 500
    for i in range(600):
        assert all(p != f"/g/{i}.png" for _, p, _ in q(hs[i])), i


def test_query_index_is_live_compacted_after_remove():
    """The public match 'index' must align with .hashes/.paths (the
    live-compacted view) and with the mesh path's index space even
    while tombstones exist below the compaction threshold."""
    import numpy as np

    rng = np.random.default_rng(61)
    ix = serve.HashIndex()
    hs = rng.integers(0, 256, (10, 32), dtype=np.uint8)
    for i in range(10):
        ix.add(f"/r/{i}.png", bytes(hs[i]), quality=90)

    def q(h):
        v = np.asarray(h, np.uint8)[None, None, :].repeat(8, 1)
        return ix.query(v, similarity=0)[0]

    assert q(hs[5])[0][0] == 5
    assert ix.remove("/r/0.png") == 1      # tombstoned, not compacted
    assert ix._n_dead == 1
    idx5, path5, d5 = q(hs[5])[0]
    assert path5 == "/r/5.png" and d5 == 0
    # slot 5 is live position 4 after slot 0 died
    assert idx5 == 4
    assert ix.paths[idx5] == path5
    assert bytes(ix.hashes[idx5]) == bytes(hs[5])


def test_mesh_incremental_mutation_is_o_delta():
    """The mesh-sharded corpus now uses the same incremental machinery
    as the single-device path: adds/removes after the first push must
    upload O(delta) bytes, results must stay exact and index-aligned
    with the single-device path."""
    import numpy as np

    from rupphash_tpu.parallel import sharded

    mesh = sharded.make_mesh()
    rng = np.random.default_rng(63)
    ix = serve.HashIndex()
    hs = rng.integers(0, 256, (600, 32), dtype=np.uint8)
    for i in range(512):
        ix.add(f"/m/{i}.png", bytes(hs[i]), quality=90)

    def q(h, use_mesh):
        v = np.asarray(h, np.uint8)[None, None, :].repeat(8, 1)
        return ix.query(v, similarity=4,
                        mesh=mesh if use_mesh else None)[0]

    assert q(hs[5], True)           # first mesh push
    base = serve.UPLOAD_BYTES
    for j in range(20):
        ix.add(f"/m/n{j}.png", bytes(hs[512 + j]), quality=90)
        res = q(hs[512 + j], True)
        assert any(p == f"/m/n{j}.png" for _, p, _ in res)
    added = serve.UPLOAD_BYTES - base
    assert added < 20 * 4096, f"mesh adds re-shipped: {added} B"

    base = serve.UPLOAD_BYTES
    for j in range(10):
        assert ix.remove(f"/m/{j}.png") == 1
        assert all(p != f"/m/{j}.png" for _, p, _ in q(hs[j], True))
    removed = serve.UPLOAD_BYTES - base
    assert removed < 10 * 4096, f"mesh removes re-shipped: {removed} B"

    # index space identical between deployment modes under tombstones
    for probe in (30, 200, 515):
        a = q(hs[probe], True)
        b = q(hs[probe], False)
        assert a == b, (probe, a, b)


def test_http_browser_attack_gates(corpus):
    """serve's HTTP surface carries the same browser-borne-attack
    gates the GUI got (utils/netguard): DNS-rebound Host names are
    rejected on every endpoint unless allowlisted with --allow-host,
    and Origin-bearing mutation requests (browsers always attach
    Origin to cross-origin POSTs; curl/SDK clients do not) are
    refused so a hostile webpage cannot CSRF /v1/add or /v1/remove
    against a loopback service."""
    d, paths, records = corpus
    ix = serve.HashIndex.from_records(records)
    svc = serve.NearDupService(ix, roots=[d],
                               allow_hosts=("photos.internal",))
    httpd, port = svc.serve()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # rebound DNS name -> 403 everywhere
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/stats",
            headers={"Host": f"evil.example:{port}"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 403
        # the allowlisted deployment name passes
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/stats",
            headers={"Host": f"photos.internal:{port}"})
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())["indexed"] == 4
        # browser CSRF: Origin-bearing mutation -> 403, index unchanged
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/remove?path={paths[0]}",
            data=b"", method="POST",
            headers={"Origin": "http://evil.example"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 403
        assert len(ix) == 4
        # headless clients (no Origin) still mutate normally
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/remove?path={paths[0]}",
            data=b"", method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            assert json.loads(r.read())["removed"] == 1
        # Origin on the read-only query endpoint is fine (responses
        # are unreadable cross-origin; no mutation at stake)
        buf = io.BytesIO()
        Image.fromarray(_photo(1)).save(buf, format="JPEG", quality=95)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/query", data=buf.getvalue(),
            method="POST", headers={"Origin": "http://evil.example"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert "matches" in json.loads(r.read())
    finally:
        httpd.shutdown()
        httpd.server_close()
