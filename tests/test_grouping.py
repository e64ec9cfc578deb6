"""Grouping engine semantics: union-find, stem merge, analysis, sorting."""
from pathlib import Path

import numpy as np
import pytest

from rupphash_tpu.grouping import engine
from rupphash_tpu.ops import pdq_ref


def _rec(name, pdq=None, quality=100, content=b"", pixel=None, size=0,
         modified=0.0, exif_ts=None):
    return engine.FileRecord(
        path=Path(name), pdqhash=pdq, pdq_quality=quality,
        content_hash=content or name.encode(), pixel_hash=pixel,
        size=size, modified=modified, exif_timestamp=exif_ts)


def _hash_with_bits(seed, flip=()):
    h = np.random.default_rng(seed).integers(0, 256, 32, dtype=np.uint8)
    for p in flip:
        h[p // 8] ^= 1 << (p % 8)
    return h.tobytes()


def test_union_find_components():
    uf = engine.UnionFind(6)
    uf.union(0, 1)
    uf.union(1, 2)
    uf.union(4, 5)
    comps = uf.components()
    assert sorted(map(sorted, comps)) == [[0, 1, 2], [4, 5]]


def test_basic_grouping():
    h = _hash_with_bits(1)
    files = [
        _rec("/a/x1.jpg", pdq=h),
        _rec("/a/x2.jpg", pdq=_hash_with_bits(1, flip=range(5))),
        _rec("/a/unrelated.jpg", pdq=_hash_with_bits(99)),
    ]
    groups, infos, edges = engine.group_files(files, similarity=40)
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"x1.jpg", "x2.jpg"}
    assert infos[0].max_dist == 5
    assert edges == 1


def test_low_quality_gating():
    h = _hash_with_bits(2)
    near = _hash_with_bits(2, flip=range(3))
    files = [_rec("/a/a.jpg", pdq=h, quality=10),
             _rec("/a/b.jpg", pdq=near, quality=10)]
    groups, _, _ = engine.group_files(files, similarity=40)
    assert groups == []  # low quality: fuzzy match suppressed
    files = [_rec("/a/a.jpg", pdq=h, quality=10),
             _rec("/a/b.jpg", pdq=h, quality=10)]
    groups, _, _ = engine.group_files(files, similarity=40)
    assert len(groups) == 1  # exact match still pairs


def test_stem_merge():
    ha, hb = _hash_with_bits(3), _hash_with_bits(4)
    files = [
        _rec("/d/img1.jpg", pdq=ha),
        _rec("/d/img1_copy.jpg", pdq=_hash_with_bits(3, flip=[0])),
        _rec("/d/img1.nef", pdq=hb),           # same stem as img1.jpg
        _rec("/d/other.jpg", pdq=_hash_with_bits(4, flip=[1])),
    ]
    groups, _, _ = engine.group_files(files, similarity=40)
    # group {img1.jpg, img1_copy} and group {img1.nef, other.jpg} share the
    # stem "img1" in the same dir -> merged into one
    assert len(groups) == 1
    assert len(groups[0]) == 4


def test_analyze_group_identical_first_and_status():
    h = _hash_with_bits(5)
    same = b"\x01" * 32
    g = [
        _rec("/a/z_unique.jpg", pdq=h, content=b"u1"),
        _rec("/a/dup_b.jpg", pdq=h, content=same),
        _rec("/a/dup_a.jpg", pdq=h, content=same),
    ]
    info = engine.analyze_group(g, "name")
    assert info.status == "some-identical"
    assert {g[0].path.name, g[1].path.name} == {"dup_a.jpg", "dup_b.jpg"}
    g2 = [_rec("/a/1.jpg", pdq=h, content=same),
          _rec("/a/2.jpg", pdq=h, content=same)]
    assert engine.analyze_group(g2, "name").status == "all-identical"


def test_analyze_group_dihedral_pivot_max_dist():
    """max_dist uses min-over-dihedral distance when features exist, so a
    rotated member does not inflate the group distance."""
    coeffs = np.random.default_rng(6).normal(size=256).astype(np.float32)
    dihedral = np.stack([np.frombuffer(h, dtype=np.uint8)
                         for h in pdq_ref.dihedral_hashes(coeffs)])
    base = dihedral[0].tobytes()
    rot90 = dihedral[1].tobytes()
    g = [engine.FileRecord(path=Path("/a/a.jpg"), pdqhash=base,
                           content_hash=b"a", dihedral=dihedral),
         engine.FileRecord(path=Path("/a/b.jpg"), pdqhash=rot90,
                           content_hash=b"b")]
    info = engine.analyze_group(g, "name")
    assert info.max_dist == 0


def test_sort_orders():
    files = [_rec("img10.jpg", size=3, modified=30.0),
             _rec("img2.jpg", size=1, modified=10.0),
             _rec("img1.jpg", size=2, modified=20.0)]
    engine.sort_files(files, "name")
    assert [f.path.name for f in files] == ["img1.jpg", "img10.jpg", "img2.jpg"]
    engine.sort_files(files, "name-natural")
    assert [f.path.name for f in files] == ["img1.jpg", "img2.jpg", "img10.jpg"]
    engine.sort_files(files, "size-desc")
    assert [f.size for f in files] == [3, 2, 1]
    engine.sort_files(files, "date")
    assert [f.modified for f in files] == [10.0, 20.0, 30.0]


def test_natural_sort_mixed_leading_tokens():
    """Regression: natural_key must emit homogeneous tuples — a group
    mixing digit-leading and letter-leading names ('1.jpg' vs 'a.jpg')
    used to raise TypeError('<' not supported between str and int)
    inside sorted(), aborting the whole grouping run."""
    files = [_rec("a.jpg"), _rec("1.jpg"), _rec("IMG_2.jpg"),
             _rec("2023.jpg"), _rec("IMG_10.jpg")]
    engine.sort_files(files, "name-natural")
    assert [f.path.name for f in files] == [
        "1.jpg", "2023.jpg", "IMG_2.jpg", "IMG_10.jpg", "a.jpg"]
    engine.sort_files(files, "name-natural-desc")
    assert [f.path.name for f in files] == [
        "a.jpg", "IMG_10.jpg", "IMG_2.jpg", "2023.jpg", "1.jpg"]


def test_exif_date_sort_none_last():
    files = [_rec("a.jpg", exif_ts=None, modified=5.0),
             _rec("b.jpg", exif_ts=100),
             _rec("c.jpg", exif_ts=50)]
    engine.sort_files(files, "exif-date")
    assert [f.path.name for f in files] == ["c.jpg", "b.jpg", "a.jpg"]
    engine.sort_files(files, "exif-date-desc")
    assert [f.path.name for f in files] == ["b.jpg", "c.jpg", "a.jpg"]


def test_content_subgroups():
    g = [_rec("a", pixel=b"x"), _rec("b", pixel=b"y"), _rec("c", pixel=b"x"),
         _rec("d", pixel=None)]
    sub = engine.content_subgroups(g)
    assert sub[b"x"] == 1 and sub[b"y"] == 2


def test_group_ordering_identical_first():
    same = b"\x02" * 32
    ha = _hash_with_bits(7)
    hb = _hash_with_bits(8)
    files = [
        _rec("/a/p1.jpg", pdq=ha, content=same),
        _rec("/a/p2.jpg", pdq=ha, content=same),
        _rec("/b/q1.jpg", pdq=hb, content=b"q1"),
        _rec("/b/q2.jpg", pdq=_hash_with_bits(8, flip=range(9)), content=b"q2"),
    ]
    groups, infos, _ = engine.group_files(files, similarity=40)
    assert infos[0].status == "all-identical"
    assert infos[1].max_dist == 9


def test_real_near_duplicate_pair_groups(near_dupe_pair):
    from rupphash_tpu.ops import pdq_jax
    recs = []
    for i, img in enumerate(near_dupe_pair):
        luma = pdq_ref.prepare_luma(img)
        out = pdq_jax.pdq_hash_batch(luma[None])
        recs.append(engine.FileRecord(
            path=Path(f"/fix/prophecy_{i}.jpg"),
            pdqhash=bytes(np.asarray(out["hash"][0])),
            pdq_quality=int(float(out["quality"][0]) * 100),
            content_hash=str(i).encode(),
            dihedral=np.asarray(out["dihedral"][0])))
    groups, infos, _ = engine.group_files(recs, similarity=63)
    assert len(groups) == 1 and len(groups[0]) == 2


def test_group_files_above_device_threshold_on_cpu():
    """Regression: sessions with >2048 files route to the device edge
    search; on a CPU backend that must take the XLA tile path, not the
    hardware-only Pallas kernel (crashed with 'Only interpret mode is
    supported on CPU backend')."""
    rng = np.random.default_rng(0)
    n = 2600
    files = []
    for i in range(n):
        h = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        files.append(engine.FileRecord(
            path=__import__("pathlib").Path(f"/x/{i:05d}.jpg"),
            size=1, pdqhash=h, pdq_quality=90, unique_file_id=i))
    # plant a duplicate pair
    files[777].pdqhash = files[111].pdqhash
    groups, infos, edges = engine.group_files(files, similarity=8)
    assert len(groups) == 1
    assert {f.path.name for f in groups[0]} == {"00111.jpg", "00777.jpg"}


def test_union_find_adversarial_chain_is_shallow():
    """Union-by-size: a worst-case edge order (always appending a fresh
    singleton to the head of one growing component) must not build O(n)
    parent chains in the pure-Python UnionFind (scanner.rs:1780-1807
    guards the same with rank)."""
    n = 30_000
    uf = engine.UnionFind(n)
    # append each new node to the most recently added node: without
    # union-by-size this is a linked list and find(0) walks n parents
    for i in range(1, n):
        uf.union(i, i - 1)
    # with union-by-size the tree depth stays O(log n) pre-compression;
    # measure the raw chain from node 0 before any find() compresses it
    depth = 0
    p = uf.parent
    i = 0
    while i != p[i]:
        i = int(p[i])
        depth += 1
        assert depth <= 64, "parent chain degenerated to O(n)"
    comps = uf.components(min_size=2)
    assert len(comps) == 1 and len(comps[0]) == n


def test_apply_location_sort_orders_by_gps_path():
    """--sort location mirrors the reference's apply_location_sort
    (gui/app.rs:242-271): every group's files are reordered by their
    position along the GPS map's optimized marker path, files without
    GPS pushed to the end, previous relative order kept among them
    (stable sort = sort_by_key semantics)."""

    def gps_rec(name, gps):
        r = _rec(name)
        r.gps_pos = gps
        return r

    # markers along a west-to-east road trip, listed out of order
    sf = gps_rec("/p/sf.jpg", (37.7749, -122.4194))
    slc = gps_rec("/p/slc.jpg", (40.7608, -111.8910))
    den = gps_rec("/p/den.jpg", (39.7392, -104.9903))
    chi = gps_rec("/p/chi.jpg", (41.8781, -87.6298))
    nyc = gps_rec("/p/nyc.jpg", (40.7128, -74.0060))
    nogps_a = _rec("/p/zz_scan1.png")
    nogps_b = _rec("/p/zz_scan2.png")

    groups = [[chi, nogps_a, sf, nyc], [den, nogps_b, slc]]
    engine.apply_location_sort(groups)

    # both groups must follow ONE global ranking: the optimizer's own
    # path over the full marker set (the heuristic NN+2-opt path, so
    # the test pins the wiring, not a particular geographic order)
    from rupphash_tpu.utils import geo
    recs = [chi, sf, nyc, den, slc]         # seen-dict insertion order
    order = geo.order_markers([r.gps_pos for r in recs])
    rank = {recs[i].path.name: pos for pos, i in enumerate(order)}
    names = [f.path.name for f in groups[0] if f.gps_pos]
    assert names == sorted(names, key=rank.__getitem__), (names, rank)
    names2 = [f.path.name for f in groups[1] if f.gps_pos]
    assert names2 == sorted(names2, key=rank.__getitem__), (names2, rank)
    # GPS-less files sit at the end, original relative order kept
    assert [f.path.name for f in groups[0][-1:]] == ["zz_scan1.png"]
    assert groups[1][-1].path.name == "zz_scan2.png"

    # no GPS anywhere: a no-op, order untouched
    plain = [[_rec("/p/b.jpg"), _rec("/p/a.jpg")]]
    engine.apply_location_sort(plain)
    assert [f.path.name for f in plain[0]] == ["b.jpg", "a.jpg"]


def test_finalize_edges_location_sort():
    """finalize_edges applies the global GPS-path order when asked."""
    import numpy as np

    a = _rec("/p/one_a.jpg"); a.gps_pos = (40.0, -100.0)
    b = _rec("/p/one_b.jpg"); b.gps_pos = (40.0, -80.0)
    c = _rec("/p/one_c.jpg"); c.gps_pos = (40.0, -90.0)
    files = [a, b, c]
    gi, gj = np.array([0, 1]), np.array([1, 2])
    groups, infos, n = engine.finalize_edges(files, gi, gj,
                                             sort_order="location")
    assert n == 2 and len(groups) == 1
    lons = [f.gps_pos[1] for f in groups[0]]
    assert lons in ([-100.0, -90.0, -80.0], [-80.0, -90.0, -100.0]), lons
