"""MXU all-pairs Hamming search vs brute-force oracle + scale injection."""
import numpy as np
import pytest

from rupphash_tpu.ops import hamming


def _rand_hashes(n, nbytes=32, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, nbytes),
                                                dtype=np.uint8)


def _flip_bits(h: np.ndarray, positions):
    out = h.copy()
    for p in positions:
        out[p // 8] ^= 1 << (p % 8)
    return out


def _edge_set(ei, ej):
    return set(zip(ei.tolist(), ej.tolist()))


def test_pm1_encode_roundtrip():
    h = _rand_hashes(4)
    pm = hamming.pm1_encode(h)
    assert pm.shape == (4, 256)
    assert set(np.unique(pm)) <= {-1, 1}
    # dot identity: bits - 2*hamming
    a, b = pm[0].astype(np.int32), pm[1].astype(np.int32)
    dist = int(np.unpackbits(h[0] ^ h[1]).sum())
    assert int(a @ b) == 256 - 2 * dist


def test_find_edges_matches_oracle_random():
    base = _rand_hashes(300, seed=1)
    # inject near-duplicates
    base[37] = _flip_bits(base[12], range(10))
    base[205] = _flip_bits(base[12], range(25))
    oi, oj = hamming.brute_force_edges(base, similarity=40)
    di, dj = hamming.find_edges(base, similarity=40,
                                query_tile=128, base_tile=128)
    assert _edge_set(oi, oj) == _edge_set(di, dj)
    assert (12, 37) in _edge_set(di, dj)


def test_find_edges_with_variants():
    rng = np.random.default_rng(3)
    base = _rand_hashes(200, seed=3)
    variants = np.repeat(base[:, None, :], 8, axis=1)
    # file 50's variant 3 is close to file 120's base hash
    variants[50, 3] = _flip_bits(base[120], range(5))
    oi, oj = hamming.brute_force_edges(base, variants, similarity=40)
    di, dj = hamming.find_edges(base, variants, similarity=40,
                                query_tile=64, base_tile=128)
    assert _edge_set(oi, oj) == _edge_set(di, dj)
    assert (50, 120) in _edge_set(di, dj)


def test_low_confidence_only_matches_exact():
    base = _rand_hashes(64, seed=5)
    base[10] = base[20]                       # exact pair
    base[30] = _flip_bits(base[40], [0, 9])   # distance-2 pair
    low = np.zeros(64, dtype=bool)
    low[[10, 20, 30, 40]] = True
    for fn, kw in [(hamming.brute_force_edges, {}),
                   (hamming.find_edges, {"query_tile": 64, "base_tile": 64})]:
        ei, ej = fn(base, None, low, 40, **kw)
        es = _edge_set(ei, ej)
        assert (10, 20) in es            # distance 0 still pairs
        assert (30, 40) not in es        # fuzzy match suppressed


def test_cluster_injection_scale():
    """The reference's 1M-injection pattern (hamminghash.rs:336-412),
    CPU-sized: random corpus + one planted cluster must be fully linked."""
    n = 20_000
    base = _rand_hashes(n, seed=7)
    target = base[4242]
    cluster_at = [n // 7, n // 3, n // 2, 3 * n // 4, n - 5]
    dists = [0, 1, 2, 3, 5]
    for idx, d in zip(cluster_at, dists):
        base[idx] = _flip_bits(target, range(d))
    ei, ej = hamming.find_edges(base, similarity=8,
                                query_tile=512, base_tile=2048)
    es = _edge_set(ei, ej)
    for idx in cluster_at:
        pair = (min(4242, idx), max(4242, idx))
        assert pair in es, f"planted member {idx} not linked"


def test_no_self_edges_and_ordered():
    base = _rand_hashes(100, seed=9)
    base[3] = base[97]
    ei, ej = hamming.find_edges(base, similarity=10,
                                query_tile=64, base_tile=64)
    # the planted pair must actually be found: np.all on an empty
    # array is True, so the ordering property alone is vacuous
    assert (3, 97) in set(zip(ei.tolist(), ej.tolist()))
    assert np.all(ei < ej)


def test_phash_64bit_edges():
    base = _rand_hashes(128, nbytes=8, seed=11)
    base[5] = _flip_bits(base[77], [1, 2, 3])
    oi, oj = hamming.brute_force_edges(base, similarity=15)
    di, dj = hamming.find_edges(base, similarity=15,
                                query_tile=64, base_tile=64)
    assert _edge_set(oi, oj) == _edge_set(di, dj)
    assert (5, 77) in _edge_set(di, dj)
