"""Fused Pallas counting kernel vs oracle (interpret mode on CPU)."""
import numpy as np
import pytest

from rupphash_tpu.ops import hamming, hamming_pallas


def _flip(h, positions):
    o = h.copy()
    for p in positions:
        o[p // 8] ^= 1 << (p % 8)
    return o


@pytest.fixture(scope="module")
def planted():
    rng = np.random.default_rng(0)
    n = 3000
    base = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    base[100] = base[2500]
    base[7] = _flip(base[1800], range(12))
    variants = np.repeat(base[:, None, :], 8, axis=1)
    variants[55, 3] = _flip(base[2222], range(4))
    low = np.zeros(n, dtype=bool)
    return base, variants, low


def test_row_counts_match_oracle(planted):
    base, variants, low = planted
    counts, n = hamming_pallas.row_match_counts(base, variants, low,
                                                similarity=31,
                                                interpret=True)
    oi, oj = hamming.brute_force_edges(base, variants, low, similarity=31)
    expected = np.zeros(n, dtype=np.int64)
    for i in oi:
        expected[i] += 1
    assert counts.sum() == len(oi)
    assert np.array_equal(counts, expected)


def test_find_edges_fast_matches_oracle(planted):
    base, variants, low = planted
    fi, fj = hamming.find_edges_fast(base, variants, low, similarity=31,
                                     interpret=True)
    oi, oj = hamming.brute_force_edges(base, variants, low, similarity=31)
    assert (set(zip(fi.tolist(), fj.tolist()))
            == set(zip(oi.tolist(), oj.tolist())))


def test_find_edges_fast_low_conf_gate():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (1100, 32), dtype=np.uint8)
    base[10] = base[20]                      # exact pair, both low quality
    base[30] = _flip(base[40], [0, 9])       # distance-2 pair, low quality
    low = np.zeros(1100, dtype=bool)
    low[[10, 20, 30, 40]] = True
    fi, fj = hamming.find_edges_fast(base, None, low, similarity=40,
                                     interpret=True)
    es = set(zip(fi.tolist(), fj.tolist()))
    assert (10, 20) in es
    assert (30, 40) not in es


def test_find_edges_fast_empty():
    fi, fj = hamming.find_edges_fast(
        np.empty((0, 32), dtype=np.uint8), interpret=True)
    assert len(fi) == 0 and len(fj) == 0
