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


def test_prepare_inputs_device_matches_host(planted):
    """The packed-ship/on-device-unpack path (8x less host->device
    traffic) produces the same kernel inputs for real rows and the same
    row counts through the kernel."""
    base, variants, low = planted
    var_h, low_h, n, npad = hamming_pallas.prepare_inputs(
        base, variants, low)
    var_d, low_d, n2, npad2 = hamming_pallas.prepare_inputs_device(
        base, variants, low)
    assert (n, npad) == (n2, npad2)
    assert np.array_equal(np.asarray(var_d)[:, :n], var_h[:, :n])
    assert np.array_equal(np.asarray(low_d), low_h)
    counts = np.asarray(hamming_pallas.scan_row_counts(
        var_d, low_d, nbits=256, sim=31, n_total=n,
        interpret=True))[:n, 0]
    counts_h, _ = hamming_pallas.row_match_counts(
        base, variants, low, similarity=31, interpret=True)
    assert np.array_equal(counts, counts_h)


def test_extract_rows_packed_matches_xla_oracle(planted):
    """The VMEM extraction kernel produces the exact packed bitmasks of
    the XLA oracle (_extract_rows) for hot rows with real matches,
    low-confidence rows, and inert padded slots."""
    import jax
    import jax.numpy as jnp

    base, variants, low = planted
    n = len(base)
    low = low.copy()
    low[100] = True  # low-conf member of the exact pair
    var_d, low_d, _, npad = hamming_pallas.prepare_inputs_device(
        base, variants, low)
    rows = np.array([7, 55, 100, 1800, 2500], dtype=np.int32)
    mpad = 32
    ridx = np.full(mpad, n - 1, dtype=np.int32)
    ridx[:len(rows)] = rows
    qidx = np.full((mpad, 1), n, dtype=np.int32)
    qidx[:len(rows), 0] = rows
    qlow = np.ones((mpad, 1), dtype=np.int32)
    qlow[:len(rows), 0] = low[rows].astype(np.int32)
    q_d = jnp.take(var_d, jnp.asarray(ridx), axis=1)

    got = np.asarray(hamming_pallas.extract_rows_packed(
        q_d, var_d[0], jax.device_put(qlow), low_d,
        jax.device_put(qidx), tb=hamming_pallas.BASE_TILE, nbits=256,
        sim=31, n_total=n, interpret=True))

    qp = np.zeros((mpad, 8, 32), dtype=np.uint8)
    qp[:len(rows)] = variants[rows]
    base_p = np.zeros((npad, 32), dtype=np.uint8)
    base_p[:n] = base
    want = np.asarray(hamming._extract_rows(
        jax.device_put(qp), jax.device_put(base_p),
        jax.device_put(qlow[:, 0].astype(bool)), low_d[:, 0],
        jax.device_put(qidx[:, 0]), 31, n, 256))
    assert np.array_equal(got, want)
    assert got.any()  # the planted pairs produce real bits


def test_device_prepare_padding_is_masked():
    """Device unpack pads with all -1 rows (an all-zero-bits hash),
    unlike the host path's neutral 0 rows; the kernel's index guards
    must keep padded rows out even when real all-zero hashes exist."""
    n = 1030  # forces padding to 2048 with QUERY_TILE/BASE_TILE 1024
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    base[n - 1] = 0   # identical to every padded row bit-pattern
    base[n - 2] = 0   # ... and to each other: exactly one real edge
    low = np.zeros(n, dtype=bool)
    var_d, low_d, _, _ = hamming_pallas.prepare_inputs_device(
        base, None, low)
    counts = np.asarray(hamming_pallas.scan_row_counts(
        var_d, low_d, nbits=256, sim=0, n_total=n,
        interpret=True))[:n, 0]
    assert counts.sum() == 1
    assert counts[n - 2] == 1  # the j>i edge lands on the lower row


def test_find_edges_fast_no_matches_interpret():
    """On-device hot-row selection: zero hot rows returns empty without
    dispatching the extraction kernel (and stats still report)."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (1100, 32), dtype=np.uint8)
    fi, fj, stats = hamming.find_edges_fast(
        base, similarity=0, interpret=True, return_stats=True)
    assert len(fi) == 0 and len(fj) == 0
    assert stats["hot_rows"] == 0


@pytest.mark.parametrize("n", [1023, 1024, 1025, 2047, 2049])
def test_counts_exact_across_tile_boundaries(n):
    """Padding/masking property sweep: planted pairs that straddle the
    1024-wide kernel tiles (and land in padded regions' neighborhoods)
    count exactly, for sizes one off each boundary."""
    rng = np.random.default_rng(n)
    base = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    # disjoint pairs spanning the first/last rows and the middle
    # (straddles the 1024-row tile boundary for every n in the sweep)
    pairs = [(0, n - 1), (n // 2, n // 2 + 1), (1, 2)]
    planted = set()
    for a, b in pairs:
        base[b] = base[a]
        planted.add((min(a, b), max(a, b)))
    fi, fj = hamming.find_edges_fast(base, similarity=0, interpret=True)
    got = set(zip(fi.tolist(), fj.tolist()))
    # planted pairs must all be found (chance collisions may add more,
    # but at 256 random bits they effectively cannot)
    assert planted <= got
    assert got == planted


def test_find_edges_fast_resident_matches_host_path():
    """Device-resident variants (the scan->group production path) must
    produce identical edges to the host-array path — both in interpret
    mode (the kernel path) and via the CPU fallback."""
    import jax.numpy as jnp

    rng = np.random.default_rng(77)
    n = 700
    base = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    base[123] = base[45]
    base[600] = base[45]
    variants = np.repeat(base[:, None, :], 8, axis=1)
    # make non-identity slots differ so min-over-variants matters
    variants[:, 1:, 0] ^= rng.integers(1, 255, (n, 7), dtype=np.uint8)
    low = np.zeros(n, dtype=bool)
    low[600] = True   # low-quality: exact-only (it IS exact here)

    want = hamming.find_edges_fast(base, variants, low, similarity=6,
                                   interpret=True)
    var_dev = jnp.asarray(variants)
    got = hamming.find_edges_fast_resident(var_dev, low, similarity=6,
                                           interpret=True)
    assert np.array_equal(want[0], got[0])
    assert np.array_equal(want[1], got[1])
    # CPU fallback path (no interpret): same answer
    got2 = hamming.find_edges_fast_resident(var_dev, low, similarity=6)
    assert np.array_equal(want[0], got2[0])
    assert np.array_equal(want[1], got2[1])
    assert {(45, 123), (45, 600)} <= set(zip(got[0].tolist(),
                                             got[1].tolist()))
