"""All-pairs Hamming-distance duplicate search on the MXU.

TPU-first replacement for the reference's multi-index-hashing probe loop
(src/hamminghash.rs:191-271, src/scanner.rs:1640-1823): instead of
per-pair XOR+popcount behind a 16-bit-chunk candidate index, encode each
hash as a +/-1 int8 vector and compute whole distance *tiles* as int8
matmuls:

    dot(a, b) = bits - 2 * hamming(a, b)   =>   d = (bits - dot) // 2

A query tile of V dihedral variants per file against a base tile becomes a
single (Ta*V, bits) x (bits, Tb) int8 MXU contraction; the min-distance
over variants is a max over the V dot rows.  Thresholding, the j > i
pair-dedup, and the reference's low-quality gating (quality < 50 matches
at distance 0 only, scanner.rs:1588-1594) are fused masks on the tile.

Dispatch design: the counting sweep over the entire N x N upper triangle
is ONE jitted call — packed uint8 hashes go to the device once, bit
unpacking happens on-device, and a nested fori_loop walks (query tile x
base tile) pairs, skipping tiles entirely below the diagonal.  This
matters because per-call latency (hundreds of us locally, ~150 ms through
a remote-TPU tunnel) would otherwise dwarf the compute.  Only tiles whose
count is nonzero are re-materialized as packed bitmasks and expanded
host-side, so random corpora transfer almost nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_SIMILARITY_64 = 15   # hamminghash.rs:5
MAX_SIMILARITY_256 = 63  # hamminghash.rs:8

# device tile sizes (rows x cols of a distance tile)
QUERY_TILE = 4096
BASE_TILE = 2048


def pm1_encode(hashes: np.ndarray) -> np.ndarray:
    """(N, nbytes) uint8 packed hashes -> (N, nbytes*8) int8 in {-1, +1}.

    Bit b of byte k maps to column k*8 + b.  The mapping is fixed and
    shared by queries and base, so Hamming distances are preserved no
    matter the layout of the packed hash bytes.
    """
    bits = np.unpackbits(hashes, axis=-1, bitorder="little")
    return (bits.astype(np.int8) << 1) - 1


def unpack_bits_pm1(hashes_u8: jnp.ndarray) -> jnp.ndarray:
    """On-device equivalent of pm1_encode (same bit->column layout)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (hashes_u8[..., :, None] >> shifts) & jnp.uint8(1)
    flat = bits.reshape(hashes_u8.shape[:-1] + (hashes_u8.shape[-1] * 8,))
    return (flat.astype(jnp.int8) << 1) - 1


def unpack_edges_mask(mask_packed: np.ndarray, qoff: int, boff: int,
                      ta: int, tb: int):
    """(ta, tb/8) packed uint8 -> (i, j) global index arrays."""
    m = np.unpackbits(mask_packed, axis=-1, bitorder="little")[:, :tb]
    qi, bj = np.nonzero(m)
    return qi + qoff, bj + boff


@functools.partial(jax.jit, static_argnames=("ta", "tb", "nbits"))
def _scan_counts_all(var_packed, base_packed, low, sim, n_total, ta, tb,
                     nbits):
    """Full upper-triangle counting sweep in a single dispatch.

    var_packed: (Npad, V, nbytes) uint8; base_packed: (Npad, nbytes) uint8;
    low: (Npad,) bool.  Returns (Npad/ta, Npad/tb) int32 match counts.
    """
    npad, v, nbytes = var_packed.shape
    nq_tiles = npad // ta
    nb_tiles = npad // tb
    base_pm1 = unpack_bits_pm1(base_packed)            # (Npad, nbits) int8

    def qbody(qi, counts):
        qslice = jax.lax.dynamic_slice(var_packed, (qi * ta, 0, 0),
                                       (ta, v, nbytes))
        qv = unpack_bits_pm1(qslice).reshape(ta * v, nbits)
        qlow = jax.lax.dynamic_slice(low, (qi * ta,), (ta,))
        qidx = qi * ta + jax.lax.broadcasted_iota(jnp.int32, (ta, 1), 0)

        def bbody(bj, row):
            def compute(_):
                btile = jax.lax.dynamic_slice(base_pm1, (bj * tb, 0),
                                              (tb, nbits))
                btl = jax.lax.dynamic_slice(low, (bj * tb,), (tb,))
                dots = jax.lax.dot_general(
                    qv, btile.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                dist = (nbits - dots.reshape(ta, v, tb).max(axis=1)) // 2
                thr = jnp.where(qlow[:, None] | btl[None, :], 0, sim)
                jidx = bj * tb + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tb), 1)
                mask = ((dist <= thr) & (jidx > qidx)
                        & (jidx < n_total) & (qidx < n_total))
                return mask.sum(dtype=jnp.int32)

            # skip base tiles entirely below the diagonal (all j <= i)
            cnt = jax.lax.cond((bj + 1) * tb > qi * ta + 1, compute,
                               lambda _: jnp.int32(0), None)
            return row.at[bj].set(cnt)

        row = jax.lax.fori_loop(0, nb_tiles, bbody,
                                jnp.zeros((nb_tiles,), jnp.int32))
        return jax.lax.dynamic_update_slice(counts, row[None, :], (qi, 0))

    counts0 = jnp.zeros((nq_tiles, nb_tiles), jnp.int32)
    return jax.lax.fori_loop(0, nq_tiles, qbody, counts0)


@functools.partial(jax.jit, static_argnames=("ta", "tb", "nbits"))
def _tile_extract(var_packed, base_packed, low, qi, bj, sim, n_total,
                  ta, tb, nbits):
    """Re-materialize one (ta, tb) match tile as packed uint8 bits."""
    npad, v, nbytes = var_packed.shape
    qslice = jax.lax.dynamic_slice(var_packed, (qi * ta, 0, 0),
                                   (ta, v, nbytes))
    qv = unpack_bits_pm1(qslice).reshape(ta * v, nbits)
    bslice = jax.lax.dynamic_slice(base_packed, (bj * tb, 0), (tb, nbytes))
    btile = unpack_bits_pm1(bslice)
    qlow = jax.lax.dynamic_slice(low, (qi * ta,), (ta,))
    btl = jax.lax.dynamic_slice(low, (bj * tb,), (tb,))
    dots = jax.lax.dot_general(qv, btile.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    dist = (nbits - dots.reshape(ta, v, tb).max(axis=1)) // 2
    thr = jnp.where(qlow[:, None] | btl[None, :], 0, sim)
    qidx = qi * ta + jax.lax.broadcasted_iota(jnp.int32, (ta, 1), 0)
    jidx = bj * tb + jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
    mask = ((dist <= thr) & (jidx > qidx)
            & (jidx < n_total) & (qidx < n_total))
    weights = jnp.asarray(1 << np.arange(8), dtype=jnp.int32)
    grouped = mask.reshape(ta, tb // 8, 8).astype(jnp.int32)
    return (grouped * weights).sum(axis=-1).astype(jnp.uint8)


def find_edges(base_hashes: np.ndarray,
               variants: np.ndarray | None = None,
               low_conf: np.ndarray | None = None,
               similarity: int = 40,
               query_tile: int = QUERY_TILE,
               base_tile: int = BASE_TILE,
               return_stats: bool = False):
    """All-pairs duplicate edges.

    Args:
      base_hashes: (N, nbytes) uint8 packed hashes (32 for PDQ, 8 for pHash).
      variants: optional (N, V, nbytes) uint8 dihedral variants per file;
        defaults to the base hash alone.  min-over-variant distance is
        symmetric because the dihedral set forms a group.
      low_conf: optional (N,) bool; low-confidence hashes only pair at
        distance 0 (scanner.rs:1588-1594, quality < 50 rule).
      similarity: inclusive Hamming threshold (reference default 40).

    Returns (i, j) int64 arrays with i < j; plus a stats dict if requested.
    """
    n, nbytes = base_hashes.shape
    nbits = nbytes * 8
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return (empty, empty, {}) if return_stats else (empty, empty)
    if variants is None:
        variants = base_hashes[:, None, :]
    v = variants.shape[1]
    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)

    ta, tb = query_tile, base_tile
    npad = max(-(-n // ta) * ta, -(-n // tb) * tb)
    npad = -(-npad // ta) * ta
    npad = -(-npad // tb) * tb  # divisible by both tile sizes

    var_p = np.zeros((npad, v, nbytes), dtype=np.uint8)
    var_p[:n] = variants
    base_p = np.zeros((npad, nbytes), dtype=np.uint8)
    base_p[:n] = base_hashes
    low_p = np.ones(npad, dtype=bool)
    low_p[:n] = low_conf

    var_d = jax.device_put(var_p)
    base_d = jax.device_put(base_p)
    low_d = jax.device_put(low_p)

    counts = np.asarray(_scan_counts_all(var_d, base_d, low_d, similarity,
                                         n, ta, tb, nbits))

    # extract only tiles with matches, dispatched asynchronously with a
    # bounded in-flight window: a dense-duplicate corpus (burst shots)
    # can make most upper-triangle tiles hot, and holding every (ta,
    # tb/8) packed buffer until the first readback grows resident
    # memory quadratically with N (same discipline as
    # _edges_from_device's 8-chunk fence)
    hot = np.argwhere(counts > 0)
    MAX_IN_FLIGHT = 16   # 16 x ta x tb/8 uint8 = ~16 MiB at the defaults
    pending: list = []
    edges_i: list[np.ndarray] = []
    edges_j: list[np.ndarray] = []

    def consume(qi, bj, packed):
        gi, gj = unpack_edges_mask(np.asarray(packed), qi * ta, bj * tb,
                                   ta, tb)
        keep = (gi < n) & (gj < n)
        edges_i.append(gi[keep].astype(np.int64))
        edges_j.append(gj[keep].astype(np.int64))

    for qi, bj in hot:
        packed = _tile_extract(var_d, base_d, low_d, int(qi), int(bj),
                               similarity, n, ta, tb, nbits)
        pending.append((int(qi), int(bj), packed))
        if len(pending) > MAX_IN_FLIGHT:
            consume(*pending.pop(0))
    for item in pending:
        consume(*item)

    ei = np.concatenate(edges_i) if edges_i else np.empty(0, dtype=np.int64)
    ej = np.concatenate(edges_j) if edges_j else np.empty(0, dtype=np.int64)
    if return_stats:
        return ei, ej, {"tiles_scanned": counts.size,
                        "tiles_extracted": len(hot),
                        "pairs_checked": n * (n - 1) // 2 * v}
    return ei, ej


@functools.partial(jax.jit, static_argnames=("nbits",))
def _extract_rows(q_packed, base_packed, qlow, low, qidx_global, sim,
                  n_total, nbits):
    """Compact hot-row extraction: (M, V, nbytes) query rows vs the whole
    base.  Returns (M, Npad/8) uint8 packed match masks.

    XLA formulation kept as the oracle for extract_rows_packed — the
    production Pallas kernel in hamming_pallas.py, which keeps its dot
    tiles in VMEM instead of materializing the (M, Npad) int32 array
    in HBM (tests/test_hamming_pallas.py compares them bit-for-bit)."""
    m, v, nbytes = q_packed.shape
    npad = base_packed.shape[0]
    qv = unpack_bits_pm1(q_packed).reshape(m * v, nbits)
    base_pm1 = unpack_bits_pm1(base_packed)
    dots = jax.lax.dot_general(qv, base_pm1.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    dist = (nbits - dots.reshape(m, v, npad).max(axis=1)) // 2
    thr = jnp.where(qlow[:, None] | (low[None, :] > 0), 0, sim)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    mask = ((dist <= thr) & (jidx > qidx_global[:, None])
            & (jidx < n_total) & (qidx_global[:, None] < n_total))
    weights = jnp.asarray(1 << np.arange(8), dtype=jnp.int32)
    grouped = mask.reshape(m, npad // 8, 8).astype(jnp.int32)
    return (grouped * weights).sum(axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n", "hpad"))
def _nonzero_rows(counts_col, n, hpad):
    """(Npad,) int32 row counts -> (indices, counts) of the first hpad
    nonzero rows within [0, n) (index -1 pads)."""
    masked = jnp.where(jnp.arange(counts_col.shape[0]) < n,
                       counts_col, 0)
    (idx,) = jnp.nonzero(masked != 0, size=hpad, fill_value=-1)
    cnt = jnp.where(idx >= 0, masked[jnp.maximum(idx, 0)], 0)
    return idx, cnt


@functools.partial(jax.jit, static_argnames=("kpad",))
def _nonzero_bytes(packed, kpad):
    """(M, Npad/8) uint8 -> (positions, values) of the first kpad
    nonzero bytes (position -1 pads).  Match masks are ~all zeros, so
    reading back kpad (index, byte) pairs instead of the full bitmask
    turns an O(M x N / 8) device->host transfer into O(edges) — the
    difference between seconds and minutes behind a tunneled TPU."""
    flat = packed.reshape(-1)
    # int32 flat indexing caps chunks at row_chunk * Npad/8 < 2^31
    # bytes (row_chunk=256 covers Npad up to ~67M hashes)
    (idx,) = jnp.nonzero(flat != 0, size=kpad, fill_value=-1)
    vals = jnp.where(idx >= 0, flat[jnp.maximum(idx, 0)], 0)
    return idx, vals


def find_edges_fast(base_hashes: np.ndarray,
                    variants: np.ndarray | None = None,
                    low_conf: np.ndarray | None = None,
                    similarity: int = 40,
                    row_chunk: int | None = None,
                    interpret: bool = False,
                    return_stats: bool = False):
    """Production edge search: fused Pallas row-count sweep, then exact
    extraction of only the rows with matches (see hamming_pallas.py).
    The Pallas kernel needs real hardware; CPU backends transparently
    take the XLA tile path (same results) unless interpret=True, which
    runs this whole path with the kernel in grid-serial interpret mode
    (how the tests cover the production code on CPU)."""
    if jax.default_backend() == "cpu" and not interpret:
        return find_edges(base_hashes, variants, low_conf, similarity,
                          return_stats=return_stats)
    from . import hamming_pallas

    n, nbytes = base_hashes.shape
    nbits = nbytes * 8
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return (empty, empty, {}) if return_stats else (empty, empty)
    if variants is None:
        variants = base_hashes[:, None, :]
    elif not np.array_equal(variants[:, 0], base_hashes):
        # the device pipeline matches queries against variant slot 0 as
        # the base side (every production caller puts the identity hash
        # there: dihedral[0]); for any other layout, honor the
        # documented base_hashes semantics via the tile path
        return find_edges(base_hashes, variants, low_conf, similarity,
                          return_stats=return_stats)
    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)

    # packed u8 hashes ship to the device and unpack to +/-1 there
    # (8x less host->device traffic than shipping the int8 encoding)
    var_d, low_d, _, npad = hamming_pallas.prepare_inputs_device(
        base_hashes, variants, low_conf)
    return _edges_from_device(var_d, low_d, npad, n, nbits, low_conf,
                              int(variants.shape[1]), similarity,
                              row_chunk, interpret, return_stats)


def find_edges_fast_resident(var_dev, low_conf=None,
                             similarity: int = 40,
                             row_chunk: int | None = None,
                             interpret: bool = False,
                             return_stats: bool = False):
    """Device-resident production path: `var_dev` is an (N, V, nbytes)
    u8 jax.Array already on device — the layout pdq_jax.pdq_hash_batch
    emits as 'dihedral', with the identity hash at slot 0 (the contract
    every production caller already follows).  This is the scan->group
    configuration: the hashes never leave the chip, so grouping pays
    ZERO hash re-upload (only the (N,) low-confidence flags cross the
    link).  Results are identical to find_edges_fast on the host copy."""
    import jax as _jax

    n, v, nbytes = (int(s) for s in var_dev.shape)
    nbits = nbytes * 8
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return (empty, empty, {}) if return_stats else (empty, empty)
    if _jax.default_backend() == "cpu" and not interpret:
        host = np.asarray(var_dev)
        return find_edges(np.ascontiguousarray(host[:, 0]), host,
                          low_conf, similarity,
                          return_stats=return_stats)
    from . import hamming_pallas

    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)
    var_d, low_d, _, npad = hamming_pallas.prepare_inputs_resident(
        var_dev, low_conf)
    return _edges_from_device(var_d, low_d, npad, n, nbits, low_conf,
                              v, similarity, row_chunk, interpret,
                              return_stats)


def _edges_from_device(var_d, low_d, npad, n, nbits, low_conf,
                       n_variants, similarity, row_chunk, interpret,
                       return_stats):
    """Shared device tail: count sweep -> hot-row selection ->
    pipelined extraction -> host edge assembly."""
    from . import hamming_pallas

    if row_chunk is None:
        # extraction cost is dominated by per-chunk dispatch/readback
        # latency (tunneled TPUs: ~hundreds of ms each), so prefer the
        # largest chunk whose (rows, Npad/8) mask stays within ~512 MB
        # of HBM.  Hard cap 1024: the Pallas kernel's scoped-VMEM stack
        # allocation scales with the chunk's row count and 2048+ rows
        # exceed the 16 MB Mosaic limit at the 1M corpus size
        # (measured: u8[4096, Npad/8] wants 31.4 MB of stack).
        row_chunk = int(min(1024, max(256, (512 << 20) // max(npad // 8,
                                                              1))))
        row_chunk = max(256, (row_chunk // 256) * 256)
    counts_d = hamming_pallas.scan_row_counts(
        var_d, low_d, ta=hamming_pallas.QUERY_TILE,
        tb=hamming_pallas.BASE_TILE, nbits=nbits, sim=similarity,
        n_total=n, interpret=interpret)

    # hot-row selection on device: read back only the nonzero rows'
    # (index, count) pairs instead of the full N-length count vector
    # (device->host readback is the scarce resource behind a tunnel)
    n_hot = int(jnp.count_nonzero(counts_d[:n, 0]))
    if n_hot == 0:
        empty = np.empty(0, dtype=np.int64)
        if return_stats:
            return empty, empty, {"hot_rows": 0,
                                  "pairs_checked": n * (n - 1) // 2
                                  * n_variants}
        return empty, empty
    hpad = max(1024, 1 << (n_hot - 1).bit_length())
    hot_idx, hot_cnt = (np.asarray(a) for a in _nonzero_rows(
        counts_d[:, 0], n, hpad))
    sel = hot_idx >= 0
    hot = hot_idx[sel].astype(np.int64)
    counts = np.zeros(n, dtype=np.int64)
    counts[hot] = hot_cnt[sel]

    edges_i: list[np.ndarray] = []
    edges_j: list[np.ndarray] = []
    stride = npad // 8
    # One stacked upload for every chunk's gather/guard parameters
    # instead of 3 per-chunk device_puts: through a tunneled TPU the
    # per-transfer latency dominates the tail, so the loop below only
    # issues device-side slices and kernel dispatches.
    chunk_rows = [hot[c0:c0 + row_chunk]
                  for c0 in range(0, len(hot), row_chunk)]
    n_chunks = len(chunk_rows)
    mpad = -(-row_chunk // 32) * 32
    # padded slots point at row n-1 with qidx=n so the kernel's index
    # guard keeps them inert
    ridx_all = np.full((n_chunks, mpad), n - 1, dtype=np.int32)
    qidx_all = np.full((n_chunks, mpad, 1), n, dtype=np.int32)
    qlow_all = np.ones((n_chunks, mpad, 1), dtype=np.int32)
    for c, rows in enumerate(chunk_rows):
        m = len(rows)
        ridx_all[c, :m] = rows
        qidx_all[c, :m, 0] = rows
        qlow_all[c, :m, 0] = low_conf[rows].astype(np.int32)
    ridx_d = jax.device_put(ridx_all)
    qidx_d = jax.device_put(qidx_all)
    qlow_d = jax.device_put(qlow_all)

    # Per-chunk nonzero budgets are host-known from the count sweep; a
    # power-of-two floor collapses kpad buckets so the jit compiles
    # once, and the mask's own byte count caps it (dense-duplicate
    # corpora would otherwise pad the nonzero output past the mask)
    kpads = []
    for rows in chunk_rows:
        k = int(counts[rows].sum())
        kpad = max(4096, 1 << max(0, (k - 1).bit_length()))
        kpads.append(min(kpad, mpad * stride))
    offs = np.concatenate([[0], np.cumsum(kpads)]).astype(np.int64)
    total = int(offs[-1])
    # Every chunk's compacted (index, byte) pairs accumulate into ONE
    # device buffer (dynamic_update_slice chain) and come back in a
    # single fenced readback: per-chunk readbacks each paid a full
    # round trip through the tunnel, dominating the extraction tail.
    tpad = 1 << max(12, (max(total, 1) - 1).bit_length())
    acc_idx = jnp.full((tpad,), -1, jnp.int32)
    acc_val = jnp.zeros((tpad,), jnp.uint8)
    for c, rows in enumerate(chunk_rows):
        # gather the hot rows' +/-1 variants on DEVICE (var_d already
        # holds them)
        q_d = jnp.take(var_d, ridx_d[c], axis=1)
        packed = hamming_pallas.extract_rows_packed(
            q_d, var_d[0], qlow_d[c], low_d, qidx_d[c],
            tb=hamming_pallas.BASE_TILE,
            nbits=nbits, sim=similarity, n_total=n, interpret=interpret)
        idx_d, vals_d = _nonzero_bytes(packed, kpads[c])
        # `packed` (the full (mpad, stride) mask) dies once its nonzero
        # runs; only the O(edges) compacted pairs stay resident
        acc_idx = jax.lax.dynamic_update_slice(acc_idx, idx_d,
                                               (int(offs[c]),))
        acc_val = jax.lax.dynamic_update_slice(acc_val, vals_d,
                                               (int(offs[c]),))
        if c % 8 == 7:
            # cheap fence: allocation happens at dispatch, so without
            # an occasional sync every chunk's mask buffer would be
            # live at once; waiting on one accumulated element caps
            # in-flight masks at ~8 x (mpad, stride)
            np.asarray(jax.device_get(acc_idx[0]))

    idx_all = np.asarray(acc_idx)
    val_all = np.asarray(acc_val)
    for c in range(n_chunks):
        idx = idx_all[offs[c]:offs[c] + kpads[c]]
        vals = val_all[offs[c]:offs[c] + kpads[c]]
        sel = idx >= 0
        idx, vals = idx[sel], vals[sel]
        r = idx // stride
        bytecol = (idx % stride).astype(np.int64)
        bits = np.unpackbits(vals[:, None].astype(np.uint8), axis=1,
                             bitorder="little")
        rr, bb = np.nonzero(bits)
        edges_i.append(ridx_all[c][r[rr]].astype(np.int64))
        edges_j.append((bytecol[rr] * 8 + bb).astype(np.int64))

    ei = np.concatenate(edges_i) if edges_i else np.empty(0, dtype=np.int64)
    ej = np.concatenate(edges_j) if edges_j else np.empty(0, dtype=np.int64)
    if return_stats:
        return ei, ej, {"hot_rows": int(len(hot)),
                        "pairs_checked": n * (n - 1) // 2
                        * n_variants}
    return ei, ej


# --------------------------------------------------------------------------
# Host oracle (for tests and tiny inputs): brute-force XOR+popcount
# --------------------------------------------------------------------------

def brute_force_edges(base_hashes: np.ndarray,
                      variants: np.ndarray | None = None,
                      low_conf: np.ndarray | None = None,
                      similarity: int = 40):
    """O(N^2) numpy oracle with identical semantics to find_edges."""
    n = base_hashes.shape[0]
    if variants is None:
        variants = base_hashes[:, None, :]
    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)
    vb = np.unpackbits(variants, axis=-1, bitorder="little")      # (N,V,bits)
    bb = np.unpackbits(base_hashes, axis=-1, bitorder="little")   # (N,bits)
    ei, ej = [], []
    for i in range(n):
        d = (vb[i][:, None, :] != bb[None, i + 1:, :]).sum(-1).min(0)
        thr = np.where(low_conf[i] | low_conf[i + 1:], 0, similarity)
        js = np.nonzero(d <= thr)[0] + i + 1
        ei.extend([i] * len(js))
        ej.extend(js.tolist())
    return np.asarray(ei, dtype=np.int64), np.asarray(ej, dtype=np.int64)
