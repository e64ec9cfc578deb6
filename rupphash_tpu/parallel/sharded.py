"""SPMD scaling over a jax.sharding.Mesh.

Two parallel axes, matching the two compute phases (BASELINE.json):

* **Hashing** is embarrassingly data-parallel: the luma batch is sharded
  over every mesh axis combined (pure dp); each chip runs the fused PDQ
  pipeline (ops/pdq_jax.py) on its shard.  No communication.

* **All-pairs grouping** is a 2-D problem: the (queries x base) distance
  matrix is tiled over a ('q', 'b') mesh.  Queries (with their 8 dihedral
  variants) are sharded over 'q', the base hash matrix over 'b'; each chip
  computes its distance tile as +/-1 int8 MXU matmuls and thresholds
  locally.  Count reduction is a psum over the mesh; ICI carries only hash
  tiles (N * 256 int8), never distance tiles.

* **Edge extraction** never materializes the N x N matrix: a sharded
  per-row count sweep (psum over 'b') finds the *hot* query rows — for a
  dedup corpus, a small fraction of N — then only those rows are
  re-matched against the sharded base and returned as packed bitmasks
  ((M, N/8) bytes).  Host-side union-find + the grouping engine
  (grouping/engine.py) turn edges into groups, completing the
  scanner.rs:1640-1830 semantics at mesh scale.

The reference has no distributed backend at all (SURVEY.md section 5) —
this layer is the TPU-native answer to "scan 10^8 images": shard the
decode fleet over hosts (DCN), hash shards per chip, group over ICI.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import pdq_jax
from ..ops.hamming import unpack_bits_pm1


def make_mesh(n_devices: int | None = None) -> Mesh:
    """A ('q', 'b') mesh over the first n devices: 'q' tiles query rows,
    'b' tiles base columns of the distance matrix."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % 2 == 0 and n > 1:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    return Mesh(np.asarray(devs[:n]).reshape(shape), ("q", "b"))


def sharded_pdq_hasher(mesh: Mesh, rows: int, cols: int):
    """Data-parallel fused PDQ over the whole mesh.

    Returns a jitted fn: (B, rows, cols) u8 lumas (B divisible by the mesh
    size) -> dict of sharded outputs (hash, dihedral, quality, coeffs).
    """
    l_np, r_np = pdq_jax.linear_operators(rows, cols)
    d_np = pdq_jax.dct16x64()
    batch_sharding = NamedSharding(mesh, P(("q", "b")))

    @functools.partial(jax.jit, in_shardings=(batch_sharding,))
    def run(lumas):
        return pdq_jax.pdq_core(lumas, jnp.asarray(l_np), jnp.asarray(r_np),
                                jnp.asarray(d_np))

    return run


def _pad_multiple(n: int, k: int) -> int:
    return -(-n // k) * k


def _gemm_dtypes():
    """(operand, accumulator) dtypes for the +/-1 distance GEMM.

    TPU: int8 operands feed the MXU directly.  The CPU backend (the
    8-device virtual test mesh) has no fast int8 GEMM (measured 18 vs
    68 GOPS on this host) — +/-1 dots of <= 256 terms are integers of
    magnitude <= 256, exactly representable in f32, so Eigen's f32 path
    computes bit-identical distances 3.7x faster."""
    if jax.default_backend() == "cpu":
        return jnp.float32, jnp.float32
    return jnp.int8, jnp.int32


# Device-side tile chunking: a (q, b) device's distance tile is
# (nloc * V, mloc) — at BASELINE scale (1M hashes, 8 variants, v5e-8)
# that is a ~500 GB intermediate, far past HBM.  Each kernel therefore
# streams its tile as (QUERY_CHUNK * V, BASE_CHUNK) GEMM steps under
# lax.map: peak live memory is one step's dot buffer (~512 MB int32 at
# the defaults) while the MXU still sees large static-shape matmuls.
# Chunk-edge padding is masked via the n_total sentinel (global index
# n_total never matches), so any N works without host-side repadding.
QUERY_CHUNK = 256      # query rows per step (x V variants in the GEMM)
BASE_CHUNK = 65536     # base columns per step


def _pad_rows(a, n, fill=0):
    """Pad axis 0 to n rows with a constant."""
    if a.shape[0] == n:
        return a
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad, constant_values=fill)


def _tile_dist_mask(var_shard, base_shard, qlow, blow, qidx, jidx,
                    n_total, similarity):
    """Shared tile math: min-over-variant distances + threshold mask.

    var_shard (nloc, V, nbits) / base_shard (mloc, nbits) pm1, ALREADY
    converted to _gemm_dtypes()[0] by the caller (hoisted out of the
    chunk loop — re-converting the 50k-row base per query-chunk step
    cost 1.57x at 100k on the CPU mesh); qidx (nloc, 1) / jidx
    (1, mloc) global indices.  Pad rows are masked out via n_total, so
    callers can pad freely with zeros (two zero pad rows are at
    distance 0 of each other and would otherwise match).  The GEMM
    contracts dim 1 of both operands — no base.T materialization.
    """
    nloc, v, nbits = var_shard.shape
    mloc = base_shard.shape[0]
    _, acc_t = _gemm_dtypes()
    flat_q = var_shard.reshape(nloc * v, nbits)
    dots = jax.lax.dot_general(flat_q, base_shard,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=acc_t)
    dots = dots.astype(jnp.int32)
    dist = (nbits - dots.reshape(nloc, v, mloc).max(axis=1)) // 2
    thr = jnp.where(qlow[:, None] | blow[None, :], 0, similarity)
    return ((dist <= thr) & (jidx > qidx)
            & (jidx < n_total) & (qidx < n_total))


def _chunked_tile_apply(var_shard, base_shard, qlow, blow, qidx, boff,
                        n_total, similarity, reduce_fn,
                        query_chunk, base_chunk):
    """Stream _tile_dist_mask over a device tile in (qc, bc) chunks.

    qidx (nloc,) carries each query row's GLOBAL index (contiguous
    shards pass qoff+iota; the hot-row extraction passes arbitrary
    indices).  reduce_fn(mask (qc, bc)) -> per-chunk result; returns
    the stacked (n_qchunks, n_bchunks, ...) results plus (qc, bc) for
    the caller to reassemble.  Local pad rows (chunk-edge) get the
    global-index sentinel n_total, so _tile_dist_mask's existing
    masking suppresses them."""
    nloc, v, nbits = var_shard.shape
    mloc = base_shard.shape[0]
    qc = min(query_chunk, nloc)
    bc = min(base_chunk, mloc)
    nqc = -(-nloc // qc)
    nbc = -(-mloc // bc)

    op_t, _ = _gemm_dtypes()
    var_shard = var_shard.astype(op_t)      # convert ONCE, outside the
    base_shard = base_shard.astype(op_t)    #   lax.map chunk loops
    var_p = _pad_rows(var_shard, nqc * qc)
    qlow_p = _pad_rows(qlow, nqc * qc, fill=True)
    qidx_p = jnp.where(jnp.arange(nqc * qc) < nloc,
                       _pad_rows(qidx.astype(jnp.int32), nqc * qc),
                       n_total)
    base_p = _pad_rows(base_shard, nbc * bc)
    blow_p = _pad_rows(blow, nbc * bc, fill=True)
    jidx_p = jnp.where(jnp.arange(nbc * bc) < mloc,
                       boff + jnp.arange(nbc * bc, dtype=jnp.int32),
                       n_total)

    var_c = var_p.reshape(nqc, qc, v, nbits)
    qlow_c = qlow_p.reshape(nqc, qc)
    qidx_c = qidx_p.reshape(nqc, qc)
    base_c = base_p.reshape(nbc, bc, nbits)
    blow_c = blow_p.reshape(nbc, bc)
    jidx_c = jidx_p.reshape(nbc, bc)

    def q_step(qargs):
        var_q, qlow_q, qidx_q = qargs

        def b_step(bargs):
            base_b, blow_b, jidx_b = bargs
            mask = _tile_dist_mask(var_q, base_b, qlow_q, blow_b,
                                   qidx_q[:, None], jidx_b[None, :],
                                   n_total, similarity)
            return reduce_fn(mask)

        return jax.lax.map(b_step, (base_c, blow_c, jidx_c))

    return jax.lax.map(q_step, (var_c, qlow_c, qidx_c)), (qc, bc)


def sharded_group_counts(mesh: Mesh, similarity: int = 40,
                         query_chunk: int = QUERY_CHUNK,
                         base_chunk: int = BASE_CHUNK):
    """2-D sharded all-pairs duplicate counting.

    Returns a jitted fn(variants_u8 (N, V, 32), low_conf (N,) bool) ->
    (nq, nb) int32 per-device-tile match counts, where nq/nb are the mesh
    axis sizes.  Each (q, b) device streams its tile of the N x N
    distance matrix in (query_chunk, base_chunk) GEMM steps; ICI traffic
    is one all-gather of hash shards.  N is padded internally to the
    mesh axes (pad rows are index-masked).
    """
    nq = mesh.shape["q"]
    nb = mesh.shape["b"]

    def tile_counts(var_shard, base_shard, qlow_shard, blow_shard,
                    qoff, boff, n_total):
        nloc = var_shard.shape[0]
        qidx = qoff[0] + jnp.arange(nloc, dtype=jnp.int32)
        partials, _ = _chunked_tile_apply(
            var_shard, base_shard, qlow_shard, blow_shard, qidx, boff[0],
            n_total[0], similarity,
            lambda mask: mask.sum(dtype=jnp.int32),
            query_chunk, base_chunk)
        return partials.sum(dtype=jnp.int32).reshape(1, 1)

    smapped = shard_map(
        tile_counts, mesh=mesh,
        in_specs=(P("q"), P("b"), P("q"), P("b"), P("q"), P("b"), P()),
        out_specs=P("q", "b"))

    @jax.jit
    def run(variants_u8, low_conf):
        n = variants_u8.shape[0]
        npad = _pad_multiple(n, math.lcm(nq, nb))
        if npad != n:
            variants_u8 = jnp.pad(variants_u8,
                                  ((0, npad - n), (0, 0), (0, 0)))
            low_conf = jnp.pad(low_conf, (0, npad - n),
                               constant_values=True)
        var_pm1 = unpack_bits_pm1(variants_u8)
        base_pm1 = var_pm1[:, 0, :]
        qoff = (jnp.arange(nq, dtype=jnp.int32) * (npad // nq))
        boff = (jnp.arange(nb, dtype=jnp.int32) * (npad // nb))
        return smapped(var_pm1, base_pm1, low_conf, low_conf, qoff, boff,
                       jnp.full((1,), n, dtype=jnp.int32))

    return run


def sharded_row_counts(mesh: Mesh, similarity: int = 40,
                       query_chunk: int = QUERY_CHUNK,
                       base_chunk: int = BASE_CHUNK):
    """Per-query-row match counts over the full upper triangle.

    Returns a jitted fn(variants_u8 (N, V, 32), low_conf (N,) bool) ->
    (Npad,) int32 where entry i counts matches (i, j>i).  Each (q, b)
    device streams its distance tile in chunked GEMM steps and psums
    row counts over 'b' — this is phase 1 of count-then-extract: only
    rows with a nonzero count are re-materialized as edges
    (hamminghash.rs find_groups probes per query row the same way, at
    CPU scale).
    """
    nq = mesh.shape["q"]
    nb = mesh.shape["b"]

    def tile_rows(var_shard, base_shard, qlow_shard, blow_shard,
                  qoff, boff, n_total):
        nloc = var_shard.shape[0]
        qidx = qoff[0] + jnp.arange(nloc, dtype=jnp.int32)
        partials, (qc, _) = _chunked_tile_apply(
            var_shard, base_shard, qlow_shard, blow_shard, qidx, boff[0],
            n_total[0], similarity,
            lambda mask: mask.sum(axis=1, dtype=jnp.int32),
            query_chunk, base_chunk)
        # (nqc, nbc, qc) partial row counts -> (nloc,)
        counts = partials.sum(axis=1).reshape(-1)[:nloc]
        return jax.lax.psum(counts, "b")

    smapped = shard_map(
        tile_rows, mesh=mesh,
        in_specs=(P("q"), P("b"), P("q"), P("b"), P("q"), P("b"), P()),
        out_specs=P("q"))

    @jax.jit
    def run(variants_u8, low_conf):
        n = variants_u8.shape[0]
        npad = _pad_multiple(n, math.lcm(nq, nb))
        if npad != n:
            variants_u8 = jnp.pad(variants_u8,
                                  ((0, npad - n), (0, 0), (0, 0)))
            low_conf = jnp.pad(low_conf, (0, npad - n),
                               constant_values=True)
        var_pm1 = unpack_bits_pm1(variants_u8)
        base_pm1 = var_pm1[:, 0, :]
        qoff = (jnp.arange(nq, dtype=jnp.int32) * (npad // nq))
        boff = (jnp.arange(nb, dtype=jnp.int32) * (npad // nb))
        return smapped(var_pm1, base_pm1, low_conf, low_conf, qoff, boff,
                       jnp.full((1,), n, dtype=jnp.int32))

    return run


def sharded_extract_rows(mesh: Mesh, similarity: int = 40,
                         query_chunk: int = QUERY_CHUNK,
                         base_chunk: int = BASE_CHUNK):
    """Phase 2 of count-then-extract: hot query rows vs the full base,
    compacted on device to O(edges) readback.

    Returns a jitted fn(q_var_u8 (M, V, 32), qlow (M,), qidx (M,) global
    row indices, base_u8 (N, 32), blow (N,), kpad static) ->
    (positions, values) of the first kpad nonzero bytes of the
    (Mpad, Npad//8) packed match bitmask (position -1 pads).  M is
    padded to mesh 'q'; the base is sharded over 'b' with byte-aligned
    local column blocks.  The full bitmask lives only as sharded device
    tiles — what crosses the device->host link is the compacted
    (index, byte) pairs, the same O(edges) bar the single-chip path
    sets with ops/hamming._nonzero_bytes (an (M, N/8) readback at 1M
    hashes is ~128 MB per 1024-row chunk through the tunnel; the
    compacted pairs are KBs)."""
    nq = mesh.shape["q"]
    nb = mesh.shape["b"]
    assert base_chunk % 8 == 0, "byte packing needs 8-aligned base chunks"

    def extract(q_shard, qlow_shard, qidx_shard, base_shard, blow_shard,
                boff, n_total):
        mloc_q = q_shard.shape[0]
        mloc_b = base_shard.shape[0]
        weights = jnp.asarray(1 << np.arange(8), dtype=jnp.int32)

        def pack(mask):
            qc, bc = mask.shape
            grouped = mask.reshape(qc, bc // 8, 8).astype(jnp.int32)
            return (grouped * weights).sum(axis=-1).astype(jnp.uint8)

        # (nqc, nbc, qc, bc//8) chunked byte blocks -> (mloc_q, mloc_b//8)
        partials, (qc, bc) = _chunked_tile_apply(
            q_shard, base_shard, qlow_shard, blow_shard,
            qidx_shard, boff[0], n_total[0], similarity, pack,
            query_chunk, base_chunk)
        nqc, nbc = partials.shape[0], partials.shape[1]
        packed = partials.transpose(0, 2, 1, 3).reshape(
            nqc * qc, nbc * (bc // 8))
        return packed[:mloc_q, :mloc_b // 8]

    smapped = shard_map(
        extract, mesh=mesh,
        in_specs=(P("q"), P("q"), P("q"), P("b"), P("b"), P("b"), P()),
        out_specs=P("q", "b"))

    @functools.partial(jax.jit, static_argnames=("kpad",))
    def run(q_var_u8, qlow, qidx, base_u8, blow, kpad):
        n = base_u8.shape[0]
        npad = _pad_multiple(n, 8 * nb)
        if npad != n:
            base_u8 = jnp.pad(base_u8, ((0, npad - n), (0, 0)))
            blow = jnp.pad(blow, (0, npad - n), constant_values=True)
        m = q_var_u8.shape[0]
        mpad = _pad_multiple(m, nq)
        if mpad != m:
            q_var_u8 = jnp.pad(q_var_u8, ((0, mpad - m), (0, 0), (0, 0)))
            qlow = jnp.pad(qlow, (0, mpad - m), constant_values=True)
            qidx = jnp.pad(qidx, (0, mpad - m), constant_values=n)
        packed = smapped(unpack_bits_pm1(q_var_u8), qlow,
                         qidx.astype(jnp.int32), unpack_bits_pm1(base_u8),
                         blow, (jnp.arange(nb, dtype=jnp.int32)
                                * (npad // nb)),
                         jnp.full((1,), n, dtype=jnp.int32))
        # device-side compaction (XLA moves the sharded tiles over ICI,
        # never to the host): flat index = row * (Npad//8) + bytecol
        flat = packed.reshape(-1)
        (idx,) = jnp.nonzero(flat != 0, size=kpad, fill_value=-1)
        vals = jnp.where(idx >= 0, flat[jnp.maximum(idx, 0)], 0)
        return idx, vals

    return run


@functools.lru_cache(maxsize=8)
def _edge_fns(mesh: Mesh, similarity: int):
    """Compiled (row-counts, extract) closures per (mesh, similarity) —
    jit caches by function identity, so fresh closures would recompile
    on every grouping call."""
    return (sharded_row_counts(mesh, similarity),
            sharded_extract_rows(mesh, similarity))


def sharded_find_edges(mesh: Mesh, base_hashes: np.ndarray,
                       variants: np.ndarray | None = None,
                       low_conf: np.ndarray | None = None,
                       similarity: int = 40,
                       row_chunk: int = 1024,
                       counts_fn=None, extract_fn=None,
                       return_stats: bool = False):
    """Mesh-sharded all-pairs duplicate edges: the multi-chip equivalent
    of ops/hamming.find_edges_fast.  Returns (i, j) int64 with i < j;
    plus a stats dict (hot_rows, readback_bytes) when requested.

    Device->host traffic is O(edges), never O(N): the count sweep reads
    back only the nonzero rows' (index, count) pairs
    (hamming._nonzero_rows on the device-resident count vector) and the
    extraction reads back compacted nonzero (index, byte) pairs sized
    by the host-known per-chunk edge budget — the same compaction bar
    the single-chip path sets (ops/hamming.py:257-269).

    counts_fn/extract_fn allow callers to override the compiled
    closures; by default they are memoized per (mesh, similarity).
    """
    from ..ops.hamming import _nonzero_rows

    n = base_hashes.shape[0]
    empty = np.empty(0, dtype=np.int64)

    def done(ei, ej, hot_rows, readback):
        if return_stats:
            return ei, ej, {"hot_rows": hot_rows,
                            "readback_bytes": readback}
        return ei, ej

    if n == 0:
        return done(empty, empty, 0, 0)
    if variants is None:
        variants = base_hashes[:, None, :]
    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)
    if counts_fn is None or extract_fn is None:
        default_counts, default_extract = _edge_fns(mesh, int(similarity))
        counts_fn = counts_fn or default_counts
        extract_fn = extract_fn or default_extract

    nq = mesh.shape["q"]
    nb = mesh.shape["b"]
    npad = _pad_multiple(n, 8 * nb)
    stride = npad // 8

    # The extraction compaction flattens an (mpad, Npad/8) byte mask
    # and jnp.nonzero indexes it in int32 (x64 off), so a chunk must
    # keep mpad * stride < 2^31 — the same bound the single-chip
    # _nonzero_bytes documents (ops/hamming.py:265).  Clamp the chunk
    # so >16M-hash corpora compact correctly instead of silently
    # wrapping the flat index into negative edge coordinates.
    max_rows = max(nq, int((2 ** 31 - 1) // max(stride, 1)) // nq * nq)
    row_chunk = min(row_chunk, max_rows)

    # base + flags upload once; the per-chunk calls below reuse the
    # device arrays (jit does not re-transfer committed jax.Arrays)
    var_d = jax.device_put(np.ascontiguousarray(variants, dtype=np.uint8))
    base_d = jax.device_put(np.ascontiguousarray(base_hashes,
                                                 dtype=np.uint8))
    low_d = jax.device_put(low_conf.astype(bool))

    counts_dev = counts_fn(var_d, low_d)       # (Npad,) device-resident
    n_hot = int(jnp.count_nonzero(counts_dev[:n]))
    readback = 4  # the scalar above
    if n_hot == 0:
        return done(empty, empty, 0, readback)
    hpad = max(1024, 1 << (n_hot - 1).bit_length())
    hot_idx_d, hot_cnt_d = _nonzero_rows(counts_dev, n, hpad)
    hot_idx, hot_cnt = np.asarray(hot_idx_d), np.asarray(hot_cnt_d)
    readback += hot_idx.nbytes + hot_cnt.nbytes
    sel = hot_idx >= 0
    hot = hot_idx[sel].astype(np.int64)
    hot_counts = hot_cnt[sel].astype(np.int64)

    edges_i: list[np.ndarray] = []
    edges_j: list[np.ndarray] = []
    for c0 in range(0, len(hot), row_chunk):
        rows = hot[c0:c0 + row_chunk]
        mpad = _pad_multiple(len(rows), nq)
        # per-chunk nonzero budget is host-known from the count sweep;
        # a power-of-two floor collapses kpad buckets so the jit
        # compiles once per bucket, and the mask's own byte count caps
        # it for dense-duplicate corpora
        k = int(hot_counts[c0:c0 + row_chunk].sum())
        kpad = max(256, 1 << max(0, (k - 1).bit_length()))
        kpad = min(kpad, mpad * stride)
        idx, vals = (np.asarray(a) for a in extract_fn(
            var_d[rows], low_d[rows], rows.astype(np.int32),
            base_d, low_d, kpad=kpad))
        readback += idx.nbytes + vals.nbytes
        live = idx >= 0
        idx, vals = idx[live], vals[live]
        r = idx // stride
        bytecol = (idx % stride).astype(np.int64)
        bits = np.unpackbits(vals[:, None].astype(np.uint8), axis=1,
                             bitorder="little")
        rr, bb = np.nonzero(bits)
        edges_i.append(rows[r[rr]].astype(np.int64))
        edges_j.append((bytecol[rr] * 8 + bb).astype(np.int64))

    return done(np.concatenate(edges_i) if edges_i else empty,
                np.concatenate(edges_j) if edges_j else empty,
                int(len(hot)), readback)


def sharded_query_topk_status(mesh: Mesh):
    """Status-aware mesh query for the serving index's INCREMENTAL
    sharded residency: the corpus arrives pre-padded to the device
    capacity (a multiple of 8 * ndev) with an int8 per-row status
    (0 ok / 1 low-quality / 2 dead or padding) — tombstoned rows never
    match, low rows only at distance 0 (distances past the gate report
    the nbits+1 sentinel).  Returns the k best (distance, corpus row)
    per query via a device-side top-k, so device->host readback is
    O(Q x k) — the mesh mirror of serve._query_topk, matching the
    round-4 O(edges)-readback bar (sharded_find_edges).

    The match radius is a TRACED operand (run(..., similarity, k)), not
    a compile-time constant: /v1/query lets unauthenticated clients pick
    the radius per request, and baking it into the executable would let
    256 distinct values force 256 shard_map recompiles (minutes each
    through the tunnel)."""
    axes = ("q", "b")
    ndev = math.prod(mesh.shape.values())

    def tile(q_pm1, base_shard, st_shard, boff, n_total, sim):
        nloc = base_shard.shape[0]
        qn, v, nbits = q_pm1.shape
        op_t, acc_t = _gemm_dtypes()
        flat_q = q_pm1.reshape(qn * v, nbits).astype(op_t)
        dots = jax.lax.dot_general(flat_q, base_shard.T.astype(op_t),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_t)
        dots = dots.astype(jnp.int32)
        dist = (nbits - dots.reshape(qn, v, nloc).max(axis=1)) // 2
        low = st_shard[None, :] == 1
        dead = st_shard[None, :] >= 2
        jidx = boff[0] + jax.lax.broadcasted_iota(jnp.int32, (1, nloc), 1)
        bad = dead | (low & (dist > 0)) | (jidx >= n_total[0]) \
            | (dist > sim[0])
        return jnp.where(bad, nbits + 1, dist)

    smapped = shard_map(
        tile, mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P(axes), P(), P()),
        out_specs=P(None, axes))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(q_var_u8, base_u8, status, n_total, similarity, k):
        cap = base_u8.shape[0]
        boff = jnp.arange(ndev, dtype=jnp.int32) * (cap // ndev)
        gated = smapped(unpack_bits_pm1(q_var_u8),
                        unpack_bits_pm1(base_u8), status, boff,
                        jnp.full((1,), n_total, dtype=jnp.int32),
                        jnp.full((1,), similarity, dtype=jnp.int32))
        neg, idx = jax.lax.top_k(-gated, k)
        return -neg, idx

    return run


def sharded_group_files(mesh: Mesh, files, similarity: int = 40,
                        sort_order: str = "name"):
    """Mesh-sharded end of the grouping pipeline: scanner.rs:1640-1830
    semantics (dihedral variants, low-quality exact-only gate, union-
    find, stem merge, analyze, sort) with the all-pairs edge search
    running on the ('q','b') device mesh instead of one chip."""
    from ..grouping import engine

    idx = [i for i, f in enumerate(files) if f.pdqhash is not None]
    if not idx:
        return [], [], 0
    base = np.stack([np.frombuffer(files[i].pdqhash, dtype=np.uint8)
                     for i in idx])
    variants = np.stack([
        files[i].dihedral if files[i].dihedral is not None
        else np.repeat(base[k][None], 8, axis=0)
        for k, i in enumerate(idx)])
    low = np.array([files[i].is_low_quality for i in idx])

    ei, ej = sharded_find_edges(mesh, base, variants, low, similarity)
    dense = np.asarray(idx, dtype=np.int64)
    # one shared production tail (union-find incl. the native fast
    # path, stem merge, analyze, ordering) — engine.finalize_edges
    return engine.finalize_edges(files, dense[ei], dense[ej],
                                 sort_order)


def full_dedup_step(mesh: Mesh, rows: int, cols: int, similarity: int = 40):
    """The flagship end-to-end device step: sharded hash -> sharded group.

    (B, rows, cols) u8 lumas -> (hashes (B, 32) u8, quality (B,),
    tile match counts (nq, nb) int32).  This is the unit the CLI scan loop
    dispatches per batch and the unit dryrun_multichip compiles.
    """
    hasher = sharded_pdq_hasher(mesh, rows, cols)
    grouper = sharded_group_counts(mesh, similarity)

    def step(lumas):
        out = hasher(lumas)
        low = out["quality"] * 100.0 < 50.0
        counts = grouper(out["dihedral"], low)
        return out["hash"], out["quality"], counts

    return step
