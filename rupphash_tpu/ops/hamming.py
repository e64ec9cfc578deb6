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

Edge extraction is two-phase to avoid materializing N^2: a counting sweep
returns per-tile match counts (tiny), then only tiles with matches are
re-materialized as packed bitmasks and expanded host-side.  Random-corpus
sweeps therefore transfer almost nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_SIMILARITY_64 = 15   # hamminghash.rs:5
MAX_SIMILARITY_256 = 63  # hamminghash.rs:8

# default device tile sizes (rows x cols of the distance tile)
QUERY_TILE = 512
BASE_TILE = 2048


def pm1_encode(hashes: np.ndarray) -> np.ndarray:
    """(N, nbytes) uint8 packed hashes -> (N, nbytes*8) int8 in {-1, +1}.

    Bit b of byte k maps to column k*8 + b.  The mapping is fixed and
    shared by queries and base, so Hamming distances are preserved no
    matter the layout of the packed hash bytes.
    """
    bits = np.unpackbits(hashes, axis=-1, bitorder="little")
    return (bits.astype(np.int8) << 1) - 1


def unpack_edges_mask(mask_packed: np.ndarray, qoff: int, boff: int,
                      ta: int, tb: int):
    """(ta, tb/8) packed uint8 -> (i, j) global index arrays."""
    m = np.unpackbits(mask_packed, axis=-1, bitorder="little")[:, :tb]
    qi, bj = np.nonzero(m)
    return qi + qoff, bj + boff


@functools.partial(jax.jit, static_argnames=("tb", "nbits"))
def _tile_scan_counts(qvar, base, qlow, blow, qoff, sim, n_total, tb, nbits):
    """Counting sweep: one query tile (ta, V, nbits) int8 vs the whole
    base (Npad, nbits) int8.  Returns (num_base_tiles,) int32 counts."""
    ta, v, _ = qvar.shape
    npad = base.shape[0]
    nb_tiles = npad // tb
    flat_q = qvar.reshape(ta * v, nbits)
    qidx = qoff + jax.lax.broadcasted_iota(jnp.int32, (ta, 1), 0)

    def body(j, counts):
        btile = jax.lax.dynamic_slice(base, (j * tb, 0), (tb, nbits))
        btl = jax.lax.dynamic_slice(blow, (j * tb,), (tb,))
        dots = jax.lax.dot_general(
            flat_q, btile.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        best = dots.reshape(ta, v, tb).max(axis=1)
        dist = (nbits - best) // 2
        thr = jnp.where(qlow[:, None] | btl[None, :], 0, sim)
        jidx = j * tb + jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
        mask = ((dist <= thr) & (jidx > qidx)
                & (jidx < n_total) & (qidx < n_total))
        return counts.at[j].set(mask.sum(dtype=jnp.int32))

    counts = jnp.zeros((nb_tiles,), dtype=jnp.int32)
    return jax.lax.fori_loop(0, nb_tiles, body, counts)


@functools.partial(jax.jit, static_argnames=("tb", "nbits"))
def _tile_extract(qvar, btile, qlow, btl, qoff, boff, sim, n_total, tb, nbits):
    """Re-materialize one (ta, tb) match tile as packed uint8 bits."""
    ta, v, _ = qvar.shape
    flat_q = qvar.reshape(ta * v, nbits)
    dots = jax.lax.dot_general(flat_q, btile.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    best = dots.reshape(ta, v, tb).max(axis=1)
    dist = (nbits - best) // 2
    thr = jnp.where(qlow[:, None] | btl[None, :], 0, sim)
    qidx = qoff + jax.lax.broadcasted_iota(jnp.int32, (ta, 1), 0)
    jidx = boff + jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
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

    tb = base_tile
    ta = query_tile
    npad = -(-n // tb) * tb
    base_pm1 = np.zeros((npad, nbits), dtype=np.int8)
    base_pm1[:n] = pm1_encode(base_hashes)
    # padding rows encode as -1s; they are excluded via blow=True
    blow = np.ones(npad, dtype=bool)
    blow[:n] = low_conf
    # padding also must never match at distance 0: flip alternate bits so
    # padding differs from everything by >= nbits/2 ... simpler: force the
    # j-index mask by marking padded rows low AND making them distance-far.
    if npad > n:
        base_pm1[n:, ::2] = 1
        base_pm1[n:, 1::2] = -1

    base_d = jax.device_put(base_pm1)
    blow_d = jax.device_put(blow)

    qpad = -(-n // ta) * ta
    var_pm1 = np.zeros((qpad, v, nbits), dtype=np.int8)
    var_pm1[:n] = pm1_encode(variants.reshape(n, -1)).reshape(n, v, nbits)
    if qpad > n:
        var_pm1[n:, :, ::2] = -1
        var_pm1[n:, :, 1::2] = 1
    qlow = np.ones(qpad, dtype=bool)
    qlow[:n] = low_conf

    edges_i: list[np.ndarray] = []
    edges_j: list[np.ndarray] = []
    tiles_scanned = 0
    tiles_extracted = 0
    for q0 in range(0, qpad, ta):
        qvar = jax.device_put(var_pm1[q0:q0 + ta])
        ql = jax.device_put(qlow[q0:q0 + ta])
        counts = np.asarray(_tile_scan_counts(
            qvar, base_d, ql, blow_d, q0, similarity, n, tb, nbits))
        tiles_scanned += counts.size
        for bj in np.nonzero(counts)[0]:
            b0 = int(bj) * tb
            btile = jax.lax.dynamic_slice(base_d, (b0, 0), (tb, nbits))
            btl = jax.lax.dynamic_slice(blow_d, (b0,), (tb,))
            packed = np.asarray(_tile_extract(
                qvar, btile, ql, btl, q0, b0, similarity, n, tb, nbits))
            gi, gj = unpack_edges_mask(packed, q0, b0, ta, tb)
            keep = (gi < n) & (gj < n)
            edges_i.append(gi[keep].astype(np.int64))
            edges_j.append(gj[keep].astype(np.int64))
            tiles_extracted += 1

    ei = np.concatenate(edges_i) if edges_i else np.empty(0, dtype=np.int64)
    ej = np.concatenate(edges_j) if edges_j else np.empty(0, dtype=np.int64)
    if return_stats:
        return ei, ej, {"tiles_scanned": tiles_scanned,
                        "tiles_extracted": tiles_extracted,
                        "pairs_checked": n * (n - 1) // 2 * v}
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
