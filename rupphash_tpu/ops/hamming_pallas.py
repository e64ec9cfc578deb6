"""Fused Pallas TPU kernel for the all-pairs Hamming counting sweep.

The XLA path in ops/hamming.py materializes each (query x base) int32 dot
tile in HBM before reducing it; at 1M hashes that HBM round-trip, not the
MXU, bounds throughput.  This kernel keeps the whole epilogue in VMEM:

  grid (qi, bj) over upper-triangle tiles, bj innermost
    for v in 0..V-1:   (static unroll)
      dots_v = qtile_v (ta x nbits int8) @ btile^T (nbits x tb)  # MXU int32
      acc    = max(acc, dots_v)          # min distance == max dot
    mask = (acc >= nbits - 2*thr) & (j > i) & in-range
    rowcounts[qi*ta : (qi+1)*ta] += mask.sum(axis=1)

Distance never exists as a tensor: the threshold comparison happens on
the dot accumulator directly (d <= t  <=>  dot >= nbits - 2t).  The
output is per-query-row match counts, accumulated across base tiles into
the same (ta, 1) block — the canonical Pallas reduction pattern.  Row
counts both drive edge extraction (only rows with counts > 0 are
re-materialized, see ops/hamming.py:extract_rows) and give per-file
duplicate degrees for free.

Inputs are +/-1 int8 encodings laid out (V, Npad, nbits) so each
variant's tile is contiguous; low-confidence flags ride as (Npad, 1)
int32 columns (quality < 50 pairs only at distance 0,
scanner.rs:1588-1594).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = 1024
BASE_TILE = 1024


def _rowcount_kernel(qv_ref, bv_ref, qlow_ref, blow_ref, out_ref,
                     *, ta, tb, v, nbits, sim, n_total):
    qi = pl.program_id(0)
    bj = pl.program_id(1)

    @pl.when(bj == 0)
    def _():
        out_ref[:, :] = jnp.zeros((ta, 1), jnp.int32)

    # classify this tile: below-diagonal tiles are skipped entirely;
    # interior tiles (strictly above the diagonal and fully inside the
    # un-padded range) need only the threshold compare; diagonal/border
    # tiles get the full index masks.  Interior dominates (~O(n^2) of
    # them vs O(n) special ones), so its epilogue stays at 2 VPU ops
    # per element.
    above_diag = (bj + 1) * tb > qi * ta + 1
    is_diag = above_diag & (bj * tb < (qi + 1) * ta)
    in_range = ((bj + 1) * tb <= n_total) & ((qi + 1) * ta <= n_total)
    interior = above_diag & (~is_diag) & in_range

    def compute_acc():
        bt = bv_ref[:].T  # (nbits, tb) int8
        acc = jnp.dot(qv_ref[0], bt, preferred_element_type=jnp.int32)
        for vi in range(1, v):
            acc = jnp.maximum(
                acc, jnp.dot(qv_ref[vi], bt,
                             preferred_element_type=jnp.int32))
        either_low = (qlow_ref[:] + blow_ref[:].reshape(1, tb)) > 0
        dotmin = jnp.where(either_low, nbits, nbits - 2 * sim)
        return acc, dotmin

    @pl.when(interior)
    def _():
        acc, dotmin = compute_acc()
        out_ref[:, :] += (acc >= dotmin).sum(axis=1,
                                             dtype=jnp.int32)[:, None]

    @pl.when(above_diag & (is_diag | ~in_range))
    def _():
        acc, dotmin = compute_acc()
        qidx = qi * ta + jax.lax.broadcasted_iota(jnp.int32, (ta, tb), 0)
        jidx = bj * tb + jax.lax.broadcasted_iota(jnp.int32, (ta, tb), 1)
        mask = ((acc >= dotmin) & (jidx > qidx)
                & (jidx < n_total) & (qidx < n_total))
        out_ref[:, :] += mask.sum(axis=1, dtype=jnp.int32)[:, None]


@functools.partial(jax.jit,
                   static_argnames=("ta", "tb", "nbits", "sim", "n_total",
                                    "interpret"))
def scan_row_counts(var_pm1, low_i32, *, ta=QUERY_TILE, tb=BASE_TILE,
                    nbits=256, sim=40, n_total=0, interpret=False):
    """var_pm1: (V, Npad, nbits) int8; low_i32: (Npad, 1) int32.
    Returns (Npad, 1) int32 per-query-row match counts (j > i pairs)."""
    v, npad, _ = var_pm1.shape
    nq = npad // ta
    nb = npad // tb
    kernel = functools.partial(_rowcount_kernel, ta=ta, tb=tb, v=v,
                               nbits=nbits, sim=sim, n_total=n_total)
    flops = (npad * v) * npad * nbits  # ~2 flops/MAC over the upper triangle
    return pl.pallas_call(
        kernel,
        grid=(nq, nb),
        in_specs=[
            pl.BlockSpec((v, ta, nbits), lambda qi, bj: (0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, nbits), lambda qi, bj: (bj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ta, 1), lambda qi, bj: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda qi, bj: (bj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ta, 1), lambda qi, bj: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=0,
                                      transcendentals=0),
        interpret=interpret,
    )(var_pm1, var_pm1[0], low_i32, low_i32)


def prepare_inputs(base_hashes: np.ndarray,
                   variants: np.ndarray | None,
                   low_conf: np.ndarray | None,
                   ta: int = QUERY_TILE, tb: int = BASE_TILE):
    """Host-side packing to the kernel layout.  Returns
    (var_pm1 (V, Npad, nbits) int8, low (Npad,1) int32, n, npad)."""
    from . import hamming

    n, nbytes = base_hashes.shape
    if variants is None:
        variants = base_hashes[:, None, :]
    v = variants.shape[1]
    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)
    npad = max(ta, tb)
    npad = -(-n // npad) * npad
    npad = -(-npad // ta) * ta
    npad = -(-npad // tb) * tb
    pm1 = hamming.pm1_encode(variants.reshape(n, -1)).reshape(n, v, nbytes * 8)
    var_pm1 = np.zeros((v, npad, nbytes * 8), dtype=np.int8)
    var_pm1[:, :n] = np.moveaxis(pm1, 1, 0)
    low = np.ones((npad, 1), dtype=np.int32)
    low[:n, 0] = low_conf.astype(np.int32)
    return var_pm1, low, n, npad


def _extract_kernel(qv_ref, bv_ref, qlow_ref, blow_ref, qidx_ref,
                    pack_ref, out_ref, *, mq, tb, v, nbits, sim,
                    n_total):
    """Packed-bitmask extraction for a block of hot query rows: one
    (mq, tb/8) uint8 tile of match bits per base tile.  The bit packing
    is a (mq, tb) x (tb, tb/8) int8 matmul against a block-diagonal
    power-of-two matrix — a reshape-free formulation Mosaic accepts
    (lane-dim sub-splits crash this environment's compiler, see
    tools/mosaic_repro.py)."""
    bj = pl.program_id(0)
    bt = bv_ref[:].T  # (nbits, tb) int8
    acc = jnp.dot(qv_ref[0], bt, preferred_element_type=jnp.int32)
    for vi in range(1, v):
        acc = jnp.maximum(
            acc, jnp.dot(qv_ref[vi], bt, preferred_element_type=jnp.int32))
    either_low = (qlow_ref[:] + blow_ref[:].reshape(1, tb)) > 0
    dotmin = jnp.where(either_low, nbits, nbits - 2 * sim)
    jidx = bj * tb + jax.lax.broadcasted_iota(jnp.int32, (mq, tb), 1)
    mask = ((acc >= dotmin) & (jidx > qidx_ref[:])
            & (jidx < n_total) & (qidx_ref[:] < n_total))
    out_ref[:, :] = jnp.dot(mask.astype(jnp.int8), pack_ref[:],
                            preferred_element_type=jnp.int32
                            ).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("tb", "nbits", "sim", "n_total",
                                    "interpret"))
def extract_rows_packed(q_pm1, base_pm1, qlow, blow, qidx, *,
                        tb=BASE_TILE, nbits=256, sim=40, n_total=0,
                        interpret=False):
    """q_pm1 (V, MQ, nbits) int8 hot-row variants; base_pm1
    (Npad, nbits) int8; qlow (MQ, 1) / blow (Npad, 1) int32;
    qidx (MQ, 1) int32 global row indices (>= n_total rows inert).
    Returns (MQ, Npad/8) uint8 packed match bitmasks, all tiles
    VMEM-resident (the XLA formulation materializes the (MQ, Npad)
    int32 dot in HBM — tens of GB at the 1M scale)."""
    v, mq, _ = q_pm1.shape
    npad = base_pm1.shape[0]
    pack = np.zeros((tb, tb // 8), dtype=np.int8)
    j = np.arange(tb)
    pack[j, j // 8] = (1 << (j % 8)) - 256 * (j % 8 == 7)  # int8 -128
    kernel = functools.partial(_extract_kernel, mq=mq, tb=tb, v=v,
                               nbits=nbits, sim=sim, n_total=n_total)
    packed = pl.pallas_call(
        kernel,
        grid=(npad // tb,),
        in_specs=[
            pl.BlockSpec((v, mq, nbits), lambda bj: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, nbits), lambda bj: (bj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, 1), lambda bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda bj: (bj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mq, 1), lambda bj: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, tb // 8), lambda bj: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mq, tb // 8), lambda bj: (0, bj),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mq, npad // 8), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(q_pm1, base_pm1, qlow, blow, qidx, jnp.asarray(pack))
    # int8 packing stores bit 7 as -128; uint8 view is the true mask
    return packed


@functools.partial(jax.jit, static_argnames=("npad",))
def _unpack_padded(var_packed_u8, low_i32, npad):
    from . import hamming

    return hamming.unpack_bits_pm1(var_packed_u8), low_i32


def prepare_inputs_device(base_hashes: np.ndarray,
                          variants: np.ndarray | None,
                          low_conf: np.ndarray | None,
                          ta: int = QUERY_TILE, tb: int = BASE_TILE):
    """Like prepare_inputs, but ships *packed* hashes to the device and
    unpacks to the +/-1 layout there: host->device traffic drops 8x
    (1 bit/bit instead of 1 int8/bit) — decisive when the TPU sits
    behind a slow PCIe link or network tunnel.  Returns
    (var_pm1 device (V, Npad, nbits) int8, low device (Npad, 1) int32,
    n, npad)."""
    n, nbytes = base_hashes.shape
    if variants is None:
        variants = base_hashes[:, None, :]
    v = variants.shape[1]
    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)
    npad = max(ta, tb)
    npad = -(-n // npad) * npad
    npad = -(-npad // ta) * ta
    npad = -(-npad // tb) * tb
    packed = np.zeros((v, npad, nbytes), dtype=np.uint8)
    packed[:, :n] = np.moveaxis(variants, 1, 0)
    low = np.ones((npad, 1), dtype=np.int32)
    low[:n, 0] = low_conf.astype(np.int32)
    var_d, low_d = _unpack_padded(jax.device_put(packed),
                                  jax.device_put(low), npad)
    return var_d, low_d, n, npad


@functools.partial(jax.jit, static_argnames=("npad",))
def _prep_resident(var_u8, low_i32, npad):
    """(N, V, nbytes) device u8 variants -> padded (V, Npad, nbits)
    +/-1 int8 + (Npad, 1) int32 low flags, entirely on device."""
    from . import hamming

    v, nbytes = var_u8.shape[1], var_u8.shape[2]
    packed = jnp.zeros((v, npad, nbytes), jnp.uint8)
    packed = jax.lax.dynamic_update_slice(
        packed, jnp.moveaxis(var_u8, 1, 0), (0, 0, 0))
    low = jnp.ones((npad, 1), jnp.int32)
    low = jax.lax.dynamic_update_slice(low, low_i32, (0, 0))
    return hamming.unpack_bits_pm1(packed), low


def prepare_inputs_resident(var_dev, low_conf,
                            ta: int = QUERY_TILE, tb: int = BASE_TILE):
    """Device-resident variant of prepare_inputs_device: `var_dev` is
    an (N, V, nbytes) u8 jax.Array already on device (the shape
    pdq_jax.pdq_hash_batch emits as 'dihedral') — the scan->group
    production path, where the 8 dihedral hashes never leave the chip
    and grouping pays ZERO hash re-upload.  Only the (N,) low-conf
    flags cross the link."""
    n, v, nbytes = var_dev.shape
    npad = max(ta, tb)
    npad = -(-n // npad) * npad
    npad = -(-npad // ta) * ta
    npad = -(-npad // tb) * tb
    if low_conf is None:
        low_conf = np.zeros(n, dtype=bool)
    low = np.asarray(low_conf, dtype=np.int32).reshape(n, 1)
    var_d, low_d = _prep_resident(var_dev, jax.device_put(low), npad)
    return var_d, low_d, n, npad


def row_match_counts(base_hashes: np.ndarray,
                     variants: np.ndarray | None = None,
                     low_conf: np.ndarray | None = None,
                     similarity: int = 40,
                     interpret: bool = False):
    """Host convenience: (N,) int32 per-row match counts (j > i pairs)."""
    nbits = base_hashes.shape[1] * 8
    var_pm1, low, n, npad = prepare_inputs(base_hashes, variants, low_conf)
    counts = scan_row_counts(
        jax.device_put(var_pm1), jax.device_put(low),
        ta=QUERY_TILE, tb=BASE_TILE, nbits=nbits, sim=similarity,
        n_total=n, interpret=interpret)
    return np.asarray(counts)[:n, 0], n
