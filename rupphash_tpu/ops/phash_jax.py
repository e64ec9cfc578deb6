"""TPU-native batched pHash: resize + DCT folded into two skinny matmuls.

Design: from a u8 luma working plane X (the same input the PDQ kernel
consumes), the classic pHash is

  X32    = T_h @ X @ T_w^T        (triangle resize to 32x32)
  low8x8 = D32[:8] @ X32 @ D32[:8]^T

so with P = D32[:8] @ T_h (8 x H) and Q = T_w^T @ D32[:8]^T (W x 8) the
whole image-domain pipeline is `low8x8 = P @ X @ Q` — two MXU matmuls per
image, exactly like the PDQ path (see pdq_jax.py).

Deviation from the golden (phash_ref.hash_image): the reference resizes
the full-resolution *RGB* image and quantizes to u8 before the luma/DCT;
this batch path starts from the working luma plane.  Both land within the
same couple-of-bits resampling noise band the reference itself accepts
versus Python imagehash (phash.rs:5-8); the golden remains the parity
anchor for single-image hashing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import phash_ref

HASH_SIZE = phash_ref.HASH_SIZE


@functools.lru_cache(maxsize=512)
def phash_operators(rows: int, cols: int):
    """(P, Q): float32 (8, rows) and (cols, 8) fused resize+DCT operators."""
    d8 = phash_ref.dct2_matrix().astype(np.float64)[:HASH_SIZE]
    th = phash_ref.triangle_kernel_matrix(rows, 32).astype(np.float64)
    tw = phash_ref.triangle_kernel_matrix(cols, 32).astype(np.float64)
    p = d8 @ th
    q = tw.T @ d8.T
    return p.astype(np.float32), q.astype(np.float32)


def bits_to_u64_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8, 8) bool -> (..., 8) uint8, big-endian: bit 63 is (0,0),
    i.e. byte 0 = first row with its first column in the MSB."""
    weights = jnp.asarray(1 << np.arange(7, -1, -1), dtype=jnp.int32)
    rows = (bits.astype(jnp.int32) * weights).sum(axis=-1)
    return rows.astype(jnp.uint8)


def dihedral_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(B, 8, 8) bool -> (B, 8, 8, 8) bool: the 8 dihedral variants in the
    reference order [id, r90, r180, r270, fh, fh+r90, fh+r180, fh+r270],
    as exact bit-matrix operations (phash.rs:150-255)."""
    y = np.arange(8)
    col_odd = jnp.asarray((y % 2 == 1)[None, :].repeat(8, 0))     # dst_x odd
    row_odd = jnp.asarray((y % 2 == 1)[:, None].repeat(8, 1))     # dst_y odd
    sum_odd = jnp.asarray(((y[:, None] + y[None, :]) % 2 == 1))

    def r90(b):
        return jnp.swapaxes(b, -1, -2) ^ col_odd

    def r180(b):
        return b ^ sum_odd

    def r270(b):
        return jnp.swapaxes(b, -1, -2) ^ row_odd

    def fh(b):
        return b ^ col_odd

    f = fh(bits)
    return jnp.stack([bits, r90(bits), r180(bits), r270(bits),
                      f, r90(f), r180(f), r270(f)], axis=1)


def phash_core(lumas: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray,
               precision=jax.lax.Precision.HIGHEST):
    """(B, H, W) u8 lumas -> dict with hash (B, 8) u8 and
    dihedral (B, 8, 8) u8 (8 variants x 8 bytes)."""
    x = lumas.astype(jnp.float32)
    xq = jax.lax.dot_general(x, q, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)                  # (B,H,8)
    low = jax.lax.dot_general(xq, p.T, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=precision)                 # (B,8,8q)? -> see below
    low = jnp.swapaxes(low, 1, 2)                                  # (B,8p,8q)
    flat = low.reshape(-1, 64)
    # median excluding DC: sorted[31] of the 63 non-DC coefficients
    no_dc = jnp.sort(flat[:, 1:], axis=-1)
    median = no_dc[:, 31]
    bits = (flat > median[:, None]).reshape(-1, 8, 8)
    variants = dihedral_bits(bits)
    packed = bits_to_u64_bytes(variants)                           # (B,8,8)
    return {"hash": packed[:, 0, :], "dihedral": packed}


@functools.lru_cache(maxsize=256)
def _jitted_core(rows: int, cols: int):
    p_np, q_np = phash_operators(rows, cols)

    @jax.jit
    def run(lumas):
        return phash_core(lumas, jnp.asarray(p_np), jnp.asarray(q_np))

    return run


def phash_batch(lumas) -> dict:
    """Hash a batch of same-shape u8 luma planes (B, rows, cols)."""
    b, rows, cols = lumas.shape
    return _jitted_core(rows, cols)(jnp.asarray(lumas))


def u64_from_bytes(b: np.ndarray) -> int:
    return int.from_bytes(bytes(b), "big")
