"""Pallas TPU kernels for batched PDQ hashing.

Two variants live here:

* `pdq_hash_batch_hybrid` — **compiles and runs on real TPU hardware,
  dihedral bit-exact vs the golden** (validated on the reference
  fixture and randomized sweeps): a Pallas front half computes the
  FLOPs-heavy stage (u8 luma -> L@X@R^T -> quality -> 16x16 DCT) at
  HIGHEST-precision f32 entirely in VMEM; pdq_jax's exact matmul
  epilogue (median/dihedral/packing) fuses into the same jit program.
  Measured on v5e: ~3.5x lower per-dispatch latency than the XLA path
  (useful for single-query serving), ~0.7x its steady-state
  throughput — so the XLA path (ops/pdq_jax.py) remains the scan
  pipeline's production path.

* `pdq_hash_batch_fused` — the fully-fused single kernel described
  below, exact in interpret mode.  Its dihedral tail does not compile
  on real hardware today: the (16,16)->(1,256) flatten is a sub-tile
  reshape Mosaic rejects, and flatten-free reformulations (bisection
  median on (4,16,16) tiles, per-variant 2D loops) abort this
  environment's remote Mosaic compiler even though every individual
  construct compiles in isolation (see tests and the PARITY note).

One kernel does the entire per-image pipeline that pdq_jax.py expresses
as separate XLA ops:

  u8 luma -> f32 -> T1 = L @ X        (MXU)
           buf64  = T1 @ R^T          (MXU)
           quality (gradient metric, exact small-integer arithmetic)
           C      = D16 @ buf64 @ D16^T
           4 sign variants -> 4 medians -> 4 bit matrices
           + 4 bit-transposes -> 8 dihedral variants -> packed bytes

The median is the interesting part: sorting 256 floats per variant is
what bounds the XLA path.  Here the lower median (128th smallest,
pdqhash.rs:116-124) is computed by *rank counting* — a (256 x 256)
comparison table per variant reduced along one axis:

    rank_lt[i] = #{j : c_j <  c_i}
    rank_le[i] = #{j : c_j <= c_i}
    median     = the unique value v with rank_lt <= 127 < rank_le

which is branch-free, fully vectorized VPU work with no data-dependent
control flow.  Ties across +/-0.0 cannot change the resulting bits
(x > 0.0 == x > -0.0 for the comparison against the median).

Grid: one step per TILE_B images; operators L (64 x H), R (64 x W),
D16 (16 x 64) ride along as whole-array VMEM blocks.  Outputs: packed
dihedral hashes (B, 8, 32) u8, quality (B, 1) f32, coefficients
(B, 256) f32 — identical to the XLA path, bit-for-bit (tests assert it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pdq_jax

TILE_B = 8

_SIGNS = pdq_jax._sign_patterns()          # (4, 16, 16) float32


def _median_lower(c: jnp.ndarray) -> jnp.ndarray:
    """(M, 256) -> (M, 1) lower median via rank counting."""
    lt = (c[:, None, :] < c[:, :, None]).astype(jnp.int32)   # j < i table
    le = (c[:, None, :] <= c[:, :, None]).astype(jnp.int32)
    rank_lt = lt.sum(axis=2)
    rank_le = le.sum(axis=2)
    is_med = (rank_lt <= 127) & (rank_le >= 128)
    neg_inf = jnp.float32(-3.4e38)
    return jnp.max(jnp.where(is_med, c, neg_inf), axis=1, keepdims=True)


def _pack_matrix() -> np.ndarray:
    """(256, 32) f32: packing as a matmul.  Coefficient idx r*16+c lands
    in byte 31 - idx//8 with weight 1 << (idx%8), so
    packed = bits @ P needs no reverse op (Mosaic has no `rev`)."""
    p = np.zeros((256, 32), dtype=np.float32)
    for idx in range(256):
        p[idx, 31 - idx // 8] = float(1 << (idx % 8))
    return p


def _pdq_kernel(lumas_ref, l_ref, r_ref, d_ref, signs_ref, pack_ref,
                dihedral_ref, quality_ref, coeffs_ref, *, tile_b, rows,
                cols):
    l_op = l_ref[:]          # (64, H)
    r_op = r_ref[:]          # (64, W)
    d16 = d_ref[:]           # (16, 64)
    signs = signs_ref[:]     # (4, 256) f32
    pack_w = pack_ref[:]     # (256, 32) f32

    for b in range(tile_b):
        # Mosaic has no direct u8->f32 cast; widen via int32 first
        x = lumas_ref[b].astype(jnp.int32).astype(jnp.float32)  # (H, W)
        t1 = jnp.dot(l_op, x, preferred_element_type=jnp.float32)
        buf64 = jnp.dot(t1, r_op.T, preferred_element_type=jnp.float32)

        # quality metric (pdqhash.rs:445-460): exact integer terms
        vert = buf64[:-1, :] - buf64[1:, :]
        horiz = buf64[:, :-1] - buf64[:, 1:]
        tv = jnp.floor(jnp.abs(vert * 100.0 / 255.0)).sum()
        th = jnp.floor(jnp.abs(horiz * 100.0 / 255.0)).sum()
        q = jnp.minimum((tv + th) / 90.0, 1.0)
        quality_ref[b:b + 1, 0:1] = q.reshape(1, 1)

        bd = jnp.dot(d16, buf64, preferred_element_type=jnp.float32)
        c16 = jnp.dot(bd, d16.T, preferred_element_type=jnp.float32)
        flat = c16.reshape(1, 256)
        coeffs_ref[b, :] = flat[0]

        signed = flat * signs                                # (4, 256)
        med = _median_lower(signed)                          # (4, 1)
        bits = signed > med                                  # (4, 256)
        bm = bits.reshape(4, 16, 16)
        ident, neg_c, neg_r, neg_b = bm[0], bm[1], bm[2], bm[3]
        variants = jnp.stack([
            ident, neg_r.T, neg_b, neg_c.T,
            neg_c, neg_r, ident.T, neg_b.T,
        ], axis=0).reshape(8, 256)
        packed = jnp.dot(variants.astype(jnp.float32), pack_w,
                         preferred_element_type=jnp.float32)
        dihedral_ref[b] = packed.astype(jnp.int32).astype(jnp.uint8)


@functools.lru_cache(maxsize=128)
def _build(rows: int, cols: int, tile_b: int = TILE_B,
           interpret: bool = False):
    l_np, r_np = pdq_jax.linear_operators(rows, cols)
    d_np = pdq_jax.dct16x64()
    signs_np = _SIGNS.reshape(4, 256)

    kernel = functools.partial(_pdq_kernel, tile_b=tile_b, rows=rows,
                               cols=cols)

    @jax.jit
    def run(lumas):
        b = lumas.shape[0]
        assert b % tile_b == 0
        grid = (b // tile_b,)
        dihedral, quality, coeffs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_b, rows, cols), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, rows), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, cols), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 64), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, 32), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile_b, 8, 32), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 256), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, 8, 32), jnp.uint8),
                jax.ShapeDtypeStruct((b, 1), jnp.float32),
                jax.ShapeDtypeStruct((b, 256), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(lumas, jnp.asarray(l_np), jnp.asarray(r_np), jnp.asarray(d_np),
          jnp.asarray(signs_np), jnp.asarray(_pack_matrix()))
        return {"hash": dihedral[:, 0, :], "dihedral": dihedral,
                "quality": quality[:, 0], "coeffs": coeffs}

    return run


def _split3(a: np.ndarray):
    """f32 operator -> three bf16 terms with a1+a2+a3 capturing the
    full f32 mantissa.  The luma side is integer-exact in bf16
    (0..255 needs 8 mantissa bits), so three 1-pass bf16 matmuls
    reproduce HIGHEST-precision f32 products to within one final-sum
    rounding — measured on hardware: zero hash-bit and zero quality
    difference vs the HIGHEST path on 1024-image batches, at half the
    MXU passes."""
    import ml_dtypes
    a = np.asarray(a, np.float32)
    a1 = a.astype(ml_dtypes.bfloat16)
    r1 = a - np.asarray(a1, np.float32)
    a2 = r1.astype(ml_dtypes.bfloat16)
    r2 = r1 - np.asarray(a2, np.float32)
    a3 = r2.astype(ml_dtypes.bfloat16)
    return np.asarray(a1), np.asarray(a2), np.asarray(a3)


def _coeffs_kernel(lumas_ref, l1_ref, l2_ref, l3_ref, r_ref, d_ref,
                   c_ref, q_ref, *, tile_b):
    """Front half only: u8 luma -> buf64 -> quality + 16x16 DCT block.
    This is the FLOPs-heavy part and it compiles on real hardware; the
    full kernel's median/dihedral tail trips the Mosaic compiler (the
    sub-tile flatten, and at larger scope a compiler abort), so the
    production fused path pairs this kernel with pdq_jax's exact matmul
    epilogue (dihedral_from_coeffs) in the same jit program.

    Stage 1 (the dominant matmul) uses the split-3 trick (_split3): the
    L operator rides along as three bf16 terms and the integer-exact
    bf16 luma multiplies each in one MXU pass — 3 passes instead of
    HIGHEST's 6, bit-equal hashes measured on hardware."""
    l1, l2, l3 = l1_ref[:], l2_ref[:], l3_ref[:]
    r_op = r_ref[:]
    d16 = d_ref[:]
    hi = jax.lax.Precision.HIGHEST  # bit-exact f32 (see pdq_core note)
    for b in range(tile_b):
        xb = lumas_ref[b].astype(jnp.int32).astype(
            jnp.float32).astype(jnp.bfloat16)   # exact: ints 0..255
        t1 = (jnp.dot(l1, xb, preferred_element_type=jnp.float32)
              + jnp.dot(l2, xb, preferred_element_type=jnp.float32)
              + jnp.dot(l3, xb, preferred_element_type=jnp.float32))
        buf64 = jnp.dot(t1, r_op.T, preferred_element_type=jnp.float32,
                        precision=hi)
        vert = buf64[:-1, :] - buf64[1:, :]
        horiz = buf64[:, :-1] - buf64[:, 1:]
        tv = jnp.floor(jnp.abs(vert * 100.0 / 255.0)).sum()
        th = jnp.floor(jnp.abs(horiz * 100.0 / 255.0)).sum()
        q_ref[b] = jnp.broadcast_to(
            jnp.minimum((tv + th) / 90.0, 1.0), (1, 128))
        bd = jnp.dot(d16, buf64, preferred_element_type=jnp.float32,
                     precision=hi)
        c_ref[b] = jnp.dot(bd, d16.T,
                           preferred_element_type=jnp.float32,
                           precision=hi)


@functools.lru_cache(maxsize=128)
def _build_hybrid(rows: int, cols: int, tile_b: int = TILE_B,
                  interpret: bool = False):
    l_np, r_np = pdq_jax.linear_operators(rows, cols)
    d_np = pdq_jax.dct16x64()
    l1_np, l2_np, l3_np = _split3(l_np)
    kernel = functools.partial(_coeffs_kernel, tile_b=tile_b)

    @jax.jit
    def run(lumas):
        b = lumas.shape[0]
        assert b % tile_b == 0
        coeffs, quality = pl.pallas_call(
            kernel,
            grid=(b // tile_b,),
            in_specs=[
                pl.BlockSpec((tile_b, rows, cols), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, rows), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, rows), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, rows), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, cols), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 64), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile_b, 16, 16), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_b, 1, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, 16, 16), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=interpret,
        )(lumas, jnp.asarray(l1_np), jnp.asarray(l2_np),
          jnp.asarray(l3_np), jnp.asarray(r_np), jnp.asarray(d_np))
        dihedral = pdq_jax.dihedral_from_coeffs(coeffs)
        return {"hash": dihedral[:, 0, :], "dihedral": dihedral,
                "quality": quality[:, 0, 0],
                "coeffs": coeffs.reshape(-1, 256)}

    return run


def _pad_run(build, lumas, interpret: bool):
    """Pad the batch to a TILE_B multiple, dispatch, slice back."""
    lumas = np.asarray(lumas)
    b, rows, cols = lumas.shape
    bpad = -(-b // TILE_B) * TILE_B
    if bpad != b:
        lumas = np.concatenate(
            [lumas, np.zeros((bpad - b, rows, cols), dtype=lumas.dtype)])
    out = build(rows, cols, TILE_B, interpret)(jnp.asarray(lumas))
    if bpad != b:
        out = {k: v[:b] for k, v in out.items()}
    return out


def pdq_hash_batch_hybrid(lumas, interpret: bool = False):
    """Pallas front half (luma -> quality + DCT coefficients) + XLA
    matmul epilogue (median/dihedral/packing), fused into one jit
    program.  Compiles and runs on real TPU hardware; same output
    contract as pdq_jax.pdq_hash_batch."""
    return _pad_run(_build_hybrid, lumas, interpret)


def pdq_hash_batch_fused(lumas, interpret: bool = False):
    """Fused-kernel batch hashing; pads the batch up to a TILE_B multiple.
    Same output contract as pdq_jax.pdq_hash_batch."""
    return _pad_run(_build, lumas, interpret)
