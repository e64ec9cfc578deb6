"""TPU-native PDQ: the whole image-domain pipeline as MXU matmuls.

Design (TPU-first, not a port): everything the reference does between the
u8 luma plane and the DCT input is *linear and separable* —

  two-pass Jarosz box blur      (pdqhash.rs:410-426)  = B_h^2 . X . (B_w^T)^2
  decimation to 64x64           (pdqhash.rs:428-443)  = row/col selectors D_r, D_c

so the 64x64 buffer is exactly `buffer64 = L @ X @ R.T` with

  L = D_r @ B_h @ B_h    (64 x rows)
  R = D_c @ B_w @ B_w    (64 x cols)

precomputed per working shape in float64 on the host.  Add the 16x64 DCT
(`coeffs = D16 @ buffer64 @ D16.T`, pdqhash.rs:306-336) and one image's PDQ
is two skinny matmuls plus a 256-wide sort — all of which batch perfectly
onto the MXU.  The quality metric, medians, thresholding, bit packing and
the 8 dihedral variants are computed on-device as well, so a batch of luma
planes goes in and packed 32-byte codes come out.

Numerical contract: operators are composed in float64 and applied with
float32 MXU accumulation.  Versus the golden's sequential float32 running
sums this changes last-ulp rounding, so coefficients can differ by ~1e-6
relative; hash bits only flip if a coefficient ties the median to within
that noise.  Tests assert bit-identical hashes on the reference fixture
and random natural images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pdq_ref

BUFFER_W_H = pdq_ref.BUFFER_W_H
DCT_OUTPUT_W_H = pdq_ref.DCT_OUTPUT_W_H


# --------------------------------------------------------------------------
# Host-side operator construction (float64, cached per working shape)
# --------------------------------------------------------------------------

def box_filter_matrix(length: int, win: int) -> np.ndarray:
    """(length, length) float64 matrix of the reference's 4-phase box filter.

    Closed form of box_one_d_float (pdqhash.rs:340-396): with
    half = (win + 2) // 2, output o averages input [lo, hi) where
    lo = max(0, o + half - win), hi = min(length, o + half).
    """
    win = max(1, min(win, max(length, 1)))
    half = (win + 2) // 2
    m = np.zeros((length, length), dtype=np.float64)
    for o in range(length):
        lo = max(0, o + half - win)
        hi = min(length, o + half)
        m[o, lo:hi] = 1.0 / (hi - lo)
    return m


def decimation_indices(in_len: int, out_len: int = BUFFER_W_H) -> np.ndarray:
    i = np.arange(out_len)
    return ((2 * i + 1) * in_len) // (2 * out_len)


@functools.lru_cache(maxsize=512)
def linear_operators(rows: int, cols: int):
    """(L, R): float32 (64, rows) and (64, cols) operators with
    buffer64 = L @ X @ R.T for a (rows, cols) luma plane X."""
    w_rows = -(-cols // pdq_ref.JAROSZ_WINDOW_DIVISOR)  # window along rows
    w_cols = -(-rows // pdq_ref.JAROSZ_WINDOW_DIVISOR)  # window along cols
    bh = box_filter_matrix(rows, w_cols)
    bw = box_filter_matrix(cols, w_rows)
    bh2 = bh @ bh
    bw2 = bw @ bw
    l_op = bh2[decimation_indices(rows)]          # D_r @ B_h^2
    r_op = bw2[decimation_indices(cols)]          # D_c @ B_w^2
    return (np.asarray(l_op, dtype=np.float32),
            np.asarray(r_op, dtype=np.float32))


@functools.lru_cache(maxsize=1)
def dct16x64() -> np.ndarray:
    return np.asarray(pdq_ref.dct_matrix())


# --------------------------------------------------------------------------
# On-device stages
# --------------------------------------------------------------------------

def _sign_patterns() -> np.ndarray:
    """(4, 16, 16) float32 sign masks for (neg_rows, neg_cols) in
    [(F,F), (F,T), (T,F), (T,T)].  A mirror negates odd DCT *frequencies*
    (index + 1), i.e. even array indices (pdqhash.rs:127-137)."""
    odd_freq = ((np.arange(DCT_OUTPUT_W_H) + pdq_ref.DCT_FREQ_OFFSET) % 2 == 1)
    pats = np.empty((4, DCT_OUTPUT_W_H, DCT_OUTPUT_W_H), dtype=np.float32)
    for v, (nr, nc) in enumerate([(False, False), (False, True),
                                  (True, False), (True, True)]):
        fr = odd_freq if nr else np.zeros_like(odd_freq)
        fc = odd_freq if nc else np.zeros_like(odd_freq)
        pats[v] = np.where(fr[:, None] ^ fc[None, :], -1.0, 1.0)
    return pats


_SIGNS = _sign_patterns()


def _pack_matrices():
    """Bit packing and bit-transpose-then-pack as (256, 32) matmuls.

    Packing is linear over the 0/1 bit vector: coefficient idx = r*16+c
    lands in byte 31 - idx//8 with weight 1 << (idx%8); the transposed
    variants additionally permute idx -> c*16+r (the commutation
    permutation), which folds into the same matrix.  Replacing the
    (B,8,16,16) swapaxes + reshape + weighted-sum chain with two MXU
    matmuls doubles end-to-end hash throughput on TPU (the sub-tile
    transposes were half the pipeline's wall time).  All dot products
    are exact: sums of distinct powers of two <= 255.
    """
    plain = np.zeros((256, 32), dtype=np.float32)
    trans = np.zeros((256, 32), dtype=np.float32)
    for idx in range(256):
        plain[idx, 31 - idx // 8] = float(1 << (idx % 8))
        r, c = divmod(idx, 16)
        dst = c * 16 + r
        trans[idx, 31 - dst // 8] = float(1 << (dst % 8))
    return plain, trans


_PACK_PLAIN, _PACK_TRANS = _pack_matrices()

# reference variant order (pdqhash.rs:77-86) as (sign-variant index in
# _SIGNS order [id, neg_c, neg_r, neg_b], transposed?) pairs
_VARIANT_ORDER = [(0, False), (2, True), (3, False), (1, True),
                  (1, False), (2, False), (0, True), (3, True)]


def quality_from_buffer(buf64: jnp.ndarray) -> jnp.ndarray:
    """(B, 64, 64) -> (B,) quality in [0, 1]; every term is an exact small
    integer in f32 so the reduction order is irrelevant (pdqhash.rs:445-460)."""
    vert = buf64[:, :-1, :] - buf64[:, 1:, :]
    horiz = buf64[:, :, :-1] - buf64[:, :, 1:]
    tv = jnp.trunc(jnp.abs(vert * 100.0 / 255.0)).sum(axis=(1, 2))
    th = jnp.trunc(jnp.abs(horiz * 100.0 / 255.0)).sum(axis=(1, 2))
    return jnp.minimum((tv + th) / 90.0, 1.0)


def _median_lower_bisect(flat: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, 256) -> (B, 4) lower median (128th smallest,
    pdqhash.rs:116-124) by a 32-step binary search over the standard
    order-preserving float->uint32 key map.  Exactly the element a sort
    would select (ties at +/-0.0 compare identically downstream), and
    ~2x faster than jnp.sort on the TPU VPU, which made the median the
    single hottest op of the whole hash pipeline."""
    i = flat.view(jnp.int32)
    key = jnp.where(i >= 0, i.astype(jnp.uint32) + jnp.uint32(1 << 31),
                    (~i).astype(jnp.uint32))

    def body(_, state):
        lo, hi = state  # invariant: count(<= lo-1) < 128 <= count(<= hi)
        mid = lo + (hi - lo) // 2
        cnt = (key <= mid[:, :, None]).sum(axis=2)
        take_hi = cnt >= 128
        return (jnp.where(take_hi, lo, mid + 1),
                jnp.where(take_hi, mid, hi))

    lo = jnp.zeros(flat.shape[:2], jnp.uint32)
    hi = jnp.full(flat.shape[:2], jnp.uint32(0xFFFFFFFF))
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    as_int = jnp.where(lo >= jnp.uint32(1 << 31),
                       (lo - jnp.uint32(1 << 31)).astype(jnp.int32),
                       ~(lo.astype(jnp.int32)))
    return as_int.view(jnp.float32)


def dihedral_from_coeffs(coeffs: jnp.ndarray) -> jnp.ndarray:
    """(B, 16, 16) float32 coefficients -> (B, 8, 32) uint8 dihedral hashes
    in the reference order (pdqhash.rs:71-87): identity, rot90, rot180,
    rot270, mirror-x, mirror-y, transpose, anti-transpose.

    Bit packing and the bit-transposes run as exact 256x32 matmuls
    (see _pack_matrices) so the whole dihedral stage stays on the MXU.
    The pack matmuls are exact at DEFAULT (1-pass bf16) precision:
    bits are 0/1 and the weights are powers of two <= 128, all exactly
    representable in bf16, with f32 accumulation (verified bit-equal to
    HIGHEST on hardware).
    """
    b = coeffs.shape[0]
    flat = (coeffs.reshape(b, 1, 256)
            * _SIGNS.reshape(1, 4, 256))                        # (B,4,256)
    med = _median_lower_bisect(flat)                            # lower median
    bits = (flat > med[:, :, None]).astype(jnp.float32)         # (B,4,256)
    pp = jnp.einsum("bvc,ck->bvk", bits, jnp.asarray(_PACK_PLAIN))
    pt = jnp.einsum("bvc,ck->bvk", bits, jnp.asarray(_PACK_TRANS))
    outs = [(pt if tr else pp)[:, v, :] for v, tr in _VARIANT_ORDER]
    return jnp.stack(outs, axis=1).astype(jnp.int32).astype(jnp.uint8)


def pdq_core(lumas: jnp.ndarray, l_op: jnp.ndarray, r_op: jnp.ndarray,
             d16: jnp.ndarray,
             precision: jax.lax.Precision = jax.lax.Precision.HIGHEST):
    """(B, H, W) u8/f32 lumas + operators -> dict of device arrays:
    hashes (B,32) u8, dihedral (B,8,32) u8, quality (B,) f32,
    coeffs (B,256) f32.

    Precision is HIGHEST by default: on TPU the default 1-pass bf16 MXU
    matmul perturbs operator weights by ~0.2%, enough to flip hash bits
    whose coefficient ties the median; HIGHEST keeps coefficients within
    float32 rounding of the golden so hashes stay bit-identical.
    """
    x = lumas.astype(jnp.float32)
    # buffer64 = L @ X @ R^T : two MXU matmuls
    xr = jax.lax.dot_general(x, r_op.T, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)                 # (B,H,64)
    buf64 = jax.lax.dot_general(xr, l_op.T, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=precision)
    buf64 = jnp.swapaxes(buf64, 1, 2)                             # (B,64,64)
    quality = quality_from_buffer(buf64)
    # coeffs = D16 @ buf64 @ D16^T
    bd = jax.lax.dot_general(buf64, d16.T, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)                 # (B,64,16)
    coeffs = jax.lax.dot_general(bd, d16.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
    coeffs = jnp.swapaxes(coeffs, 1, 2)                           # (B,16,16)
    dihedral = dihedral_from_coeffs(coeffs)
    return {
        "hash": dihedral[:, 0, :],
        "dihedral": dihedral,
        "quality": quality,
        "coeffs": coeffs.reshape(-1, 256),
    }


# --------------------------------------------------------------------------
# Public API: per-shape jitted hasher
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=256)
def _jitted_core(rows: int, cols: int):
    l_np, r_np = linear_operators(rows, cols)
    d_np = dct16x64()

    @jax.jit
    def run(lumas):
        return pdq_core(lumas, jnp.asarray(l_np), jnp.asarray(r_np),
                        jnp.asarray(d_np))

    return run


def pdq_hash_batch(lumas: np.ndarray | jnp.ndarray):
    """Hash a batch of same-shape u8 luma planes (B, rows, cols).

    The working shape must already respect the reference's pre-downsample
    contract (<=512 px per side; use pipeline.decode.prepare for raw
    images).  Returns a dict of device arrays (see pdq_core).
    """
    b, rows, cols = lumas.shape
    return _jitted_core(rows, cols)(jnp.asarray(lumas))


def pdq_core_mixed(lumas, l_ops, r_ops, d16,
                   precision=jax.lax.Precision.HIGHEST):
    """Mixed-shape variant: per-image operators over zero-padded planes.

    Zero-padding is exact, not approximate: buffer64 = L @ X @ R^T and
    the padded columns of L/R multiply only zero pixels, so the result
    is bit-for-bit the same as the tight-shape kernel.  This lets a
    batch mix arbitrary working shapes (one compile per padded bucket)
    at the cost of streaming per-image operator matrices.
    lumas: (B, Hp, Wp) u8; l_ops: (B, 64, Hp); r_ops: (B, 64, Wp)."""
    x = lumas.astype(jnp.float32)
    t1 = jnp.einsum("bph,bhw->bpw", l_ops, x, precision=precision)
    buf64 = jnp.einsum("bpw,bqw->bpq", t1, r_ops, precision=precision)
    quality = quality_from_buffer(buf64)
    bd = jax.lax.dot_general(buf64, d16.T, (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)
    coeffs = jax.lax.dot_general(bd, d16.T, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
    coeffs = jnp.swapaxes(coeffs, 1, 2)
    dihedral = dihedral_from_coeffs(coeffs)
    return {"hash": dihedral[:, 0, :], "dihedral": dihedral,
            "quality": quality, "coeffs": coeffs.reshape(-1, 256)}


@functools.lru_cache(maxsize=64)
def _jitted_mixed(b: int, hp: int, wp: int, s: int):
    d_np = dct16x64()

    @jax.jit
    def run(lumas, l_unique, r_unique, shape_idx):
        # expand per-shape operators to per-image on DEVICE: the host
        # link (possibly a slow remote-TPU tunnel) carries only the S
        # unique operator pairs instead of 2 x (B, 64, dim) f32
        l_ops = jnp.take(l_unique, shape_idx, axis=0)
        r_ops = jnp.take(r_unique, shape_idx, axis=0)
        return pdq_core_mixed(lumas, l_ops, r_ops, jnp.asarray(d_np))

    return run


def _bucket_dim(n: int, quantum: int = 64) -> int:
    return max(quantum, -(-n // quantum) * quantum)


def pdq_hash_batch_mixed(lumas: list):
    """Hash a list of u8 luma planes of arbitrary working shapes as one
    padded device batch.  Shapes are padded up to 64-pixel buckets to
    bound compile count; results are bit-identical to the per-shape
    path.  Operators are deduplicated per unique (rows, cols) and
    expanded on device, so host->device traffic stays proportional to
    the number of distinct shapes, not the batch size.
    """
    b = len(lumas)
    if b == 0:
        return {"hash": np.zeros((0, 32), np.uint8),
                "dihedral": np.zeros((0, 8, 32), np.uint8),
                "quality": np.zeros((0,), np.float32),
                "coeffs": np.zeros((0, 256), np.float32)}
    hp = _bucket_dim(max(l.shape[0] for l in lumas))
    wp = _bucket_dim(max(l.shape[1] for l in lumas))
    # bucket the batch dim too: scan leftovers produce arbitrary
    # trailing sizes, and every distinct b would compile a fresh XLA
    # program (minutes over a remote tunnel); padded rows hash garbage
    # that is sliced away below
    bpad = max(8, 1 << (b - 1).bit_length())
    planes = np.zeros((bpad, hp, wp), dtype=np.uint8)
    shape_id: dict[tuple[int, int], int] = {}
    idx = np.zeros(bpad, dtype=np.int32)
    for k, luma in enumerate(lumas):
        rows, cols = luma.shape
        planes[k, :rows, :cols] = luma
        key = (rows, cols)
        if key not in shape_id:
            shape_id[key] = len(shape_id)
        idx[k] = shape_id[key]
    s = len(shape_id)
    l_unique = np.zeros((s, BUFFER_W_H, hp), dtype=np.float32)
    r_unique = np.zeros((s, BUFFER_W_H, wp), dtype=np.float32)
    for (rows, cols), sid in shape_id.items():
        lo, ro = linear_operators(rows, cols)
        l_unique[sid, :, :rows] = lo
        r_unique[sid, :, :cols] = ro
    # bucket S so the jit cache doesn't grow per exact shape count
    spad = max(1, 1 << (s - 1).bit_length()) if s else 1
    if spad != s:
        l_unique = np.concatenate(
            [l_unique, np.zeros((spad - s, BUFFER_W_H, hp), np.float32)])
        r_unique = np.concatenate(
            [r_unique, np.zeros((spad - s, BUFFER_W_H, wp), np.float32)])
    out = _jitted_mixed(bpad, hp, wp, spad)(
        jnp.asarray(planes), jnp.asarray(l_unique),
        jnp.asarray(r_unique), jnp.asarray(idx))
    if bpad == b:
        return out
    return {k: v[:b] for k, v in out.items()}


def pdq_hash_image(image: np.ndarray):
    """Single-image convenience mirroring generate_pdq (pdqhash.rs:199):
    returns (hash bytes, quality float) or None."""
    luma = pdq_ref.prepare_luma(image)
    if luma is None:
        return None
    out = pdq_hash_batch(luma[None])
    return bytes(np.asarray(out["hash"][0])), float(out["quality"][0])
