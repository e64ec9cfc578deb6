"""Independent, spec-derived PDQ oracle (VERDICT r2 missing #3).

A second implementation of the PDQ hash written from the *published
algorithm definition* (the facebook/ThreatExchange PDQ document: Jarosz
two-pass box blur -> decimate to 64x64 -> 16x64 DCT-II keeping
frequencies 1..16 -> lower-median threshold -> 256 bits), deliberately
NOT derived from the reference code's structure:

  * float64 throughout (the golden chain is f32 with pinned ordering);
  * the box filter is a direct per-output-pixel clipped-window mean —
    no running sums, no phase arithmetic;
  * the DCT is the direct O(n^2) cosine-sum definition
    B[u][v] = sum_{r,s} m(u,r) A[r][s] m(v,s),
    m(u,r) = sqrt(2/64) cos(pi (u+1) (2r+1) / 128) — built inline, not
    shared with ops/pdq_ref.dct_matrix;
  * the median is a plain sort taking the 128th smallest.

Only *conventions* are shared with the golden (and documented as such):
the Rec.601 integer luma + <=512 box pre-resize input preparation
(validated separately by physical-transform tests), the window divisor
(window = ceil(dim/64), the reference's published constant), and the
32-byte packing layout (bit i of the row-major 16x16 matrix -> byte
31 - i//8, bit i%8).  Everything the round-2 verdict flagged as
single-derivation — blur, decimate, DCT, median, quality — is
re-derived here from the definition.

Agreement protocol (the reference's own cross-implementation standard,
/root/reference/NOTES.txt:63-91): exact, or <=2 bits with the
explanation that a float64 re-derivation can flip median-adjacent
coefficients whose f32 value ties the median.
"""
from __future__ import annotations

import numpy as np

OUT = 64        # decimated buffer side
DCT_N = 16      # kept DCT frequencies (1..16)


def _box1d_direct(vec: np.ndarray, w: int) -> np.ndarray:
    """Centered clipped-window mean: out[i] = mean(in[lo:hi]) with
    lo = max(0, i - (w - h)), hi = min(n, i + h), h = (w + 2) // 2.
    This is the window the published 4-phase running-sum box filter
    covers, stated directly."""
    n = len(vec)
    h = (w + 2) // 2
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        lo = max(0, i - (w - h))
        hi = min(n, i + h)
        out[i] = vec[lo:hi].mean()
    return out


def _jarosz(buf: np.ndarray, nreps: int = 2) -> np.ndarray:
    """Two passes of (box along each row, then box along each column),
    window = ceil(dim / 64) per axis."""
    rows, cols = buf.shape
    w_row = -(-cols // OUT)   # window over the column index
    w_col = -(-rows // OUT)   # window over the row index
    buf = buf.astype(np.float64)
    for _ in range(nreps):
        buf = np.stack([_box1d_direct(buf[i], w_row)
                        for i in range(rows)])
        buf = np.stack([_box1d_direct(buf[:, j], w_col)
                        for j in range(cols)], axis=1)
    return buf


def _decimate(buf: np.ndarray) -> np.ndarray:
    """Sample at bin centers: out[i][j] = in[(2i+1)R//128][(2j+1)C//128]."""
    rows, cols = buf.shape
    ri = [((2 * i + 1) * rows) // (2 * OUT) for i in range(OUT)]
    ci = [((2 * j + 1) * cols) // (2 * OUT) for j in range(OUT)]
    return buf[np.ix_(ri, ci)]


def _dct_16x16(a64: np.ndarray) -> np.ndarray:
    """Direct cosine-sum DCT-II keeping frequencies 1..16, float64."""
    u = np.arange(DCT_N, dtype=np.float64)[:, None]       # output freq
    r = np.arange(OUT, dtype=np.float64)[None, :]         # input index
    m = np.sqrt(2.0 / OUT) * np.cos(
        (np.pi / (2 * OUT)) * (u + 1.0) * (2.0 * r + 1.0))
    return m @ a64.astype(np.float64) @ m.T


def _quality(buf64: np.ndarray) -> float:
    """Sum of truncated scaled gradients of the 64x64 buffer, /90,
    clamped to 1 (matching the golden's [0,1] scale)."""
    g = 0.0
    for d in (buf64[:-1] - buf64[1:], buf64[:, :-1] - buf64[:, 1:]):
        g += float(np.trunc(np.abs(d * 100.0 / 255.0)).sum())
    return min(g / 90.0, 1.0)


def _pack(bits: np.ndarray) -> bytes:
    flat = bits.reshape(-1)
    out = bytearray(32)
    for i, b in enumerate(flat):
        if b:
            out[31 - i // 8] |= 1 << (i % 8)
    return bytes(out)


def spec_pdq_from_luma(luma: np.ndarray) -> tuple[bytes, float]:
    """u8 (or float) luma plane -> (32-byte PDQ hash, quality [0,1])."""
    blurred = _jarosz(np.asarray(luma, dtype=np.float64))
    buf64 = _decimate(blurred)
    coeffs = _dct_16x16(buf64)
    med = np.sort(coeffs.reshape(-1))[(coeffs.size - 1) // 2]
    return _pack(coeffs > med), _quality(buf64)
