"""TPU demosaic + raw color pipeline (Malvar-He-Cutler).

LibRaw's role in the reference (demosaic/process, gui/image.rs:1886-1945)
is re-designed TPU-first: the CFA mosaic is demosaiced as a *single
batched 5x5 convolution* — four fixed linear filters (Malvar, He,
Cutler, ICASSP 2004: high-quality linear interpolation for Bayer
patterns) evaluated by one `lax.conv` on the MXU, then per-phase
selection by static CFA masks.  White balance, the DNG color matrix
(XYZ->camera, inverted and composed with XYZ->sRGB), and the sRGB
transfer are fused elementwise epilogues that XLA folds into the same
program.  Everything is static-shaped and jit-cached per raster size.

The four MHC filters (x 1/8):

  G at R/B sites          R/B at G (same-row nbrs)   R at B / B at R
   0  0 -1  0  0            0  0  .5  0  0            0  0 -1.5 0  0
   0  0  2  0  0            0 -1  0  -1 0             0  2  0   2  0
  -1  2  4  2 -1           -1  4  5   4 -1          -1.5 0  6   0 -1.5
   0  0  2  0  0            0 -1  0  -1 0             0  2  0   2  0
   0  0 -1  0  0            0  0  .5  0  0            0  0 -1.5 0  0

(vertical-neighbor variant = transpose of the middle filter).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

_KG = np.array([[0, 0, -1, 0, 0],
                [0, 0, 2, 0, 0],
                [-1, 2, 4, 2, -1],
                [0, 0, 2, 0, 0],
                [0, 0, -1, 0, 0]], dtype=np.float32) / 8.0
_KH = np.array([[0, 0, 0.5, 0, 0],
                [0, -1, 0, -1, 0],
                [-1, 4, 5, 4, -1],
                [0, -1, 0, -1, 0],
                [0, 0, 0.5, 0, 0]], dtype=np.float32) / 8.0
_KV = _KH.T.copy()
_KD = np.array([[0, 0, -1.5, 0, 0],
                [0, 2, 0, 2, 0],
                [-1.5, 0, 6, 0, -1.5],
                [0, 2, 0, 2, 0],
                [0, 0, -1.5, 0, 0]], dtype=np.float32) / 8.0

# XYZ (D65) -> linear sRGB, IEC 61966-2-1
_XYZ2SRGB = np.array([[3.2406, -1.5372, -0.4986],
                      [-0.9689, 1.8758, 0.0415],
                      [0.0557, -0.2040, 1.0570]], dtype=np.float32)


@functools.partial(jax.jit, static_argnames=("cfa",))
def _demosaic_jax(x, cfa):
    """x: (B, H, W) float32 mosaic in [0,1]; cfa: 2x2 tuple of 0/1/2.
    Returns (B, H, W, 3) linear RGB."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    b, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    kern = jnp.asarray(np.stack([_KG, _KH, _KV, _KD]))[:, None]  # OIHW
    # HIGHEST: default MXU bf16 perturbs the interpolation weights
    # enough to flip u8 output pixels, breaking CPU/TPU decode parity
    # for the same raw file (CLAUDE.md bit-exactness policy)
    maps = lax.conv_general_dilated(
        xp[:, None], kern, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST)  # (B,4,H,W)
    fg, fh, fv, fd = maps[:, 0], maps[:, 1], maps[:, 2], maps[:, 3]

    yy = jnp.arange(h)[:, None] & 1
    xx = jnp.arange(w)[None, :] & 1
    cfa_arr = np.asarray(cfa, dtype=np.int32).reshape(2, 2)
    # color of each pixel site (0=R,1=G,2=B)
    site = jnp.asarray(cfa_arr)[yy, xx][None]  # (1,H,W)

    is_r = site == 0
    is_g = site == 1
    is_b = site == 2
    # at a G site, are the R neighbors horizontal?  true when the same
    # row contains an R in the 2x2 tile
    r_row = np.array([0 in cfa_arr[0], 0 in cfa_arr[1]])
    g_r_horiz = jnp.asarray(r_row)[yy][None] & is_g

    red = jnp.where(is_r, x,
                    jnp.where(is_g,
                              jnp.where(g_r_horiz, fh, fv),
                              fd))
    green = jnp.where(is_g, x, fg)
    blue = jnp.where(is_b, x,
                     jnp.where(is_g,
                               jnp.where(g_r_horiz, fv, fh),
                               fd))
    return jnp.stack([red, green, blue], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfa", "has_matrix"))
def _process_jax(mosaic, black, white, wb, matrix, cfa, has_matrix):
    import jax.numpy as jnp

    x = (mosaic.astype(jnp.float32) - black) / jnp.maximum(
        white - black, 1.0)
    x = jnp.clip(x, 0.0, 1.0)
    # white balance in mosaic domain: divide each site by its channel's
    # as-shot-neutral (G-normalized)
    yy = jnp.arange(x.shape[1])[:, None] & 1
    xx = jnp.arange(x.shape[2])[None, :] & 1
    site = jnp.asarray(np.asarray(cfa, np.int32).reshape(2, 2))[yy, xx]
    gains = wb[site][None]
    x = jnp.clip(x * gains, 0.0, 1.0)
    rgb = _demosaic_jax(x, cfa)
    if has_matrix:
        rgb = jnp.einsum("bhwc,dc->bhwd", rgb, matrix,
                         precision=jax.lax.Precision.HIGHEST)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    # sRGB transfer
    srgb = jnp.where(rgb <= 0.0031308, rgb * 12.92,
                     1.055 * jnp.power(jnp.maximum(rgb, 1e-8),
                                       1 / 2.4) - 0.055)
    return jnp.round(jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfa", "n", "has_matrix"))
def _process_generic_jax(mosaic, black, white, wb, matrix, cfa, n,
                         has_matrix):
    """Arbitrary n x n RGB CFA (e.g. Fuji X-Trans 6x6): per-channel
    normalized convolution with a 5x5 tent kernel.  One batched conv on
    the MXU — the TPU-idiomatic generalization of the Malvar path for
    patterns it cannot express.  X-Trans guarantees every color within
    a radius-2 window, so the tent support always covers >=1 site."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    b, h, w = mosaic.shape
    x = (mosaic.astype(jnp.float32) - black) / jnp.maximum(
        white - black, 1.0)
    x = jnp.clip(x, 0.0, 1.0)
    yy = jnp.arange(h)[:, None] % n
    xx = jnp.arange(w)[None, :] % n
    site = jnp.asarray(np.asarray(cfa, np.int32).reshape(n, n))[yy, xx]
    x = jnp.clip(x * wb[site][None], 0.0, 1.0)

    tent = np.outer([1, 2, 3, 2, 1], [1, 2, 3, 2, 1]).astype(np.float32)
    kern = jnp.asarray(tent)[None, None]  # OIHW (1,1,5,5)

    def conv(v):
        vp = jnp.pad(v, ((0, 0), (2, 2), (2, 2)), mode="reflect")
        return lax.conv_general_dilated(
            vp[:, None], kern, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=lax.Precision.HIGHEST)[:, 0]

    planes = []
    for c in range(3):
        mask = (site == c).astype(jnp.float32)[None]
        num = conv(x * mask)
        den = conv(jnp.broadcast_to(mask, x.shape))
        # a reflected corner window of a degenerate pattern can hold no
        # site of color c: fall back to the local sample rather than 0
        interp = jnp.where(den > 1e-6, num / jnp.maximum(den, 1e-6), x)
        planes.append(jnp.where(site[None] == c, x, interp))
    rgb = jnp.stack(planes, axis=-1)
    if has_matrix:
        rgb = jnp.einsum("bhwc,dc->bhwd", rgb, matrix,
                         precision=jax.lax.Precision.HIGHEST)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    srgb = jnp.where(rgb <= 0.0031308, rgb * 12.92,
                     1.055 * jnp.power(jnp.maximum(rgb, 1e-8),
                                       1 / 2.4) - 0.055)
    return jnp.round(jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def demosaic_batch(mosaics: np.ndarray, cfa) -> np.ndarray:
    """(B, H, W) [0,1] float mosaics -> (B, H, W, 3) linear RGB."""
    import jax.numpy as jnp
    cfa_t = tuple(int(v) for v in np.asarray(cfa).flatten())
    return np.asarray(_demosaic_jax(jnp.asarray(mosaics, jnp.float32),
                                    cfa_t))


def process_raw(raw) -> np.ndarray | None:
    """RawImage (pipeline/dng.py) -> (H, W, 3) uint8 sRGB."""
    import jax.numpy as jnp

    mosaic = raw.mosaic
    if mosaic.ndim != 2 or min(mosaic.shape) < 4:
        return None
    if raw.linear:
        # LinearRaw: already demosaiced single-plane -> grayscale
        x = (mosaic.astype(np.float32) - raw.black) / max(
            raw.white - raw.black, 1.0)
        g = np.clip(x, 0.0, 1.0)
        srgb = np.where(g <= 0.0031308, g * 12.92,
                        1.055 * np.power(np.maximum(g, 1e-8),
                                         1 / 2.4) - 0.055)
        u8 = np.round(np.clip(srgb, 0, 1) * 255).astype(np.uint8)
        return np.stack([u8] * 3, axis=-1)

    cfa_arr = np.asarray(raw.cfa)
    n = int(cfa_arr.shape[0])
    if cfa_arr.ndim != 2 or cfa_arr.shape[1] != n:
        return None
    # n-align so the CFA phase is static
    h2 = (mosaic.shape[0] // n) * n
    w2 = (mosaic.shape[1] // n) * n
    if h2 < n or w2 < n:
        return None
    mosaic = mosaic[:h2, :w2]
    cfa_t = tuple(int(v) for v in cfa_arr.flatten())
    if any(c not in (0, 1, 2) for c in cfa_t):
        return None  # non-RGB CFA (e.g. CYGM) unsupported
    if n > 2 and not all(c in cfa_t for c in (0, 1, 2)):
        return None  # degenerate pattern missing a color

    # WB gains per channel, G-normalized (AsShotNeutral is the camera
    # response to a neutral: gain = asn[G]/asn[c])
    asn = raw.as_shot_neutral
    if asn is not None and np.all(np.isfinite(np.asarray(asn[:3],
                                                         np.float64))) \
            and asn[0] > 0 and asn[2] > 0:
        wb = np.array([asn[1] / asn[0], 1.0, asn[1] / asn[2]],
                      dtype=np.float32)
    else:  # malformed AsShotNeutral (zeros/NaN): neutral gains
        wb = np.ones(3, dtype=np.float32)

    has_matrix = raw.color_matrix is not None
    if has_matrix:
        try:
            cam2xyz = np.linalg.inv(np.asarray(raw.color_matrix,
                                               np.float64))
            m = (_XYZ2SRGB @ cam2xyz).astype(np.float32)
            # row-normalize so WB'd camera white (1,1,1) stays white
            m = m / np.maximum(m.sum(axis=1, keepdims=True), 1e-6)
        except (np.linalg.LinAlgError, ValueError):
            # singular OR wrong shape (malformed DNG metadata): fall
            # back to no matrix rather than aborting the file
            has_matrix = False
            m = np.eye(3, dtype=np.float32)
    else:
        m = np.eye(3, dtype=np.float32)

    if n == 2:
        out = _process_jax(jnp.asarray(mosaic[None]),
                           jnp.float32(raw.black),
                           jnp.float32(raw.white),
                           jnp.asarray(wb), jnp.asarray(m), cfa_t,
                           has_matrix)
    else:
        out = _process_generic_jax(jnp.asarray(mosaic[None]),
                                   jnp.float32(raw.black),
                                   jnp.float32(raw.white),
                                   jnp.asarray(wb), jnp.asarray(m),
                                   cfa_t, n, has_matrix)
    return np.asarray(out[0])
