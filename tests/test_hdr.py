"""HDR/color management tests (port of the hdr.rs test strategy:
PQ landmarks/round-trip, BT.709-vs-sRGB behavior, hand-built minimal
PNG-with-cICP and ICC-with-cicp fixtures, hdr.rs:1030-1156)."""
import struct
import zlib

import numpy as np
import pytest

from rupphash_tpu.pipeline import hdr


def test_pq_landmarks_and_roundtrip():
    # PQ(1.0) == 10000 nits (1.0 normalized); PQ(0) == 0
    assert hdr.pq_eotf(np.float64(1.0)) == pytest.approx(1.0, abs=1e-9)
    assert hdr.pq_eotf(np.float64(0.0)) == pytest.approx(0.0, abs=1e-12)
    # 100 nits -> signal ~0.508 (SMPTE 2084 landmark)
    sig = hdr.pq_inverse_eotf(np.float64(0.01))
    assert sig == pytest.approx(0.5081, abs=2e-3)
    x = np.linspace(0, 1, 100)
    rt = hdr.pq_inverse_eotf(hdr.pq_eotf(x))
    assert np.allclose(rt, x, atol=1e-6)


def test_hlg_inverse_oetf():
    assert hdr.hlg_oetf_inverse(np.float64(0.0)) == pytest.approx(0.0)
    assert hdr.hlg_oetf_inverse(np.float64(0.5)) == pytest.approx(1 / 12, abs=1e-6)
    assert hdr.hlg_oetf_inverse(np.float64(1.0)) == pytest.approx(1.0, abs=1e-6)
    # continuity at the knee
    lo = hdr.hlg_oetf_inverse(np.float64(0.4999))
    hi = hdr.hlg_oetf_inverse(np.float64(0.5001))
    assert abs(float(hi) - float(lo)) < 1e-3


def test_bt709_vs_srgb_behavior():
    """BT.1886 decode then sRGB re-encode darkens mid-grey but keeps
    black/white fixed (hdr.rs behavioral test)."""
    cicp = hdr.Cicp(hdr.PRIMARIES_BT709, hdr.TRANSFER_BT709)
    rgb = np.array([[[0.0, 0.0, 0.0], [0.5, 0.5, 0.5],
                     [1.0, 1.0, 1.0]]])
    out = hdr.encode_srgb_u8_dithered(hdr.hdr_to_sdr(rgb, cicp), seed=1)
    assert tuple(out[0, 0]) == (0, 0, 0)
    assert tuple(out[0, 2]) == (255, 255, 255)
    assert out[0, 1, 0] < 128 - 6  # mid-grey darkens


def test_srgb_passthrough():
    cicp = hdr.Cicp(hdr.PRIMARIES_BT709, hdr.TRANSFER_SRGB)
    rgb = np.random.default_rng(0).random((4, 4, 3))
    out = hdr.hdr_to_sdr(rgb, cicp)
    assert np.allclose(out, hdr.srgb_eotf(rgb), atol=1e-9)


def test_tonemap_reduces_peak_and_preserves_sdr():
    # 1000-nit white maps to <= 1.0; 100-nit grey stays roughly in place
    lin = np.array([[[0.1, 0.1, 0.1]]])           # 1000 nits
    out = hdr.tonemap_pq_maxrgb(lin, peak_nits=203.0)
    assert out.max() <= 1.0
    lin_sdr = np.array([[[0.01, 0.01, 0.01]]])    # 100 nits
    out_sdr = hdr.tonemap_pq_maxrgb(lin_sdr, peak_nits=203.0)
    ratio = float(out_sdr[0, 0, 0]) / (0.01 / (203.0 / 10000.0))
    assert 0.7 < ratio <= 1.05


def test_gamut_matrices_preserve_white():
    white = np.ones((1, 3))
    for m in (hdr.BT2020_TO_BT709, hdr.P3_TO_BT709):
        assert np.allclose(white @ m.T, white, atol=5e-3)


def _png_with_cicp(p, t, m, fr):
    def chunk(ctype, payload):
        c = struct.pack(">I", len(payload)) + ctype + payload
        return c + struct.pack(">I", zlib.crc32(ctype + payload))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"cICP", bytes([p, t, m, fr]))
            + chunk(b"IDAT", b"\x00") + chunk(b"IEND", b""))


def test_detect_cicp_png():
    data = _png_with_cicp(9, 16, 0, 1)
    c = hdr.detect_cicp_png(data)
    assert c is not None
    assert c.primaries == hdr.PRIMARIES_BT2020
    assert c.transfer == hdr.TRANSFER_PQ
    assert c.is_hdr and c.needs_conversion
    # PNG without cICP
    plain = _png_with_cicp(1, 13, 0, 1).replace(b"cICP", b"cXCP")
    assert hdr.detect_cicp_png(plain) is None


def test_detect_cicp_isobmff():
    data = (b"\x00\x00\x00\x18ftypavif" + b"\x00" * 16
            + b"colrnclx" + struct.pack(">HHH", 12, 18, 6) + b"\x80")
    c = hdr.detect_cicp_isobmff(data)
    assert c is not None
    assert c.primaries == hdr.PRIMARIES_P3
    assert c.transfer == hdr.TRANSFER_HLG
    assert c.full_range


def test_detect_cicp_icc():
    # minimal ICC: 128-byte header, tag count 1, one 'cicp' tag
    header = b"\x00" * 128
    tag_table = struct.pack(">I", 1) + struct.pack(
        ">4sII", b"cicp", 144, 12)
    tag_data = b"cicp" + b"\x00" * 4 + bytes([9, 16, 0, 1])
    icc = header + tag_table + tag_data
    c = hdr.detect_cicp_icc(icc)
    assert c is not None and c.transfer == hdr.TRANSFER_PQ


def test_full_hdr_pipeline_smoke():
    """PQ BT.2020 gradient -> SDR u8 without banding artifacts."""
    grad = np.linspace(0, 0.6, 64)  # up to ~600 nits worth of PQ signal
    rgb = np.stack([grad, grad, grad], axis=-1)[None]
    cicp = hdr.Cicp(hdr.PRIMARIES_BT2020, hdr.TRANSFER_PQ)
    out = hdr.encode_srgb_u8_dithered(hdr.hdr_to_sdr(rgb, cicp))
    assert out.shape == (1, 64, 3)
    vals = out[0, :, 0].astype(int)
    assert vals[0] <= 2 and vals[-1] >= 200
    assert np.all(np.diff(vals) >= -2)  # monotone up to dither


def test_blue_noise_tile_properties():
    """Void-and-cluster tile: exact rank uniformity + blue spectrum."""

    from rupphash_tpu.pipeline import hdr

    bn = hdr.blue_noise_tile()
    n = bn.size
    assert len(np.unique(bn)) == n  # every rank exactly once
    assert np.allclose(np.sort(bn.flatten()), (np.arange(n) + 0.5) / n)
    f = np.fft.fftshift(np.abs(np.fft.fft2(bn - bn.mean())) ** 2)
    side = bn.shape[0]
    yy, xx = np.meshgrid(*[np.arange(side) - side // 2] * 2,
                         indexing="ij")
    r = np.hypot(yy, xx)
    low = f[(r > 0) & (r < side / 8)].mean()
    high = f[(r >= side / 4) & (r < side / 2.2)].mean()
    assert high > 3 * low  # energy concentrated at high frequency


def test_dither_preserves_mean_and_kills_banding():

    from rupphash_tpu.pipeline import hdr

    lin = np.full((64, 64, 3), 0.2)
    out = hdr.encode_srgb_u8_dithered(lin)
    expect = float(hdr.srgb_oetf(np.array(0.2))) * 255
    assert abs(out.mean() - expect) < 0.5
    # dithering must break up banding: within a span the plain
    # rounding maps to ONE level, the dithered output must mix levels
    # (>=2 unique) was vacuous — a slow ramp already crosses 3-4 steps
    ramp = np.linspace(0.195, 0.205, 4096)[:, None, None] * np.ones(
        (1, 8, 3))
    q = hdr.encode_srgb_u8_dithered(ramp)
    plain = np.rint(hdr.srgb_oetf(ramp) * 255).astype(np.uint8)
    flat_span = plain[:, 0, 0] == plain[2048, 0, 0]  # one plain level
    assert len(np.unique(q[flat_span])) >= 2, \
        "dither produced no level mixing inside a flat span"
    # noise is shared across channels: gray stays gray
    assert np.array_equal(q[..., 0], q[..., 1])
