"""Oklab palette/histogram analysis tests."""
import numpy as np
import pytest

from rupphash_tpu.pipeline import palette


def test_oklab_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    lab = palette.rgb_to_oklab(rgb)
    back = palette.oklab_to_rgb_u8(lab)
    assert np.all(np.abs(back.astype(int) - rgb.astype(int)) <= 1)


def test_oklab_landmarks():
    # white -> L ~ 1, near-zero chroma; black -> L ~ 0
    lab = palette.rgb_to_oklab(np.array([[255, 255, 255], [0, 0, 0]],
                                        dtype=np.uint8))
    assert lab[0, 0] == pytest.approx(1.0, abs=1e-3)
    assert abs(lab[0, 1]) < 1e-3 and abs(lab[0, 2]) < 1e-3
    assert lab[1, 0] == pytest.approx(0.0, abs=1e-3)


def test_low_color_shortcut():
    img = np.zeros((40, 40, 3), dtype=np.uint8)
    img[:20] = [255, 0, 0]
    img[20:] = [0, 0, 255]
    pal = palette.kmeans_palette(img)
    assert len(pal) == 2
    assert {tuple(c) for c in pal} == {(255, 0, 0), (0, 0, 255)}


def test_palette_finds_dominant_colors():
    rng = np.random.default_rng(1)
    img = np.zeros((120, 120, 3), dtype=np.uint8)
    img[:, :60] = [200, 40, 40]
    img[:, 60:] = [40, 60, 200]
    img = np.clip(img.astype(int)
                  + rng.integers(-12, 12, img.shape), 0, 255).astype(np.uint8)
    pal = palette.kmeans_palette(
        img, palette.PaletteConfig(dominant_colors=4))
    # both dominant hues present within tolerance
    def close(c, target):
        return np.abs(np.asarray(c, int) - target).max() < 40
    assert any(close(c, [200, 40, 40]) for c in pal)
    assert any(close(c, [40, 60, 200]) for c in pal)


def test_dark_floor_culling():
    img = np.zeros((80, 80, 3), dtype=np.uint8)
    img[:40] = [3, 3, 3]       # near black
    img[40:60] = [220, 180, 40]
    img[60:] = [10, 160, 90]
    # add noise so the low-color shortcut doesn't trigger
    rng = np.random.default_rng(2)
    img = np.clip(img.astype(int)
                  + rng.integers(-6, 6, img.shape), 0, 255).astype(np.uint8)
    pal = palette.kmeans_palette(
        img, palette.PaletteConfig(dominant_colors=4))
    assert all(np.asarray(c, int).sum() > 24 for c in pal)


def test_histograms():
    img = np.full((64, 64, 3), 128, dtype=np.uint8)
    hl, ha, hb = palette.oklab_histograms(img)
    assert hl.sum() == 64 * 64
    assert hl.argmax() > 100  # mid grey -> mid L bin
    assert abs(int(ha.argmax()) - 128) <= 2  # neutral a
    lh = palette.luma_histogram(img)
    assert lh[128] == 64 * 64
