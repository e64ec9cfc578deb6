"""Independent PDQ ground truth (VERDICT r2 missing #3 / weak #6).

tests/pdq_spec_oracle.py is a second PDQ implementation derived from
the published algorithm definition (float64, direct per-pixel box
means, direct O(n^2) cosine-sum DCT, sort-based lower median) —
deliberately not sharing code or structure with ops/pdq_ref.py, whose
locked goldens were previously the only derivation of the Rust
semantics.  Agreement protocol per the reference's own
cross-implementation standard (/root/reference/NOTES.txt:63-91):
exact, or a small bounded delta with a written explanation.

Measured: EXACT (0-bit) agreement on every real fixture and every
tested size with both dims >= 64 (the no-upsampling regime).  Images
with a side < 64 are excluded by design: decimation then *repeats*
source pixels, the DCT coefficient field becomes tie-degenerate
(|coeff - median| at the 1e-15 level, verified), and f32-vs-f64
tie-breaking flips those bits — the same class of delta the reference
accepts from py-imagehash on resampled variants.
"""
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent))
from pdq_spec_oracle import spec_pdq_from_luma  # noqa: E402

from rupphash_tpu.ops import pdq_ref  # noqa: E402

REF_FIXTURES = Path("/root/reference/tests")


def _agree(img: np.ndarray, max_bits: int = 0):
    luma = pdq_ref.prepare_luma(img)
    gold, gold_q = pdq_ref.generate_pdq(img)
    spec, spec_q = spec_pdq_from_luma(luma)
    d = pdq_ref.hamming_distance(gold, spec)
    assert d <= max_bits, f"spec oracle disagrees by {d} bits"
    assert abs(gold_q - spec_q) < 1e-3
    return d


@pytest.mark.parametrize("name", [
    "bench.jpg",
    "Kaanapali_beach_sunrise_on_Maui_Hawaii.720p.jpg",
    "Prophecy_Has_Been_Fulfilled_1.jpg",
    "Prophecy_Has_Been_Fulfilled_2.jpg",
])
def test_spec_oracle_matches_golden_on_reference_fixtures(name):
    p = REF_FIXTURES / name
    if not p.is_file():
        pytest.skip("reference fixtures unavailable")
    img = np.asarray(Image.open(p).convert("RGB"))
    assert _agree(img) == 0


@pytest.mark.parametrize("size", [
    (64, 64), (100, 77), (512, 288), (37 * 8, 512), (333, 222),
    (65, 63), (130, 70), (512, 512), (97, 401), (64, 512),
    (1280, 720),
])
def test_spec_oracle_matches_golden_synthetic(size):
    rng = np.random.default_rng(size[0] * 1000 + size[1])
    px = rng.integers(0, 256,
                      (max(size[1] // 4, 4), max(size[0] // 4, 4), 3),
                      dtype=np.uint8)
    img = np.asarray(Image.fromarray(px).resize(size, Image.BILINEAR))
    assert _agree(img) == 0


def test_spec_oracle_tie_degeneracy_is_characterized():
    """The excluded sub-64 regime: disagreements must be exact median
    ties (|coeff - median| ~ 1e-15), not semantic differences."""
    import pdq_spec_oracle as so

    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(px).resize((16, 16),
                                                Image.BILINEAR))
    luma = pdq_ref.prepare_luma(img)
    gold, _ = pdq_ref.generate_pdq(img)
    spec, _ = spec_pdq_from_luma(luma)
    d = pdq_ref.hamming_distance(gold, spec)
    if d == 0:
        return  # ties happened to break the same way — fine
    c = so._dct_16x16(so._decimate(so._jarosz(
        np.asarray(luma, np.float64))))
    med = np.sort(c.reshape(-1))[(c.size - 1) // 2]
    near = np.sort(np.abs(c.reshape(-1) - med))
    # at least d coefficients sit within float noise of the median
    assert near[d - 1] < 1e-9, \
        "sub-64 disagreement is not explained by median ties"
