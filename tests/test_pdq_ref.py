"""Golden PDQ reference tests.

Ports the reference's strongest test patterns (SURVEY.md section 4):
naive-oracle cross-checks, an *independent* physical-transform ground truth
for the dihedral set, quality-metric landmarks, and degenerate dims.
"""
import numpy as np
import pytest

from rupphash_tpu.ops import pdq_ref as ref
from tests.conftest import lcg_buffer64, lcg_coefficients


# --- naive oracles (re-derived from the published PDQ spec; these mirror the
# reference's own in-repo oracles at pdqhash.rs:470-535) ---

def naive_to_hash(coeffs: np.ndarray) -> bytes:
    srt = np.sort(coeffs, kind="stable")
    median = srt[(srt.size - 1) // 2]
    out = bytearray(32)
    for i in range(32):
        byte = 0
        for j in range(8):
            if coeffs[i * 8 + j] > median:
                byte |= 1 << j
        out[31 - i] = byte
    return bytes(out)


def naive_transpose(c):
    return c.reshape(16, 16).T.reshape(-1).copy()


def naive_flip_x(c):
    out = c.reshape(16, 16).copy()
    for col in range(16):
        if (col + 1) % 2 != 0:
            out[:, col] = -out[:, col]
    return out.reshape(-1)


def naive_flip_y(c):
    out = c.reshape(16, 16).copy()
    for row in range(16):
        if (row + 1) % 2 != 0:
            out[row, :] = -out[row, :]
    return out.reshape(-1)


def naive_dihedral(c):
    return [
        naive_to_hash(c),
        naive_to_hash(naive_flip_x(naive_transpose(c))),
        naive_to_hash(naive_flip_y(naive_flip_x(c))),
        naive_to_hash(naive_flip_y(naive_transpose(c))),
        naive_to_hash(naive_flip_x(c)),
        naive_to_hash(naive_flip_y(c)),
        naive_to_hash(naive_transpose(c)),
        naive_to_hash(naive_flip_y(naive_flip_x(naive_transpose(c)))),
    ]


@pytest.mark.parametrize("seed", [1, 42, 0x12345678, 0xDEADBEEF])
def test_fast_dihedral_matches_naive(seed):
    c = lcg_coefficients(seed)
    assert ref.coeffs_to_hash(c) == naive_to_hash(c)
    assert ref.dihedral_hashes(c) == naive_dihedral(c)


def test_dihedral_set_is_the_full_group():
    c = lcg_coefficients(7)
    hashes = ref.dihedral_hashes(c)
    assert len(set(hashes)) == 8


def _physical_transform(buf: np.ndarray, variant: int) -> np.ndarray:
    n = buf.shape[0]
    out = np.empty_like(buf)
    for x in range(n):
        for y in range(n):
            if variant == 0:
                out[x, y] = buf[x, y]
            elif variant == 1:
                out[x, y] = buf[n - 1 - y, x]        # rotate 90 cw
            elif variant == 2:
                out[x, y] = buf[n - 1 - x, n - 1 - y]  # rotate 180
            elif variant == 3:
                out[x, y] = buf[y, n - 1 - x]        # rotate 270 cw
            elif variant == 4:
                out[x, y] = buf[x, n - 1 - y]        # mirror columns
            elif variant == 5:
                out[x, y] = buf[n - 1 - x, y]        # mirror rows
            elif variant == 6:
                out[x, y] = buf[y, x]                # transpose
            else:
                out[x, y] = buf[n - 1 - y, n - 1 - x]  # anti-transpose
    return out


@pytest.mark.parametrize("seed", [1, 42, 0xDEADBEEF])
def test_dihedral_hashes_match_physically_transformed_buffer(seed):
    """Independent ground truth: physically transform the 64x64 buffer and
    re-run the real DCT; every variant must match at distance 0.  This is
    the test that catches frequency-vs-index parity mistakes that the naive
    cross-check shares (see pdqhash.rs:572-628)."""
    buf = lcg_buffer64(seed)
    predicted = ref.dihedral_hashes(ref.dct64_to_16(buf))
    for variant in range(8):
        actual = ref.coeffs_to_hash(ref.dct64_to_16(_physical_transform(buf, variant)))
        dist = ref.hamming_distance(actual, predicted[variant])
        assert dist == 0, f"variant {variant} differs by {dist} bits"


def test_quality_metric_landmarks():
    flat = np.full((64, 64), 128.0, dtype=np.float32)
    assert ref.quality_metric(flat) == 0.0
    buf = np.array([[0.0, 10.0], [0.0, 10.0]], dtype=np.float32)
    assert abs(ref.quality_metric(buf) - 6.0 / 90.0) < 1e-6


def test_target_dimensions_never_collapse_to_zero():
    assert ref.calculate_target_dimensions(4000, 5, 512) == (512, 1)
    assert ref.calculate_target_dimensions(5, 4000, 512) == (1, 512)
    assert ref.calculate_target_dimensions(1024, 1024, 512) == (512, 512)
    assert ref.calculate_target_dimensions(1024, 512, 512) == (512, 256)


def test_min_hashable_dim():
    tiny = np.zeros((4, 100, 3), dtype=np.uint8)
    assert ref.generate_pdq_features(tiny) is None
    ok = np.random.default_rng(0).integers(0, 255, (5, 5, 3), dtype=np.uint8)
    assert ref.generate_pdq_features(ok) is not None


def test_luma601_integer_semantics():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [1, 1, 1]]],
                   dtype=np.uint8)
    lum = ref.to_luma601(rgb)
    assert lum.tolist() == [[(299 * 255 + 500) // 1000,
                             (587 * 255 + 500) // 1000,
                             (114 * 255 + 500) // 1000,
                             (299 + 587 + 114 + 500) // 1000]]


def test_full_pipeline_on_bench_fixture(bench_jpg):
    """End-to-end smoke + self-consistency on the reference fixture image."""
    out = ref.generate_pdq(bench_jpg)
    assert out is not None
    h, quality = out
    assert len(h) == 32
    # bench.jpg is a detailed photo: quality must hit the cap
    assert quality == 1.0
    # identity variant of the dihedral set equals the plain hash
    coeffs, _ = ref.generate_pdq_features(bench_jpg)
    assert ref.dihedral_hashes(coeffs)[0] == h


def test_dihedral_robustness_on_physical_image(bench_jpg):
    """Physically rotate/flip the decoded image, rehash, and require the
    best dihedral match within 22 bits (resampling tolerance), mirroring
    hamminghash.rs:415-481."""
    coeffs, _ = ref.generate_pdq_features(bench_jpg)
    dihedral = ref.dihedral_hashes(coeffs)

    transforms = {
        "original": bench_jpg,
        "rot90": np.rot90(bench_jpg, k=3),   # np.rot90 k=3 == 90 deg cw
        "rot180": np.rot90(bench_jpg, k=2),
        "rot270": np.rot90(bench_jpg, k=1),
        "fliph": bench_jpg[:, ::-1],
        "flipv": bench_jpg[::-1, :],
        "transpose": np.transpose(bench_jpg, (1, 0, 2)),
        "anti-transpose": np.transpose(bench_jpg[::-1, ::-1], (1, 0, 2)),
    }
    for name, img in transforms.items():
        h, _ = ref.generate_pdq(np.ascontiguousarray(img))
        best = min(ref.hamming_distance(h, d) for d in dihedral)
        assert best <= 22, f"{name}: best dihedral distance {best} > 22"


def test_near_duplicate_pair_matches(near_dupe_pair):
    a, b = near_dupe_pair
    ha, _ = ref.generate_pdq(a)
    hb, _ = ref.generate_pdq(b)
    assert ref.hamming_distance(ha, hb) <= 63


def test_dihedral_hashes_batch_bit_exact():
    """The vectorized cached-rescan regen must match the scalar golden
    bit-for-bit, including median ties from duplicated values."""
    rng = np.random.default_rng(12)
    coeffs = rng.standard_normal((40, 256)).astype(np.float32)
    coeffs[20:] = np.round(coeffs[20:] * 4) / 4  # force ties
    batch = ref.dihedral_hashes_batch(coeffs)
    for i in range(40):
        want = ref.dihedral_hashes(coeffs[i])
        assert [bytes(batch[i, v]) for v in range(8)] == want, i
