"""Classic pHash tests: bit-op exactness, rotation invariance, JAX parity."""
import numpy as np
import pytest

from rupphash_tpu.ops import phash_jax, phash_ref


def _random_hash(seed):
    return int(np.random.default_rng(seed).integers(0, 2**63, dtype=np.int64)) * 2 + (seed & 1)


@pytest.mark.parametrize("seed", [0, 1, 7, 12345])
def test_rotations_compose_to_identity(seed):
    h = _random_hash(seed)
    assert phash_ref.rotate_hash_180(phash_ref.rotate_hash_180(h)) == h
    assert phash_ref.flip_hash_horizontal(phash_ref.flip_hash_horizontal(h)) == h
    r = h
    for _ in range(4):
        r = phash_ref.rotate_hash_90(r)
    assert r == h
    assert phash_ref.rotate_hash_270(phash_ref.rotate_hash_90(h)) == h


def test_rotation_invariant_hash_is_invariant():
    h = _random_hash(3)
    inv = phash_ref.rotation_invariant_hash(h)
    for r in [phash_ref.rotate_hash_90(h), phash_ref.rotate_hash_180(h),
              phash_ref.rotate_hash_270(h)]:
        assert phash_ref.rotation_invariant_hash(r) == inv


def test_dihedral_set_order_and_size():
    h = _random_hash(9)
    d = phash_ref.dihedral_hashes(h)
    assert len(d) == 8
    assert d[0] == h
    assert d[1] == phash_ref.rotate_hash_90(h)
    assert d[4] == phash_ref.flip_hash_horizontal(h)


def test_phash_bits_match_dct_sign_structure():
    """Rot-180 of the *image* flips the sign of DCT coefficients with odd
    (x+y) frequency; the packed bit op must track the real DCT transform
    on a synthetic 32x32 buffer, exactly (no resampling involved)."""
    rng = np.random.default_rng(5)
    buf = rng.integers(0, 256, (32, 32)).astype(np.float32)
    h = phash_ref.phash_from_luma32(buf)
    h180_bits = phash_ref.phash_from_luma32(buf[::-1, ::-1])
    # DC-excluded median is *not* invariant under sign flips, so allow the
    # small band of bits whose coefficient sits between the two medians.
    assert phash_ref.hamming64(phash_ref.rotate_hash_180(h), h180_bits) <= 6


def test_golden_phash_on_bench(bench_jpg):
    h = phash_ref.hash_image(bench_jpg)
    assert h != 0 and h != (1 << 64) - 1
    # deterministic
    assert phash_ref.hash_image(bench_jpg) == h


def test_golden_vs_imagehash_style(bench_jpg):
    """Cross-implementation check in the spirit of py-imagehash.py: an
    independent numpy pHash (PIL Lanczos resize, luma first, scipy-style
    orthogonal DCT, median *including* DC) must land within a few bits."""
    from PIL import Image
    import scipy.fftpack

    im = Image.fromarray(bench_jpg).convert("L").resize((32, 32), Image.LANCZOS)
    pixels = np.asarray(im, dtype=np.float64)
    dct = scipy.fftpack.dct(scipy.fftpack.dct(pixels, axis=0), axis=1)
    low = dct[:8, :8]
    med = np.median(low)
    bits = (low > med).reshape(-1)
    other = 0
    for i, b in enumerate(bits):
        if b:
            other |= 1 << (63 - i)
    ours = phash_ref.hash_image(bench_jpg)
    assert phash_ref.hamming64(ours, other) <= 8


def test_jax_phash_parity(bench_jpg):
    """Batch path starts from the working luma plane; must stay within the
    resampling-noise band of the golden."""
    from rupphash_tpu.ops import pdq_ref
    luma = pdq_ref.prepare_luma(bench_jpg)
    out = phash_jax.phash_batch(luma[None])
    h_fast = phash_jax.u64_from_bytes(np.asarray(out["hash"][0]))
    h_gold = phash_ref.hash_image(bench_jpg)
    assert phash_ref.hamming64(h_fast, h_gold) <= 8


def test_jax_dihedral_matches_bit_ops(bench_jpg):
    from rupphash_tpu.ops import pdq_ref
    luma = pdq_ref.prepare_luma(bench_jpg)
    out = phash_jax.phash_batch(luma[None])
    packed = np.asarray(out["dihedral"][0])
    base = phash_jax.u64_from_bytes(packed[0])
    expected = phash_ref.dihedral_hashes(base)
    for v in range(8):
        assert phash_jax.u64_from_bytes(packed[v]) == expected[v]


def test_jax_phash_batch_consistency():
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 256, (4, 96, 128), dtype=np.uint8)
    out = phash_jax.phash_batch(batch)
    for i in range(4):
        single = phash_jax.phash_batch(batch[i][None])
        assert bytes(np.asarray(out["hash"][i])) == bytes(np.asarray(single["hash"][0]))


def test_dct_matches_scipy_independent_oracle():
    """Cross-implementation check (the reference validates its pHash
    against py-imagehash's scipy DCT, NOTES.txt:61-91; imagehash is not
    in this image, so scipy.fft — the same engine it uses — serves as
    the independent oracle).  rustdct semantics = unnormalized DCT-II,
    which is scipy's type-2 with norm=None halved on the DC-free
    definition: scipy dct type 2: y[k] = 2 * sum x[j] cos(pi k (2j+1) /
    (2n)); ours omits the factor 2."""
    import numpy as np
    import scipy.fft

    from rupphash_tpu.ops import phash_ref

    rng = np.random.default_rng(0)
    x = rng.normal(size=(32,)).astype(np.float64)
    ours = phash_ref.dct2_matrix(32).astype(np.float64) @ x
    theirs = scipy.fft.dct(x, type=2, norm=None) / 2.0
    assert np.allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    # full 2-D pipeline: hash from a scipy-DCT implementation must
    # equal ours bit-for-bit
    luma = rng.integers(0, 256, (32, 32)).astype(np.float32)
    ours_hash = phash_ref.phash_from_luma32(luma)

    d = scipy.fft.dct(scipy.fft.dct(
        luma.astype(np.float64), axis=0, type=2),
        axis=1, type=2) / 4.0
    low = d[:8, :8].flatten()
    med = np.median(np.sort(low[1:]))  # DC excluded (phash.rs:67-71)
    bits = 0
    for i, v in enumerate(low):
        if v > med:
            bits |= 1 << (63 - i)
    assert bits == ours_hash
