"""Fused single-kernel PDQ (interpret mode): must equal the XLA path."""
import numpy as np
import pytest

from rupphash_tpu.ops import pdq_jax, pdq_pallas, pdq_ref


def test_fused_kernel_matches_xla_path():
    rng = np.random.default_rng(0)
    lumas = rng.integers(0, 256, (8, 128, 96), dtype=np.uint8)
    fused = pdq_pallas.pdq_hash_batch_fused(lumas, interpret=True)
    xla = pdq_jax.pdq_hash_batch(lumas)
    for k in range(8):
        assert np.array_equal(np.asarray(fused["dihedral"][k]),
                              np.asarray(xla["dihedral"][k]))
        assert abs(float(fused["quality"][k])
                   - float(xla["quality"][k])) < 1e-6
        assert np.allclose(np.asarray(fused["coeffs"][k]),
                           np.asarray(xla["coeffs"][k]),
                           rtol=1e-4, atol=0.5)


def test_fused_kernel_batch_padding():
    rng = np.random.default_rng(1)
    lumas = rng.integers(0, 256, (3, 64, 64), dtype=np.uint8)  # pads to 8
    out = pdq_pallas.pdq_hash_batch_fused(lumas, interpret=True)
    assert out["hash"].shape == (3, 32)
    single = pdq_jax.pdq_hash_batch(lumas)
    assert np.array_equal(np.asarray(out["hash"]),
                          np.asarray(single["hash"]))


def test_rank_median_equals_sort_median():
    """The kernel's rank-counting lower median must equal the golden's
    sorted [127] selection on adversarial data (duplicated values)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(5, 256)).astype(np.float32)
    vals[1, :128] = vals[1, 0]          # heavy duplication
    vals[2] = np.sort(vals[2])          # sorted input
    vals[3] = 7.0                       # constant
    med = np.asarray(pdq_pallas._median_lower(jnp.asarray(vals)))[:, 0]
    for m in range(5):
        expect = np.sort(vals[m], kind="stable")[127]
        assert med[m] == expect, m


def test_hybrid_matches_xla_path():
    """Pallas front half + XLA epilogue (the real-TPU-validated fused
    path) must equal the XLA path bit-for-bit."""
    rng = np.random.default_rng(3)
    lumas = rng.integers(0, 256, (8, 128, 96), dtype=np.uint8)
    hyb = pdq_pallas.pdq_hash_batch_hybrid(lumas, interpret=True)
    xla = pdq_jax.pdq_hash_batch(lumas)
    assert np.array_equal(np.asarray(hyb["dihedral"]),
                          np.asarray(xla["dihedral"]))
    assert np.allclose(np.asarray(hyb["quality"]),
                       np.asarray(xla["quality"]), atol=1e-6)


def test_hybrid_batch_padding():
    rng = np.random.default_rng(4)
    lumas = rng.integers(0, 256, (5, 64, 64), dtype=np.uint8)
    out = pdq_pallas.pdq_hash_batch_hybrid(lumas, interpret=True)
    assert out["hash"].shape == (5, 32)
    xla = pdq_jax.pdq_hash_batch(lumas)
    assert np.array_equal(np.asarray(out["hash"]),
                          np.asarray(xla["hash"]))
