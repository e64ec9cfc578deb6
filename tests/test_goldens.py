"""Stored golden hashes for the reference fixtures.

These lock the exact outputs of the framework's current hash semantics
so any future change that silently drifts the bits fails loudly.  The
values were computed by this framework's golden path (ops/pdq_ref.py /
ops/phash_ref.py) whose stage-by-stage semantics mirror the reference
implementation; the TPU paths are asserted bit-identical to them
elsewhere in the suite.
"""
import numpy as np
import pytest

from rupphash_tpu.ops import pdq_ref, phash_ref

BENCH_PDQ_HEX = ("48e6871951e6e601dc755ec3319d467a"
                 "a8f2973d784e23375e39e3860f1b1863")
BENCH_PHASH_HEX = "98636cb04ef63956"
BENCH_PHASH_ROT_INVARIANT_HEX = "94927668aad24dbd"


def test_bench_pdq_golden(bench_jpg):
    h, quality = pdq_ref.generate_pdq(bench_jpg)
    assert h.hex() == BENCH_PDQ_HEX
    assert quality == 1.0


def test_bench_phash_golden(bench_jpg):
    h = phash_ref.hash_image(bench_jpg)
    assert f"{h:016x}" == BENCH_PHASH_HEX
    inv = phash_ref.rotation_invariant_hash(h)
    assert f"{inv:016x}" == BENCH_PHASH_ROT_INVARIANT_HEX


def test_prophecy_pair_distance_locked(near_dupe_pair):
    """The near-duplicate fixture pair's PDQ distance is a property of
    the full pipeline; lock its band."""
    a, _ = pdq_ref.generate_pdq(near_dupe_pair[0])
    b, _ = pdq_ref.generate_pdq(near_dupe_pair[1])
    d = pdq_ref.hamming_distance(a, b)
    assert 0 < d <= 40, d


def test_bench_dihedral_vs_physical_transforms(bench_jpg):
    """Dihedral robustness on the real photo (hamminghash.rs:415-481):
    physically rotate/flip the bench fixture, hash the transformed
    pixels, and assert the best coefficient-domain dihedral variant of
    the upright hash is within the reference's resampling tolerance
    (<= 22 bits; NOTES.txt:30-38 observed 0-20)."""
    coeffs, _ = pdq_ref.generate_pdq_features(bench_jpg)
    variants = pdq_ref.dihedral_hashes(coeffs)

    transforms = [
        np.rot90(bench_jpg, 1), np.rot90(bench_jpg, 2),
        np.rot90(bench_jpg, 3), bench_jpg[:, ::-1], bench_jpg[::-1],
        np.swapaxes(bench_jpg, 0, 1),
    ]
    for t in transforms:
        h, _ = pdq_ref.generate_pdq(np.ascontiguousarray(t))
        best = min(pdq_ref.hamming_distance(h, v) for v in variants)
        assert best <= 22, f"dihedral match {best} bits"
