"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must run before any jax import (pytest imports conftest first).
Real-TPU benchmarking happens in bench.py, not under pytest.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may pin a TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# The container's sitecustomize may have imported jax already (to register a
# TPU plugin), in which case the env vars above arrived too late — override
# the platform programmatically before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_TESTS = pathlib.Path("/root/reference/tests")


@pytest.fixture(scope="session")
def bench_jpg():
    """The reference benchmark fixture (CC0 Lapland photo), decoded to RGB."""
    path = REFERENCE_TESTS / "bench.jpg"
    if not path.exists():
        pytest.skip("reference fixture bench.jpg not available")
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


@pytest.fixture(scope="session")
def near_dupe_pair():
    paths = [REFERENCE_TESTS / "Prophecy_Has_Been_Fulfilled_1.jpg",
             REFERENCE_TESTS / "Prophecy_Has_Been_Fulfilled_2.jpg"]
    if not all(p.exists() for p in paths):
        pytest.skip("reference near-duplicate fixtures not available")
    from PIL import Image
    out = []
    for p in paths:
        with Image.open(p) as im:
            out.append(np.asarray(im.convert("RGB")))
    return out


def lcg_stream(seed: int):
    """The reference tests' LCG (pdqhash.rs:537-545): deterministic fixture
    data shared between the Rust and this test-suite's oracles."""
    state = seed & 0xFFFFFFFF
    while True:
        state = (state * 1_664_525 + 1_013_904_223) & 0xFFFFFFFF
        yield state


def lcg_coefficients(seed: int) -> np.ndarray:
    g = lcg_stream(seed)
    vals = np.empty(256, dtype=np.float32)
    for i in range(256):
        vals[i] = np.float32((next(g) >> 8) / 65536.0 - 128.0)
    return vals


def lcg_buffer64(seed: int) -> np.ndarray:
    g = lcg_stream(seed)
    buf = np.empty((64, 64), dtype=np.float32)
    for i in range(64):
        for j in range(64):
            buf[i, j] = np.float32((next(g) >> 16) & 0xFF)
    return buf
