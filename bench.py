#!/usr/bin/env python
"""Headline benchmark: fused PDQ hashing throughput (images/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.md target of 100,000
images/s/chip on TPU v5e (the reference CPU does ~233 images/s/core,
NOTES.txt:42-44).  Secondary numbers (grouping pair throughput, parity)
go to stderr.

Methodology: device-resident input batches (the production scan loop
streams batches asynchronously while the previous batch hashes, so steady
state is kernel-bound), median of repeated timed runs, parity asserted
against the numpy golden before timing.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_pdq(batch=1024, rows=512, cols=288, iters=20):
    import jax

    from rupphash_tpu.ops import pdq_jax, pdq_ref

    # parity gate on the reference fixture (if present)
    try:
        from PIL import Image
        img = np.asarray(Image.open(
            "/root/reference/tests/bench.jpg").convert("RGB"))
        luma = pdq_ref.prepare_luma(img)
        gold, gold_q = pdq_ref.generate_pdq(img)
        out = pdq_jax.pdq_hash_batch(luma[None])
        dist = pdq_ref.hamming_distance(bytes(np.asarray(out["hash"][0])), gold)
        log(f"parity: bench.jpg hamming={dist} quality_ok="
            f"{abs(float(out['quality'][0]) - gold_q) < 1e-6}")
        assert dist == 0, "parity failure vs golden"
    except FileNotFoundError:
        log("parity: fixture unavailable, skipped")

    rng = np.random.default_rng(0)
    lumas = rng.integers(0, 256, (batch, rows, cols), dtype=np.uint8)
    fn = pdq_jax._jitted_core(rows, cols)
    dev = jax.device_put(lumas)
    out = fn(dev)
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(dev)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(times))
    return batch / dt


def bench_grouping(n=100_000, iters=3):
    """Secondary: all-pairs count-phase sweep over n random 256-bit hashes
    with 8 dihedral variants each (the production configuration).  One
    device dispatch per sweep (see ops/hamming.py)."""
    import jax

    from rupphash_tpu.ops import hamming

    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    variants = np.repeat(base[:, None, :], 8, axis=1)
    low = np.zeros(n, dtype=bool)

    ta, tb = hamming.QUERY_TILE, hamming.BASE_TILE
    npad = -(-n // ta) * ta
    npad = -(-npad // tb) * tb
    var_p = np.zeros((npad, 8, 32), dtype=np.uint8)
    var_p[:n] = variants
    base_p = np.zeros((npad, 32), dtype=np.uint8)
    base_p[:n] = base
    low_p = np.ones(npad, dtype=bool)
    low_p[:n] = low
    var_d = jax.device_put(var_p)
    base_d = jax.device_put(base_p)
    low_d = jax.device_put(low_p)

    def sweep():
        return np.asarray(hamming._scan_counts_all(
            var_d, base_d, low_d, 31, n, ta, tb, 256))

    sweep()
    t0 = time.perf_counter()
    for _ in range(iters):
        sweep()
    dt = (time.perf_counter() - t0) / iters
    pairs = n * (n - 1) // 2 * 8
    return pairs / dt, dt


def main():
    import jax
    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    ips = bench_pdq()
    log(f"pdq_hash: {ips:,.0f} images/s/chip")

    try:
        pps, gdt = bench_grouping()
        log(f"grouping count-sweep: {pps/1e9:.1f} Gpairs/s "
            f"(100k x 100k x 8 variants in {gdt:.2f}s)")
    except Exception as e:  # secondary metric must not break the headline
        log(f"grouping bench failed: {e}")

    print(json.dumps({
        "metric": "pdq_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/s/chip",
        "vs_baseline": round(ips / 100_000.0, 3),
    }))


if __name__ == "__main__":
    main()
