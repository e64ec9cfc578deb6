"""Bisect the poison: mode=rows | take | none | prep | sweep1m.
Run the candidate op first, then time _nonzero_bytes on a synthetic
(1024, 125056) mask."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from rupphash_tpu.ops import hamming, hamming_pallas

mode = sys.argv[1]

if mode == "rows":
    counts = jax.device_put(np.zeros((1000448,), dtype=np.int32))
    out = hamming._nonzero_rows(counts, 1_000_000, 4096)
    jax.block_until_ready(out)
elif mode == "take":
    big = jax.device_put(np.zeros((8, 1000448, 256), dtype=np.int8))
    ridx = jax.device_put(np.zeros((1024,), dtype=np.int32))
    q = jnp.take(big, ridx, axis=1)
    jax.block_until_ready(q)
elif mode == "prep":
    var_dev = jax.device_put(
        np.zeros((1_000_000, 8, 32), dtype=np.uint8))
    var_d, low_d, _, npad = hamming_pallas.prepare_inputs_resident(
        var_dev, np.zeros(1_000_000, dtype=bool))
    jax.block_until_ready(var_d)
elif mode == "sweep1m":
    big = jax.device_put(np.zeros((8, 1000448, 256), dtype=np.int8))
    low_d = jax.device_put(np.zeros((1000448, 1), dtype=np.int32))
    c = hamming_pallas.scan_row_counts(big, low_d, nbits=256, sim=31,
                                       n_total=1_000_000)
    jax.block_until_ready(c)

mpad, stride = 1024, 125056
mask = np.zeros((mpad, stride), dtype=np.uint8)
mask[5, 77] = 7
mask_d = jax.device_put(mask)
jax.block_until_ready(mask_d)

out = hamming._nonzero_bytes(mask_d, 4096)
jax.block_until_ready(out)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out = hamming._nonzero_bytes(mask_d, 4096)
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
print(f"mode={mode}: nonzero_bytes {min(ts)*1000:.1f} ms "
      f"(runs {[round(x*1000,1) for x in ts]})", flush=True)
