"""Compile-time memory pressure hypothesis: allocate ~2.4GB BEFORE the
first _nonzero_bytes compile, then time it; then free and retime the
SAME executable."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from rupphash_tpu.ops import hamming

big = jax.device_put(np.zeros((8, 1000448, 256), dtype=np.int8))
big2 = jax.device_put(np.zeros((1000000, 8, 32), dtype=np.uint8))
jax.block_until_ready(big2)

mpad, stride = 1024, 125056
rng = np.random.default_rng(0)
mask = np.zeros((mpad, stride), dtype=np.uint8)
rr = rng.integers(0, mpad, 1500)
cc = rng.integers(0, stride, 1500)
mask[rr, cc] = 7
mask_d = jax.device_put(mask)
jax.block_until_ready(mask_d)


def t(label, fn, reps=3):
    out = fn(); jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms "
          f"(runs {[round(x*1000,1) for x in ts]})", flush=True)
    return out


t("nonzero compiled under 2.3GB live", lambda: hamming._nonzero_bytes(mask_d, 4096))
del big, big2
t("same executable after freeing", lambda: hamming._nonzero_bytes(mask_d, 4096))
