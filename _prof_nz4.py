"""Does live-buffer pressure or prior pallas execution make the nonzero
slow?  Stages: time nonzero fresh -> allocate 2GB -> time -> run the
pallas sweep -> time again."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from rupphash_tpu.ops import hamming, hamming_pallas


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


mpad, stride = 1024, 125056
rng = np.random.default_rng(0)
mask = np.zeros((mpad, stride), dtype=np.uint8)
rr = rng.integers(0, mpad, 1500)
cc = rng.integers(0, stride, 1500)
mask[rr, cc] = rng.integers(1, 256, 1500).astype(np.uint8)
mask_d = jax.device_put(mask)
jax.block_until_ready(mask_d)

t("fresh", lambda: hamming._nonzero_bytes(mask_d, 4096))

big = jax.device_put(np.zeros((8, 1000448, 256), dtype=np.int8))
jax.block_until_ready(big)
t("with 2GB live", lambda: hamming._nonzero_bytes(mask_d, 4096))

n = 100_000
npad = -(-n // 1024) * 1024
@jax.jit
def make_vars(key):
    bits = jax.random.bernoulli(key, 0.5, (8, npad, 256))
    return (bits.astype(jnp.int8) << 1) - 1
buf = make_vars(jax.random.PRNGKey(2))
low_d = jax.device_put(np.zeros((npad, 1), dtype=np.int32))
c = hamming_pallas.scan_row_counts(buf, low_d, nbits=256, sim=31,
                                   n_total=n)
jax.block_until_ready(c)
t("after pallas sweep", lambda: hamming._nonzero_bytes(mask_d, 4096))

ex = hamming_pallas.extract_rows_packed(
    buf[:, :1024], big[0][:npad] if False else buf[0],
    jax.device_put(np.zeros((1024, 1), np.int32)), low_d,
    jax.device_put(np.arange(1024, dtype=np.int32)[:, None]),
    tb=hamming_pallas.BASE_TILE, nbits=256, sim=31, n_total=n)
jax.block_until_ready(ex)
t("after extract kernel", lambda: hamming._nonzero_bytes(mask_d, 4096))
print("extract out shape", ex.shape)
t("nonzero on extract out (12MB)", lambda: hamming._nonzero_bytes(ex, 4096))
