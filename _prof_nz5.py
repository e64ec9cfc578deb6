"""Full 1M-scale setup, then nonzero on kernel output vs synthetic mask
in the SAME process."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from rupphash_tpu.ops import hamming, hamming_pallas

n, k = 1_000_000, 2000
rng = np.random.default_rng(3)
base = rng.integers(0, 256, (n, 32), dtype=np.uint8)
pos = rng.permutation(n)[:3 * k]
for c in range(k):
    base[pos[3 * c + 1]] = base[pos[3 * c]]
    base[pos[3 * c + 2]] = base[pos[3 * c]]
variants = np.repeat(base[:, None, :], 8, axis=1)
low = np.zeros(n, dtype=bool)
var_dev = jax.device_put(variants)
var_d, low_d, _, npad = hamming_pallas.prepare_inputs_resident(var_dev, low)
counts_d = hamming_pallas.scan_row_counts(
    var_d, low_d, ta=hamming_pallas.QUERY_TILE,
    tb=hamming_pallas.BASE_TILE, nbits=256, sim=31, n_total=n)
hot_idx, hot_cnt = (np.asarray(a) for a in hamming._nonzero_rows(
    counts_d[:, 0], n, 4096))
hot = hot_idx[hot_idx >= 0].astype(np.int64)
rows = hot[:1024]
ridx = np.full((1024,), n - 1, dtype=np.int32); ridx[:len(rows)] = rows
qidx = np.full((1024, 1), n, dtype=np.int32); qidx[:len(rows), 0] = rows
qlow = np.ones((1024, 1), dtype=np.int32); qlow[:len(rows), 0] = 0
q_d = jnp.take(var_d, jax.device_put(ridx), axis=1)
packed = hamming_pallas.extract_rows_packed(
    q_d, var_d[0], jax.device_put(qlow), low_d, jax.device_put(qidx),
    tb=hamming_pallas.BASE_TILE, nbits=256, sim=31, n_total=n)
jax.block_until_ready(packed)
nzb = int(jnp.count_nonzero(packed))
print(f"packed nonzero bytes: {nzb}", flush=True)


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


t("nonzero on kernel output", lambda: hamming._nonzero_bytes(packed, 4096))

mask = np.zeros(packed.shape, dtype=np.uint8)
rr = np.random.default_rng(0).integers(0, packed.shape[0], 1500)
cc = np.random.default_rng(1).integers(0, packed.shape[1], 1500)
mask[rr, cc] = 7
mask_d = jax.device_put(mask)
jax.block_until_ready(mask_d)
t("nonzero on synthetic same-shape", lambda: hamming._nonzero_bytes(mask_d, 4096))
print("shapes:", packed.shape, mask_d.shape, packed.dtype, mask_d.dtype)
