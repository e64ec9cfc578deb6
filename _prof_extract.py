"""One-off: per-op profile of the extraction tail at 1M scale."""
import time
import numpy as np

from rupphash_tpu.ops import hamming, hamming_pallas
import jax
import jax.numpy as jnp

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
jax.block_until_ready(var_dev)

var_d, low_d, _, npad = hamming_pallas.prepare_inputs_resident(var_dev, low)
jax.block_until_ready(var_d)
counts_d = hamming_pallas.scan_row_counts(
    var_d, low_d, ta=hamming_pallas.QUERY_TILE,
    tb=hamming_pallas.BASE_TILE, nbits=256, sim=31, n_total=n)
n_hot = int(jnp.count_nonzero(counts_d[:n, 0]))
hpad = max(1024, 1 << (n_hot - 1).bit_length())
hot_idx, hot_cnt = (np.asarray(a) for a in hamming._nonzero_rows(
    counts_d[:, 0], n, hpad))
sel = hot_idx >= 0
hot = hot_idx[sel].astype(np.int64)
counts = np.zeros(n, dtype=np.int64)
counts[hot] = hot_cnt[sel]
print(f"n_hot={n_hot} npad={npad}")

row_chunk = 1024
rows = hot[:row_chunk]
mpad = 1024
ridx = np.full((mpad,), n - 1, dtype=np.int32)
qidx = np.full((mpad, 1), n, dtype=np.int32)
qlow = np.ones((mpad, 1), dtype=np.int32)
m = len(rows)
ridx[:m] = rows
qidx[:m, 0] = rows
qlow[:m, 0] = low[rows].astype(np.int32)
ridx_d = jax.device_put(ridx)
qidx_d = jax.device_put(qidx)
qlow_d = jax.device_put(qlow)

def t(label, fn, reps=3):
    out = fn(); jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms (runs {[round(x*1000,1) for x in ts]})")
    return out

q_d = t("take", lambda: jnp.take(var_d, ridx_d, axis=1))
packed = t("extract_rows_packed", lambda: hamming_pallas.extract_rows_packed(
    q_d, var_d[0], qlow_d, low_d, qidx_d,
    tb=hamming_pallas.BASE_TILE, nbits=256, sim=31, n_total=n))
kpad = 4096
t("nonzero_bytes", lambda: hamming._nonzero_bytes(packed, kpad))
t("var_d[0]", lambda: var_d[0])
# fused: take+extract+nonzero in sequence as the loop does
def chain():
    q = jnp.take(var_d, ridx_d, axis=1)
    p = hamming_pallas.extract_rows_packed(
        q, var_d[0], qlow_d, low_d, qidx_d,
        tb=hamming_pallas.BASE_TILE, nbits=256, sim=31, n_total=n)
    return hamming._nonzero_bytes(p, kpad)
t("chain", chain)
