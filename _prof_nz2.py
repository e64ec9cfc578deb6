"""Isolate: why is _nonzero_bytes slow on the Pallas kernel's output but
fast on a device_put array of identical shape/dtype?"""
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
print("packed:", packed.shape, packed.dtype)
try:
    print("layout:", packed.format)
except Exception:
    pass

def t(label, fn, reps=3):
    out = fn(); jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms "
          f"(runs {[round(x*1000,1) for x in ts]})")
    return out

t("nonzero on kernel output", lambda: hamming._nonzero_bytes(packed, 4096))
rt = jax.device_put(np.asarray(packed))
jax.block_until_ready(rt)
t("nonzero on host-roundtripped copy",
  lambda: hamming._nonzero_bytes(rt, 4096))
copied = jnp.copy(packed)
jax.block_until_ready(copied)
t("nonzero on jnp.copy of kernel output",
  lambda: hamming._nonzero_bytes(copied, 4096))
# int32 view path: reinterpret 4 bytes as one int32 (stride%4==0), then
# nonzero over 1/4 the elements
import functools
@functools.partial(jax.jit, static_argnames=("kpad",))
def nz_i32(packed, kpad):
    m, s = packed.shape
    flat32 = jax.lax.bitcast_convert_type(
        packed.reshape(m * s // 4, 4), jnp.int32).reshape(-1)
    (w,) = jnp.nonzero(flat32 != 0, size=kpad, fill_value=-1)
    flat = packed.reshape(-1)
    base_ = jnp.maximum(w, 0) * 4
    cand = jnp.stack([base_ + i for i in range(4)], 1).reshape(-1)
    v = flat[cand]
    keep = (v != 0) & (jnp.repeat(w, 4) >= 0)
    (sel,) = jnp.nonzero(keep, size=kpad, fill_value=-1)
    idx = jnp.where(sel >= 0, cand[jnp.maximum(sel, 0)], -1)
    vals = jnp.where(sel >= 0, v[jnp.maximum(sel, 0)], 0)
    return idx, vals
print("skip bitcast")
