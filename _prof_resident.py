"""One-off: stage profile of find_edges_fast_resident at 1M scale."""
import time
import numpy as np

from rupphash_tpu.ops import hamming, hamming_pallas
from rupphash_tpu import native
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

# warm
hamming.find_edges_fast_resident(var_dev, low, similarity=31)

# now instrument the internals manually (mirror _edges_from_device)
for run in range(2):
    t0 = time.perf_counter()
    var_d, low_d, _, npad = hamming_pallas.prepare_inputs_resident(var_dev, low)
    jax.block_until_ready(var_d)
    t1 = time.perf_counter()
    counts_d = hamming_pallas.scan_row_counts(
        var_d, low_d, ta=hamming_pallas.QUERY_TILE,
        tb=hamming_pallas.BASE_TILE, nbits=256, sim=31, n_total=n)
    jax.block_until_ready(counts_d)
    t2 = time.perf_counter()
    n_hot = int(jnp.count_nonzero(counts_d[:n, 0]))
    t3 = time.perf_counter()
    ei, ej = hamming.find_edges_fast_resident(var_dev, low, similarity=31)
    t4 = time.perf_counter()
    native.union_find_roots(n, ei, ej)
    t5 = time.perf_counter()
    print(f"run{run}: prepare={t1-t0:.2f}s sweep={t2-t1:.2f}s "
          f"hotcount={t3-t2:.2f}s full_resident={t4-t3:.2f}s "
          f"uf={t5-t4:.2f}s n_hot={n_hot} edges={len(ei)}")
