"""Pin down: function or data? Time both implementations on both arrays
in one process."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from rupphash_tpu.ops import hamming


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


@functools.partial(jax.jit, static_argnames=("kpad",))
def flat_nonzero(packed, kpad):
    flat = packed.reshape(-1)
    (idx,) = jnp.nonzero(flat != 0, size=kpad, fill_value=-1)
    vals = jnp.where(idx >= 0, flat[jnp.maximum(idx, 0)], 0)
    return idx, vals


mpad, stride = 1024, 125056
rng = np.random.default_rng(0)
mask = np.zeros((mpad, stride), dtype=np.uint8)
rr = rng.integers(0, mpad, 1500)
cc = rng.integers(0, stride, 1500)
mask[rr, cc] = rng.integers(1, 256, 1500).astype(np.uint8)
mask_d = jax.device_put(mask)
jax.block_until_ready(mask_d)

t("inline flat_nonzero kpad=4096", lambda: flat_nonzero(mask_d, 4096))
t("hamming._nonzero_bytes kpad=4096",
  lambda: hamming._nonzero_bytes(mask_d, 4096))
# prof_extract used kpad from the code path: max(4096, ...) -> 4096.
# but _prof_nz passed kpad=4096 too.  Try a couple of kpads:
t("inline flat_nonzero kpad=8192", lambda: flat_nonzero(mask_d, 8192))
t("hamming._nonzero_bytes kpad=8192",
  lambda: hamming._nonzero_bytes(mask_d, 8192))
print("x64:", jax.config.read("jax_enable_x64"))
