"""One-off: A/B hierarchical nonzero vs flat jnp.nonzero at 128MB scale,
and dot_general-vs-transpose in the rowcount kernel."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp


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


# ---- part 1: nonzero strategies over a (1024, 125056) u8 mask ----
mpad, stride = 1024, 125056
rng = np.random.default_rng(0)
mask = np.zeros((mpad, stride), dtype=np.uint8)
# ~1500 scattered nonzero bytes (edge-like density)
rr = rng.integers(0, mpad, 1500)
cc = rng.integers(0, stride, 1500)
mask[rr, cc] = rng.integers(1, 256, 1500).astype(np.uint8)
mask_d = jax.device_put(mask)
jax.block_until_ready(mask_d)
kpad = 4096


@functools.partial(jax.jit, static_argnames=("kpad",))
def flat_nonzero(packed, kpad):
    flat = packed.reshape(-1)
    (idx,) = jnp.nonzero(flat != 0, size=kpad, fill_value=-1)
    vals = jnp.where(idx >= 0, flat[jnp.maximum(idx, 0)], 0)
    return idx, vals


@functools.partial(jax.jit, static_argnames=("kpad", "blk"))
def hier_nonzero(packed, kpad, blk=1024):
    flat = packed.reshape(-1)
    n = flat.shape[0]
    nb = n // blk
    blocks = flat[:nb * blk].reshape(nb, blk)
    hot = jnp.max(blocks, axis=1) != 0
    kb = min(kpad, nb)
    (bidx,) = jnp.nonzero(hot, size=kb, fill_value=-1)
    sub = blocks[jnp.maximum(bidx, 0)]
    sub = jnp.where((bidx >= 0)[:, None], sub, 0).reshape(-1)
    (sidx,) = jnp.nonzero(sub != 0, size=kpad, fill_value=-1)
    gidx = jnp.where(
        sidx >= 0,
        bidx[jnp.maximum(sidx, 0) // blk] * blk + sidx % blk, -1)
    vals = jnp.where(sidx >= 0, sub[jnp.maximum(sidx, 0)], 0)
    return gidx, vals


i1, v1 = t("flat_nonzero", lambda: flat_nonzero(mask_d, kpad))
for blk in (256, 1024, 4096):
    i2, v2 = t(f"hier_nonzero blk={blk}",
               lambda b=blk: hier_nonzero(mask_d, kpad, b))
# verify equivalence (both sorted ascending by construction)
a = np.asarray(i1); b = np.asarray(i2)
sa = set(a[a >= 0].tolist()); sb = set(b[b >= 0].tolist())
print("equal sets:", sa == sb, len(sa))

# ---- part 2: rowcount kernel dot_general vs transpose ----
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QUERY_TILE = BASE_TILE = 1024


def _rowcount_kernel_dg(qv_ref, bv_ref, qlow_ref, blow_ref, out_ref,
                        *, ta, tb, v, nbits, sim, n_total):
    qi = pl.program_id(0)
    bj = pl.program_id(1)

    @pl.when(bj == 0)
    def _():
        out_ref[:, :] = jnp.zeros((ta, 1), jnp.int32)

    above_diag = (bj + 1) * tb > qi * ta + 1
    is_diag = above_diag & (bj * tb < (qi + 1) * ta)
    in_range = ((bj + 1) * tb <= n_total) & ((qi + 1) * ta <= n_total)
    interior = above_diag & (~is_diag) & in_range

    def compute_acc():
        bv = bv_ref[:]
        dims = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(qv_ref[0], bv, dims,
                                  preferred_element_type=jnp.int32)
        for vi in range(1, v):
            acc = jnp.maximum(acc, jax.lax.dot_general(
                qv_ref[vi], bv, dims, preferred_element_type=jnp.int32))
        either_low = (qlow_ref[:] + blow_ref[:].reshape(1, tb)) > 0
        dotmin = jnp.where(either_low, nbits, nbits - 2 * sim)
        return acc, dotmin

    @pl.when(interior)
    def _():
        acc, dotmin = compute_acc()
        out_ref[:, :] += (acc >= dotmin).sum(axis=1,
                                             dtype=jnp.int32)[:, None]

    @pl.when(above_diag & (is_diag | ~in_range))
    def _():
        acc, dotmin = compute_acc()
        qidx = qi * ta + jax.lax.broadcasted_iota(jnp.int32, (ta, tb), 0)
        jidx = bj * tb + jax.lax.broadcasted_iota(jnp.int32, (ta, tb), 1)
        mask = ((acc >= dotmin) & (jidx > qidx)
                & (jidx < n_total) & (qidx < n_total))
        out_ref[:, :] += mask.sum(axis=1, dtype=jnp.int32)[:, None]


@functools.partial(jax.jit,
                   static_argnames=("ta", "tb", "nbits", "sim", "n_total"))
def scan_row_counts_dg(var_pm1, low_i32, *, ta=QUERY_TILE, tb=BASE_TILE,
                       nbits=256, sim=40, n_total=0):
    v, npad, _ = var_pm1.shape
    nq = npad // ta
    nb = npad // tb
    kernel = functools.partial(_rowcount_kernel_dg, ta=ta, tb=tb, v=v,
                               nbits=nbits, sim=sim, n_total=n_total)
    flops = (npad * v) * npad * nbits
    return pl.pallas_call(
        kernel,
        grid=(nq, nb),
        in_specs=[
            pl.BlockSpec((v, ta, nbits), lambda qi, bj: (0, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, nbits), lambda qi, bj: (bj, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ta, 1), lambda qi, bj: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda qi, bj: (bj, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ta, 1), lambda qi, bj: (qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=0,
                                      transcendentals=0),
    )(var_pm1, var_pm1[0], low_i32, low_i32)


from rupphash_tpu.ops import hamming_pallas

n = 200_000
npad = -(-n // 1024) * 1024


@jax.jit
def make_vars(key):
    bits = jax.random.bernoulli(key, 0.5, (8, npad, 256))
    return (bits.astype(jnp.int8) << 1) - 1


buf = make_vars(jax.random.PRNGKey(2))
low_d = jax.device_put(np.zeros((npad, 1), dtype=np.int32))
jax.block_until_ready(buf)

c_ref = t("sweep 200k transpose", lambda: hamming_pallas.scan_row_counts(
    buf, low_d, nbits=256, sim=31, n_total=n))
try:
    c_dg = t("sweep 200k dot_general", lambda: scan_row_counts_dg(
        buf, low_d, nbits=256, sim=31, n_total=n))
    print("counts equal:", bool(jnp.array_equal(c_ref, c_dg)))
except Exception as e:
    print("dot_general variant failed:", type(e).__name__, str(e)[:200])
