"""SPMD scaling over a jax.sharding.Mesh.

Two parallel axes, matching the two compute phases (BASELINE.json):

* **Hashing** is embarrassingly data-parallel: the luma batch is sharded
  over every mesh axis combined (pure dp); each chip runs the fused PDQ
  pipeline (ops/pdq_jax.py) on its shard.  No communication.

* **All-pairs grouping** is a 2-D problem: the (queries x base) distance
  matrix is tiled over a ('q', 'b') mesh.  Queries (with their 8 dihedral
  variants) are sharded over 'q', the base hash matrix over 'b'; each chip
  computes its distance tile as +/-1 int8 MXU matmuls and thresholds
  locally.  Count reduction is a psum over the mesh; ICI carries only hash
  tiles (N * 256 int8), never distance tiles.

The reference has no distributed backend at all (SURVEY.md section 5) —
this layer is the TPU-native answer to "scan 10^8 images": shard the
decode fleet over hosts (DCN), hash shards per chip, group over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import pdq_jax
from ..ops.hamming import unpack_bits_pm1


def make_mesh(n_devices: int | None = None) -> Mesh:
    """A ('q', 'b') mesh over the first n devices: 'q' tiles query rows,
    'b' tiles base columns of the distance matrix."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n % 2 == 0 and n > 1:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    return Mesh(np.asarray(devs[:n]).reshape(shape), ("q", "b"))


def sharded_pdq_hasher(mesh: Mesh, rows: int, cols: int):
    """Data-parallel fused PDQ over the whole mesh.

    Returns a jitted fn: (B, rows, cols) u8 lumas (B divisible by the mesh
    size) -> dict of sharded outputs (hash, dihedral, quality, coeffs).
    """
    l_np, r_np = pdq_jax.linear_operators(rows, cols)
    d_np = pdq_jax.dct16x64()
    batch_sharding = NamedSharding(mesh, P(("q", "b")))

    @functools.partial(jax.jit, in_shardings=(batch_sharding,))
    def run(lumas):
        return pdq_jax.pdq_core(lumas, jnp.asarray(l_np), jnp.asarray(r_np),
                                jnp.asarray(d_np))

    return run


def sharded_group_counts(mesh: Mesh, similarity: int = 40):
    """2-D sharded all-pairs duplicate counting.

    Returns a jitted fn(variants_u8 (N, V, 32), low_conf (N,) bool) ->
    (nq, nb) int32 per-device-tile match counts, where nq/nb are the mesh
    axis sizes.  Each (q, b) device computes its tile of the N x N
    distance matrix; ICI traffic is one all-gather of hash shards.
    """
    nq = mesh.shape["q"]
    nb = mesh.shape["b"]

    def tile_counts(var_shard, base_shard, qlow_shard, blow_shard,
                    qoff, boff):
        # var_shard: (Nq_loc, V, nbits) int8; base_shard: (Nb_loc, nbits)
        nloc, v, nbits = var_shard.shape
        mloc = base_shard.shape[0]
        flat_q = var_shard.reshape(nloc * v, nbits)
        dots = jax.lax.dot_general(flat_q, base_shard.T,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        dist = (nbits - dots.reshape(nloc, v, mloc).max(axis=1)) // 2
        thr = jnp.where(qlow_shard[:, None] | blow_shard[None, :], 0,
                        similarity)
        qidx = qoff[0] + jax.lax.broadcasted_iota(jnp.int32, (nloc, 1), 0)
        jidx = boff[0] + jax.lax.broadcasted_iota(jnp.int32, (1, mloc), 1)
        mask = (dist <= thr) & (jidx > qidx)
        return mask.sum(dtype=jnp.int32).reshape(1, 1)

    smapped = shard_map(
        tile_counts, mesh=mesh,
        in_specs=(P("q"), P("b"), P("q"), P("b"), P("q"), P("b")),
        out_specs=P("q", "b"))

    @jax.jit
    def run(variants_u8, low_conf):
        n = variants_u8.shape[0]
        var_pm1 = unpack_bits_pm1(variants_u8)
        base_pm1 = var_pm1[:, 0, :]
        qoff = (jnp.arange(nq, dtype=jnp.int32) * (n // nq))
        boff = (jnp.arange(nb, dtype=jnp.int32) * (n // nb))
        return smapped(var_pm1, base_pm1, low_conf, low_conf, qoff, boff)

    return run


def full_dedup_step(mesh: Mesh, rows: int, cols: int, similarity: int = 40):
    """The flagship end-to-end device step: sharded hash -> sharded group.

    (B, rows, cols) u8 lumas -> (hashes (B, 32) u8, quality (B,),
    tile match counts (nq, nb) int32).  This is the unit the CLI scan loop
    dispatches per batch and the unit dryrun_multichip compiles.
    """
    hasher = sharded_pdq_hasher(mesh, rows, cols)
    grouper = sharded_group_counts(mesh, similarity)

    def step(lumas):
        out = hasher(lumas)
        low = out["quality"] * 100.0 < 50.0
        counts = grouper(out["dihedral"], low)
        return out["hash"], out["quality"], counts

    return step
