"""Multi-host scaling: DCN-sharded input pipeline, ICI-sharded compute.

The reference is strictly single-machine (SURVEY.md section 5); this is
the TPU-native answer for corpora that outgrow one host:

  * the *file list* is sharded deterministically across hosts (DCN side)
    — each host walks/decodes/hashes only its shard on its local chips;
  * hashes are small (32 B + 8x32 B variants per image), so the global
    all-pairs grouping gathers them across hosts once
    (process_allgather) and then runs the 2-D ('q','b') mesh sweep
    (parallel/sharded.py) over ICI.

Everything degrades to a no-op on a single host, which is how the test
suite exercises it.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np


def process_info():
    return jax.process_index(), jax.process_count()


def shard_files(files, process_index: int | None = None,
                process_count: int | None = None,
                by: str = "hash"):
    """Deterministic file-list shard for this host.

    by="hash": stable content-independent assignment from the path hash
    (rebalances well for heterogeneous directories); by="stride": every
    k-th file (preserves directory locality for cache warmth).
    """
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    if pc <= 1:
        return list(files)
    if by == "stride":
        return [f for i, f in enumerate(files) if i % pc == pi]
    out = []
    for f in files:
        h = hashlib.blake2b(str(f).encode(), digest_size=8).digest()
        if int.from_bytes(h, "little") % pc == pi:
            out.append(f)
    return out


def allgather_hashes(local_hashes: np.ndarray,
                     local_variants: np.ndarray | None = None,
                     local_low: np.ndarray | None = None):
    """Gather per-host hash shards into the global matrices every host
    needs for all-pairs grouping.  Single-process: identity.

    process_allgather requires identical shapes on every process, but
    shard_files' hash partitioning produces unequal shard sizes — so
    the per-host count is gathered first (a scalar, always
    shape-equal), every array pads to the max, and the padding is
    trimmed per shard after the gather."""
    if jax.process_count() <= 1:
        return local_hashes, local_variants, local_low
    from jax.experimental import multihost_utils

    n_local = len(local_hashes)
    counts = np.asarray(multihost_utils.process_allgather(
        np.asarray([n_local], dtype=np.int64))).reshape(-1)
    m = int(counts.max()) if counts.size else 0

    def pad(a):
        if a is None or len(a) == m:
            return a
        padded = np.zeros((m,) + a.shape[1:], dtype=a.dtype)
        padded[:len(a)] = a
        return padded

    def trim(gathered, trailing_shape):
        g = np.asarray(gathered).reshape(-1, m, *trailing_shape)
        return np.concatenate([g[i, :counts[i]]
                               for i in range(len(counts))], axis=0)

    hashes = trim(multihost_utils.process_allgather(pad(local_hashes)),
                  local_hashes.shape[1:])
    variants = None
    if local_variants is not None:
        variants = trim(
            multihost_utils.process_allgather(pad(local_variants)),
            local_variants.shape[1:])
    low = None
    if local_low is not None:
        low = trim(multihost_utils.process_allgather(pad(local_low)),
                   local_low.shape[1:])
    return hashes, variants, low
