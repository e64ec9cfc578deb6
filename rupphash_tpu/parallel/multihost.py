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
    needs for all-pairs grouping.  Single-process: identity."""
    if jax.process_count() <= 1:
        return local_hashes, local_variants, local_low
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(local_hashes)
    hashes = np.asarray(gathered).reshape(-1, local_hashes.shape[-1])
    variants = None
    if local_variants is not None:
        gv = multihost_utils.process_allgather(local_variants)
        variants = np.asarray(gv).reshape(-1, *local_variants.shape[1:])
    low = None
    if local_low is not None:
        gl = multihost_utils.process_allgather(local_low)
        low = np.asarray(gl).reshape(-1)
    return hashes, variants, low
