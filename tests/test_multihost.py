"""Real 2-process jax.distributed exercise of parallel/multihost.py.

VERDICT r1 weak #7: process_allgather's reshape logic had zero coverage
because every test ran single-process (where allgather_hashes is an
identity).  Here two actual OS processes initialize a jax.distributed
CPU cluster, shard a file list, gather their hash shards, and each
asserts the reassembled global matrices.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    from rupphash_tpu.parallel import multihost

    assert multihost.process_info() == (pid, 2)
    files = [f"f{i:03d}" for i in range(16)]
    mine = multihost.shard_files(files, by="stride")
    assert mine == files[pid::2]

    # UNEQUAL per-process shard sizes (what shard_files' hash
    # partitioning actually produces): the gather pads to the max
    # count, trims per shard, and concatenates in process order
    n_local = 8 if pid == 0 else 5
    rng = np.random.default_rng(pid)
    local = rng.integers(0, 256, (n_local, 32), dtype=np.uint8)
    local_var = np.repeat(local[:, None, :], 8, axis=1)
    local_low = (np.arange(n_local) % 2 == pid).astype(bool)
    hashes, variants, low = multihost.allgather_hashes(
        local, local_var, local_low)
    assert hashes.shape == (13, 32), hashes.shape
    assert variants.shape == (13, 8, 32), variants.shape
    assert low.shape == (13,), low.shape
    # this process's shard must appear intact at its offset
    off = 0 if pid == 0 else 8
    assert np.array_equal(hashes[off:off + n_local], local)
    assert np.array_equal(variants[off:off + n_local], local_var)
    assert np.array_equal(low[off:off + n_local], local_low)
    np.savez(os.path.join(outdir, f"proc{pid}.npz"),
             hashes=hashes, variants=variants, low=low)
    print("worker-ok", pid)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_allgather(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one local device per process
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("jax.distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker-ok {pid}" in out
    # both processes saw the identical global matrices
    a = np.load(tmp_path / "proc0.npz")
    b = np.load(tmp_path / "proc1.npz")
    for k in ("hashes", "variants", "low"):
        assert np.array_equal(a[k], b[k])
    rng0 = np.random.default_rng(0)
    assert a["hashes"].shape == (13, 32)
    assert np.array_equal(a["hashes"][:8],
                          rng0.integers(0, 256, (8, 32), dtype=np.uint8))
