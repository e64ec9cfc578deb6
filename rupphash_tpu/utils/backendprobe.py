"""Accelerator-backend liveness probe with CPU fallback.

Motivation: the TPU plugin's device initialization blocks INSIDE a
global lock while it dials the remote chip, so when the transport (the
axon tunnel here) is dead the first `jax.devices()` hangs the process
forever with no message — observed as a multi-hour outage where even
`python -c "import jax; jax.devices()"` never returned.  A production
scan must degrade instead of hanging.

The probe runs `jax.devices()` in a SUBPROCESS under a timeout: the
parent process never touches device init until the child has proven it
completes, and on failure the parent selects the CPU backend via
`jax.config.update("jax_platforms", "cpu")` — which is safe precisely
because no backend exists in the parent yet.  (An in-process watchdog
thread cannot work: the hung init holds jax's backend lock, so the
fallback path would block on the same lock.)

Knobs:
  RUPPHASH_BACKEND_PROBE_S   probe timeout in seconds (default 60);
                             0 disables the probe entirely.

The probe is skipped when a CPU backend is already forced
(RUPPHASH_PLATFORM/JAX_PLATFORMS containing "cpu"), and a recent
successful probe is remembered in a per-user TTL marker so repeated
CLI runs don't pay a second device init.  Callers whose entire purpose
is the dead-transport gate (bench.py, tpu_selftest) pass use_ttl=False
— trusting a stale marker would reintroduce the exact hang they exist
to prevent.
"""

from __future__ import annotations

import os
import subprocess
import sys

_PROBE_SNIPPET = (
    "import jax; jax.devices(); "
    "print(jax.default_backend(), flush=True)"
)


def _forced_cpu() -> bool:
    for var in ("RUPPHASH_PLATFORM", "JAX_PLATFORMS"):
        v = os.environ.get(var, "")
        if v and "cpu" in v.lower():
            return True
    return False


def _marker_path() -> str | None:
    """Per-user marker under a 0o700 directory we own.  A predictable
    shared-/tmp filename would let another local user pin the marker
    fresh forever (probe permanently skipped -> the guard's hang
    returns) or plant a symlink for the open() to follow."""
    import tempfile
    base = os.path.join(tempfile.gettempdir(),
                        f"rupphash-probe-{os.getuid()}")
    try:
        os.makedirs(base, mode=0o700, exist_ok=True)
        st = os.lstat(base)
        import stat as statmod
        if (not statmod.S_ISDIR(st.st_mode) or st.st_uid != os.getuid()
                or (st.st_mode & 0o077)):
            return None
    except OSError:
        return None
    name = (f"ok-{os.environ.get('JAX_PLATFORMS', '')}"
            .replace(os.sep, "_"))
    return os.path.join(base, name)


def ensure_backend_alive(timeout_s: float | None = None,
                         log=None, use_ttl: bool = True) -> str:
    """Probe the default JAX backend; fall back to CPU if it cannot
    initialize within the timeout.

    Returns "ok" (probe passed), "skipped" (probe disabled/not
    needed), or "cpu-fallback" (probe failed; the parent process is
    now pinned to the CPU backend).  Must be called BEFORE anything
    initializes a jax backend in this process.

    use_ttl=False forces a live probe even when a recent success
    marker exists — required by callers whose whole job is the
    dead-transport gate (bench.py headline, tpu_selftest exit 3): a
    tunnel can die minutes after a successful CLI probe, and trusting
    the marker would hang them exactly where they must not hang.
    """
    log = log or (lambda *a: print(*a, file=sys.stderr))
    if timeout_s is None:
        try:
            timeout_s = float(
                os.environ.get("RUPPHASH_BACKEND_PROBE_S", "60"))
        except ValueError:
            timeout_s = 60.0
    if timeout_s <= 0 or _forced_cpu():
        return "skipped"
    # a recent successful probe (any process of THIS user) stands in:
    # repeated CLI runs must not pay a second device init per scan
    import time
    try:
        ttl = float(os.environ.get("RUPPHASH_BACKEND_PROBE_TTL_S",
                                   "600"))
    except ValueError:
        ttl = 600.0
    marker = _marker_path()
    if use_ttl and marker is not None:
        try:
            if ttl > 0 and time.time() - os.path.getmtime(marker) < ttl:
                return "skipped"
        except OSError:
            pass
    try:
        res = subprocess.run(
            [sys.executable, "-c", _PROBE_SNIPPET],
            capture_output=True, timeout=timeout_s)
        if res.returncode == 0:
            if marker is not None:
                try:
                    fd = os.open(marker,
                                 os.O_WRONLY | os.O_CREAT | os.O_NOFOLLOW,
                                 0o600)
                    with os.fdopen(fd, "w") as f:
                        f.write(str(time.time()))
                    os.utime(marker)
                except OSError:
                    pass
            return "ok"
        reason = (res.stderr or b"").decode(errors="replace").strip()
        reason = reason.splitlines()[-1] if reason else "exit != 0"
    except subprocess.TimeoutExpired:
        reason = f"no response in {timeout_s:.0f}s"
    except OSError as e:
        reason = str(e)
    log(f"[BACKEND] accelerator probe failed ({reason}) — falling "
        f"back to CPU.  Set RUPPHASH_BACKEND_PROBE_S to widen the "
        f"probe window or 0 to disable the probe.")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu-fallback"
