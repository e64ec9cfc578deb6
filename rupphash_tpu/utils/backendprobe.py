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
(RUPPHASH_PLATFORM/JAX_PLATFORMS containing "cpu") and when the
platform env names no accelerator remotely (plain local CPU jax
initializes in-process instantly).
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


def ensure_backend_alive(timeout_s: float | None = None,
                         log=None) -> str:
    """Probe the default JAX backend; fall back to CPU if it cannot
    initialize within the timeout.

    Returns "ok" (probe passed), "skipped" (probe disabled/not
    needed), or "cpu-fallback" (probe failed; the parent process is
    now pinned to the CPU backend).  Must be called BEFORE anything
    initializes a jax backend in this process.
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
    # a recent successful probe (any process) stands in: repeated CLI
    # runs must not pay a second device init per scan
    import tempfile
    import time
    try:
        ttl = float(os.environ.get("RUPPHASH_BACKEND_PROBE_TTL_S",
                                   "600"))
    except ValueError:
        ttl = 600.0
    marker = os.path.join(
        tempfile.gettempdir(),
        f"rupphash-backend-ok-{os.environ.get('JAX_PLATFORMS', '')}"
        .replace(os.sep, "_"))
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
            try:
                with open(marker, "w") as f:
                    f.write(str(time.time()))
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
