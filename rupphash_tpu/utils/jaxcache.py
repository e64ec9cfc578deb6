"""Persistent XLA compilation cache.

Every CLI invocation is a fresh process, and a cold TPU compile of the
hash/grouping programs costs tens of seconds (minutes over a remote
tunnel).  Pointing JAX's persistent compilation cache at our cache
directory makes every invocation after the first start hot — the
incremental-rescan philosophy of the reference's LMDB cache
(db.rs:300-321) applied to compiled executables.

Must run before the first jit compilation; safe to call repeatedly and
on jax versions without the knobs (best-effort).
"""

from __future__ import annotations

_enabled = False


def enable() -> bool:
    global _enabled
    if _enabled:
        return True
    try:
        import jax

        from ..cache import config as cfgmod

        cache_dir = cfgmod.cache_dir() / "xla_cache"
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        try:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)
        except AttributeError:
            pass
        try:
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
        except AttributeError:
            pass
        _enabled = True
        return True
    except Exception:
        return False
