"""Shared scaffolding for the fused probe decoders (jpegfast/pngfast).

Each fast path is a lazily-built .so (like ruppnative) plus a runtime
self-probe: a deterministic corpus is decoded through BOTH the fused
path and the PIL route and bit-compared once per process; any mismatch
(or a missing system library) disables the fast path on this machine,
so production output can never diverge from the PIL semantics the
tests pin down.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path


class FastLib:
    """Build-on-first-use ctypes library with a validation probe.

    `configure(lib)` sets restype/argtypes; `self_probe()` returns
    True when the fused output bit-matches the PIL route on the probe
    corpus.  `env_off` force-disables (escape hatch + lets the
    equivalence tests drive the slow path).
    """

    def __init__(self, src: Path, so: Path, ldflags: list[str],
                 configure, self_probe, env_off: str):
        self._src = src
        self._so = so
        self._ldflags = ldflags
        self._configure = configure
        self._self_probe = self_probe
        self._env_off = env_off
        self._lock = threading.RLock()
        self._lib = None
        self._state: bool | None = None  # None=unprobed, False=off

    def _build(self) -> bool:
        # -march=native vectorizes the luma/resample loops;
        # -ffp-contract=off forbids FMA contraction so the float64
        # resample math stays bit-identical to box_resample_u8 (the
        # golden was compiled contraction-free on baseline x86-64).
        for extra in (["-march=native", "-ffp-contract=off"],
                      ["-ffp-contract=off"]):
            cmd = (["g++", "-O3"] + extra +
                   ["-shared", "-fPIC", "-std=c++17", str(self._src),
                    "-o", str(self._so)] + self._ldflags)
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                return True
            except FileNotFoundError:
                return False
            except subprocess.SubprocessError:
                continue
        return False

    def get_lib(self):
        if self._lib is not None or self._state is False:
            return self._lib
        with self._lock:
            if self._lib is not None or self._state is False:
                return self._lib
            if (not self._so.exists()
                    or self._so.stat().st_mtime
                    < self._src.stat().st_mtime):
                if not self._build():
                    self._state = False
                    return None
            try:
                lib = ctypes.CDLL(str(self._so))
            except OSError:
                self._state = False
                return None
            self._configure(lib)
            self._lib = lib
            return self._lib

    def available(self) -> bool:
        if os.environ.get(self._env_off):
            return False
        if self._state is not None:
            return self._state
        with self._lock:
            if self._state is not None:
                return self._state
            ok = self.get_lib() is not None
            if ok:
                try:
                    ok = self._self_probe()
                except Exception:
                    ok = False
            self._state = ok
            return self._state
