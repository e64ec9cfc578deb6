#!/bin/sh
# Release gate, mirroring the reference's release.sh (build -> tests ->
# version bump/package): full test suite on the virtual CPU mesh, native
# library rebuild from scratch, entry-point compile checks, benchmark
# smoke, then an sdist/wheel build if `build` is available.
set -e

echo "== native library rebuild =="
rm -f rupphash_tpu/native/ruppnative.so rupphash_tpu/native/ruppjpeg.so \
      rupphash_tpu/native/ruppng.so rupphash_tpu/native/ruppwebp.so
python - <<'EOF'
from rupphash_tpu import native
from rupphash_tpu.native import jpegfast, pngfast, webpfast
assert native.get_lib() is not None, "native build failed"
print("ruppnative.so built")
# the fused probes are optional (need system libjpeg / libdeflate /
# libwebp); report, don't gate
print("ruppjpeg.so (fused JPEG probe):",
      "available" if jpegfast.available() else "unavailable (PIL path)")
print("ruppng.so (fused PNG probe):",
      "available" if pngfast.available() else "unavailable (PIL path)")
print("ruppwebp.so (fused WebP probe):",
      "available" if webpfast.available() else "unavailable (PIL path)")
EOF

echo "== tests =="
python -m pytest tests/ -q

echo "== driver entry points (8-device virtual mesh) =="
XLA_FLAGS=--xla_force_host_platform_device_count=8 python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as ge
fn, args = ge.entry()
jax.jit(fn)(*args)
ge.dryrun_multichip(8)
print("entry + dryrun_multichip ok")
EOF

echo "== package =="
# only a missing `build` module may skip; a real sdist/wheel failure
# must fail the gate (2>/dev/null previously hid both alike)
if python -c "import build" 2>/dev/null; then
    python -m build --sdist --wheel --no-isolation
else
    echo "python-build unavailable; skipping package step"
fi

echo "release checks passed"
