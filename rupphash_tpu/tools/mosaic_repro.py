"""Minimal standalone repro: Mosaic remote-compiler abort on unaligned
lane slicing + sublane restack (closes the fused-PDQ investigation).

Run on real TPU hardware:  python -m rupphash_tpu.tools.mosaic_repro

Background (PARITY.md "fused Pallas PDQ" note): restructuring the PDQ
front half into tile-batched GEMMs needs to slice a live (64, B*W)
VMEM value into per-image (64, W) column blocks and restack them along
sublanes.  When W is NOT a multiple of 128 lanes (the canonical PDQ
working width is 288), that construct makes this environment's remote
Mosaic compiler abort (tpu_compile_helper subprocess exit code 1 — a
crash, not a graceful unsupported-op error).  The same restack with
128-multiple slice widths compiles and runs fine, as does the
8-way concatenate of *input refs* along either axis and concat+dot.

Isolated 2026-08-16 on TPU v5 litepod-1 (jax 0.8.x, axon tunnel).
"""

from __future__ import annotations

import numpy as np


def build(width: int, slices: int = 8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        big = x_ref[0]                               # (64, slices*width)
        parts = [big[:, s * width:(s + 1) * width]
                 for s in range(slices)]
        o_ref[:] = jnp.concatenate(parts, axis=0)    # (slices*64, width)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((1, 64, slices * width),
                                   lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((slices * 64, width),
                                   lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((slices * 64, width),
                                           jnp.float32),
        )(x)

    return run


def main() -> int:
    import jax

    print(f"devices={jax.devices()}")
    rng = np.random.default_rng(0)
    ok = True
    for width, expect in ((128, "OK"), (256, "OK"), (288, "ABORT")):
        x = rng.standard_normal((1, 64, 8 * width)).astype(np.float32)
        try:
            out = build(width)(x)
            out.block_until_ready()
            got = "OK"
        except Exception as e:
            got = f"ABORT ({type(e).__name__})"
        print(f"column restack width={width}: {got}  (expected {expect})")
        if (got == "OK") != (expect == "OK"):
            # width=288 turning OK is good news (compiler fixed), but a
            # 128-aligned width aborting is a regression -> exit nonzero
            if "ABORT" in got:
                ok = False
    print("note: width=288 turning OK means the compiler bug is fixed "
          "and ops/pdq_pallas.py's batched-GEMM variant can be revived")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
