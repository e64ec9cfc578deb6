"""rupphash_tpu — a TPU-native perceptual-hash duplicate-image engine.

A ground-up reimplementation of the capabilities of Safari77/rupphash
(`phdupes`, reference at /root/reference) designed TPU-first:

* PDQ (256-bit) and classic pHash (64-bit) perceptual hashing as fused
  JAX/Pallas compute, with the whole image-domain pipeline (box resample,
  two-pass Jarosz blur, 64x64 decimation, 2-D DCT-II) collapsed into two
  MXU matmuls per image (see `ops/pdq_jax.py`).
* All-pairs Hamming-distance duplicate grouping as +/-1 int8 MXU matmuls
  with threshold masking (see `ops/hamming.py`), replacing the reference's
  per-pair XOR+popcount multi-index probing (src/hamminghash.rs).
* Multi-chip scaling over a `jax.sharding.Mesh` (see `parallel/`).
* A host data plane: directory walker, decode pool, EXIF extraction,
  blake2b content/pixel tiers, and an encrypted incremental cache
  (see `pipeline/` and `cache/`).

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):

  L7  CLI / TUI frontends                  cli.py
  L6  session state & intents              state.py
  L5  orchestration                        pipeline/scan.py
  L4  persistence                          cache/store.py, cache/config.py
  L3  hash & grouping kernels              ops/*, grouping/*
  L2  image/metadata primitives            pipeline/decode.py, pipeline/exif.py
  L1  native host library                  native/ruppnative.cpp
"""

__version__ = "0.1.0"

PDQ_ALGO_VERSION = 2  # cache-invalidation version byte, mirrors db.rs:32-47
