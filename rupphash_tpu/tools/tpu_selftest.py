"""Real-hardware validation suite (not pytest: the test suite pins the
CPU backend, and first TPU compiles take minutes over a tunnel).

Run on a machine with a TPU attached:

    python -m rupphash_tpu.tools.tpu_selftest

Checks, each against the numpy goldens:
  1. PDQ XLA path: bench.jpg fixture hash + quality (bit parity)
  2. PDQ XLA path: randomized batch vs golden
  3. Mixed-shape batch path vs golden
  4. Pallas hybrid kernel vs XLA path (dihedral bit-exact)
  5. pHash vs golden (64-bit exact)
  6. Pallas grouping kernel: planted-duplicate count sweep
  7. Serve query op: min-over-variant distances vs numpy
  8. find_edges_fast (packed ship + on-device unpack) planted edges
  9. Native raw codecs vs their Python oracles (NEF 34713, ARW2)
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv=None) -> int:
    # fail FAST on a dead TPU transport instead of hanging in device
    # init forever (no CPU fallback here: this tool exists to validate
    # the hardware, so a dead backend is a loud failure, exit 3)
    from ..utils import backendprobe
    # use_ttl=False: a marker from a CLI probe minutes ago must not
    # stand in — the tunnel can die in between, and this gate is the
    # only thing between us and an infinite hang
    state = backendprobe.ensure_backend_alive(use_ttl=False)
    if state == "cpu-fallback":
        print("FAIL: accelerator backend unreachable — the selftest "
              "validates hardware and cannot run on the CPU fallback "
              "(set RUPPHASH_BACKEND_PROBE_S to widen the probe "
              "window)", file=sys.stderr)
        return 3

    import jax

    from ..ops import (hamming, hamming_pallas, pdq_jax, pdq_pallas,
                       pdq_ref, phash_jax, phash_ref)

    backend = jax.default_backend()
    print(f"backend: {backend}  devices: {jax.devices()}")
    if backend == "cpu":
        print("warning: no accelerator — validating the CPU lowering")
    failures = 0

    def check(name, ok):
        nonlocal failures
        print(f"  [{'OK' if ok else 'FAIL'}] {name}")
        failures += 0 if ok else 1

    # 1. fixture parity
    try:
        from PIL import Image
        img = np.asarray(Image.open(
            "/root/reference/tests/bench.jpg").convert("RGB"))
        luma = pdq_ref.prepare_luma(img)
        gold, gq = pdq_ref.generate_pdq(img)
        out = pdq_jax.pdq_hash_batch(np.asarray(luma)[None])
        check("bench.jpg XLA hash parity",
              bytes(np.asarray(out["hash"][0])) == gold)
        check("bench.jpg quality parity",
              abs(float(out["quality"][0]) - gq) < 1e-6)
    except (FileNotFoundError, ImportError, OSError) as e:
        print(f"  [SKIP] bench.jpg fixture unavailable "
              f"({type(e).__name__})")

    # 2. randomized batch
    rng = np.random.default_rng(0)
    lumas = rng.integers(0, 256, (32, 512, 288), dtype=np.uint8)
    out = pdq_jax.pdq_hash_batch(lumas)
    ok = all(bytes(np.asarray(out["hash"][i]))
             == pdq_ref.coeffs_to_hash(pdq_ref.pdq_from_luma(lumas[i])[0])
             for i in range(8))
    check("randomized XLA batch vs golden", ok)

    # 3. mixed shapes
    mixed = [rng.integers(0, 256, (h, w), dtype=np.uint8)
             for h, w in [(512, 288), (384, 512), (96, 128)]]
    mo = pdq_jax.pdq_hash_batch_mixed(mixed)
    ok = all(bytes(np.asarray(mo["hash"][i]))
             == pdq_ref.coeffs_to_hash(pdq_ref.pdq_from_luma(mixed[i])[0])
             for i in range(len(mixed)))
    check("mixed-shape batch vs golden", ok)

    # 4. hybrid Pallas kernel
    try:
        hyb = pdq_pallas.pdq_hash_batch_hybrid(lumas[:16])
        check("hybrid Pallas kernel dihedral vs XLA",
              np.array_equal(np.asarray(hyb["dihedral"]),
                             np.asarray(out["dihedral"][:16])))
    except Exception as e:
        check(f"hybrid Pallas kernel ({type(e).__name__})", False)

    # 5. pHash
    small = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    res = phash_jax.phash_batch(small[None])
    dev = phash_jax.u64_from_bytes(np.asarray(res["hash"][0]))
    check("pHash vs golden",
          dev == phash_ref.phash_from_luma32(small.astype(np.float32)))

    # 6. Pallas grouping sweep
    try:
        hashes = rng.integers(0, 256, (2048, 32), dtype=np.uint8)
        hashes[1500] = hashes[300]
        counts, n = hamming_pallas.row_match_counts(hashes, similarity=4)
        check("Pallas grouping planted pair",
              int(counts.sum()) == 1 and counts[300] == 1)
    except Exception as e:
        check(f"Pallas grouping ({type(e).__name__})", False)

    # 7. serve query op
    from .. import serve
    base = rng.integers(0, 256, (512, 32), dtype=np.uint8)
    qv = np.repeat(base[7][None, None], 8, axis=1)
    ix = serve.HashIndex()
    for i, h in enumerate(base):
        ix.add(f"/x/{i}", bytes(h), 90)
    hits = ix.query(qv, similarity=0)[0]
    check("serve exact query", len(hits) >= 1 and hits[0][0] == 7
          and hits[0][2] == 0)

    # 8. end-to-end edge extraction on the production (packed) path
    try:
        hashes = rng.integers(0, 256, (4096, 32), dtype=np.uint8)
        hashes[4000] = hashes[123]
        hashes[2048] = hashes[123]
        ei, ej = hamming.find_edges_fast(hashes, similarity=0)
        got = set(zip(ei.tolist(), ej.tolist()))
        check("find_edges_fast planted cluster",
              got == {(123, 2048), (123, 4000), (2048, 4000)})
    except Exception as e:
        check(f"find_edges_fast ({type(e).__name__})", False)

    # 9. native raw codecs vs Python oracles (host-side, but release
    # builds run this suite on the deploy image, so keep it here)
    try:
        from .. import native
        from ..pipeline import rawcontainers as rc
        stream = rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
        curve = np.arange(0x4000, dtype=np.uint16)
        vp = np.array([600, 600, 600, 600], dtype=np.uint16)
        a = native.nef_huff_decode(stream, vp, curve, 16, 8, 2)
        b = rc._nef_decode_py(stream, vp, curve, 16, 8, 2)
        check("NEF 34713 C++ vs Python oracle",
              a is not None and np.array_equal(a, b))
        curve2 = rc.sony_curve_lut(None)
        s2 = rng.integers(0, 256, 64 * 4, dtype=np.uint8).tobytes()
        c = native.arw2_decode(s2, curve2, 64, 4)
        d = rc._arw2_decode_py(s2, curve2, 64, 4)
        check("ARW2 C++ vs Python oracle",
              c is not None and np.array_equal(c, d))
        s3 = rng.integers(0, 256, 0x4000, dtype=np.uint8).tobytes()
        e1 = native.rw2_decode(s3, 56, 6)
        e2 = rc._rw2_decode_py(s3, 56, 6)
        check("RW2 C++ vs Python oracle",
              e1 is not None and np.array_equal(e1, e2))
        s4 = rng.integers(0, 256, 2000, dtype=np.uint8).tobytes()
        f1 = native.orf_decode(s4, 20, 6)
        f2 = rc._orf_decode_py(s4, 20, 6)
        check("ORF C++ vs Python oracle",
              f1 is not None and np.array_equal(f1, f2))
        from ..pipeline import cr3 as cr3mod
        g1 = native.crx_decode_plane(s4, 12, 6, 12)
        g2 = cr3mod.crx_decode_plane_py(s4, 12, 6, 12)
        check("CRX plane C++ vs Python oracle",
              (g1 is None and g2 is None)
              or (g1 is not None and g2 is not None
                  and np.array_equal(g1, g2)))
        # round-4 codecs: differential on random streams (both reject
        # or both identical — the fail-closed contract)
        def _same(a, b):
            return (a is None and b is None) or \
                (a is not None and b is not None and np.array_equal(a, b))
        s5 = rng.integers(0, 256, 400, dtype=np.uint8).tobytes()
        w1 = native.crx_decode_plane_wavelet(s5, [100, 100, 100, 100],
                                             10, 8, 12, 1, False)
        w2 = cr3mod.crx_decode_plane_wavelet_py(
            s5, [100, 100, 100, 100], 10, 8, 12, 1, False)
        check("CRX wavelet C++ vs Python oracle", _same(w1, w2))
        xt = np.tile(np.array([[0, 1], [1, 2]], np.uint8), (3, 3))
        hdr = (bytes([0x49, 0x53, 1, 0, 12]) + (6).to_bytes(2, "big")
               + (12).to_bytes(2, "big") + (12).to_bytes(2, "big")
               + (12).to_bytes(2, "big") + bytes([1])
               + (6).to_bytes(2, "big"))
        body = rng.integers(0, 256, 60, dtype=np.uint8).tobytes()
        s6 = hdr + len(body).to_bytes(4, "big") + body
        r1 = native.raf_decode(s6, 12, 6, xt)
        r2 = rc.raf_compressed_decode_py(s6, 12, 6, xt)
        check("compressed RAF C++ vs Python oracle", _same(r1, r2))
        s7 = rng.integers(0, 256, 2 * 16 * 6, dtype=np.uint8).tobytes()
        v1 = native.rw2_v6_decode(s7, 22, 6)
        v2 = rc.rw2_v6_decode_py(s7, 22, 6)
        check("RW2 v6 C++ vs Python oracle", _same(v1, v2))
        s8 = rng.integers(0, 256, 2 * 16 * 6, dtype=np.uint8).tobytes()
        u1 = native.rw2_v7_decode(s8, 18, 6, 14)
        u2 = rc.rw2_v7_decode_py(s8, 18, 6, 14)
        check("RW2 v7 C++ vs Python oracle", _same(u1, u2))
    except Exception as e:
        check(f"native raw codecs ({type(e).__name__})", False)

    # native cache AEAD: byte-compatibility with the cryptography-wheel
    # construction (envelope blobs must interoperate across machines
    # with and without the native library)
    try:
        import secrets

        from cryptography.hazmat.primitives.ciphers.aead import \
            ChaCha20Poly1305

        from .. import native
        from ..cache import crypto as ccrypto
        if native.get_lib() is not None:
            key = secrets.token_bytes(32)
            nonce = secrets.token_bytes(24)
            pt = secrets.token_bytes(777)
            sub, n12 = ccrypto._subkey_nonce(key, nonce)
            ref = ChaCha20Poly1305(sub).encrypt(n12, pt, b"aad")
            ok = native.xchacha_seal(key, nonce, pt, b"aad") == ref \
                and native.xchacha_open(key, nonce, ref, b"aad") == pt
            try:
                native.xchacha_open(key, nonce, ref[:-1] + bytes(
                    [ref[-1] ^ 1]), b"aad")
                ok = False
            except native.NativeTagError:
                pass
            check("native AEAD vs cryptography wheel", ok)
        else:
            print("  [skip] native AEAD unavailable (Python envelope)")
    except Exception as e:
        check(f"native AEAD ({type(e).__name__})", False)

    # fused JPEG/PNG probes (optional: need system libjpeg /
    # libdeflate): the runtime self-probes ARE the bit-equality
    # differentials (PIL vs fused over format-class corpora)
    for label, modname in (("JPEG", "jpegfast"), ("PNG", "pngfast"),
                           ("WebP", "webpfast")):
        try:
            import importlib
            mod = importlib.import_module(
                f"rupphash_tpu.native.{modname}")
            if mod.available():
                check(f"fused {label} probe self-equality", True)
            else:
                print(f"  [skip] fused {label} probe unavailable "
                      "(PIL path)")
        except Exception as e:
            check(f"fused {label} probe ({type(e).__name__})", False)

    print(f"{'PASS' if failures == 0 else 'FAIL'} "
          f"({failures} failing checks)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
