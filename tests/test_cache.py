"""Cache store: crypto envelope, schema semantics, prune, ignore API."""
import struct
import time

import numpy as np
import pytest

from rupphash_tpu.cache import config as cfgmod
from rupphash_tpu.cache import crypto
from rupphash_tpu.cache.store import CacheStore, IgnoredEntry


@pytest.fixture
def store(tmp_path):
    s = CacheStore(tmp_path / "cache.db", master_key=b"\x07" * 32,
                   start_writer=False)
    yield s
    s.close()


def test_hchacha20_rfc_vector():
    """Test vector from draft-irtf-cfrg-xchacha-03 section 2.2.1."""
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f")
    nonce = bytes.fromhex("000000090000004a0000000031415927")
    out = crypto.hchacha20(key, nonce)
    assert out == bytes.fromhex(
        "82413b4227b27bfed30e42508a877d73"
        "a0f9e4d58a74a853c12ec41326d3ecdc")


def test_encrypt_roundtrip_and_aad_binding():
    key = b"\x01" * 32
    ct = crypto.encrypt(key, b"hello", aad=b"slot-a")
    assert crypto.decrypt(key, ct, aad=b"slot-a") == b"hello"
    with pytest.raises(Exception):
        crypto.decrypt(key, ct, aad=b"slot-b")  # swap attack blocked
    ct2 = crypto.encrypt(key, b"hello", aad=b"slot-a")
    assert ct != ct2  # random nonce


def test_pdqhash_roundtrip_and_version_gate(store):
    ch = b"\xaa" * 32
    pdq = bytes(range(32))
    store.put_pdqhash(ch, pdq, quality=87)
    got = store.get_pdqhash(ch)
    assert got == (pdq, 87)
    # stale version byte -> miss
    from rupphash_tpu.cache import store as st
    v = bytes([99]) + pdq + struct.pack("<H", 87)
    store._put_now(st.NS_HASH, ch, v)
    assert store.get_pdqhash(ch) is None


def test_meta_and_coefficients_roundtrip(store):
    mk = store.compute_meta_key(123456789, 1000, 42)
    mk2 = store.compute_meta_key(123456789, 1000, 42)
    assert mk == mk2
    assert mk != store.compute_meta_key(123456789, 1000, 43)
    ch = b"\xbb" * 32
    store.put_meta(mk, ch)
    assert store.get_meta(mk) == ch
    coeffs = np.arange(256, dtype=np.float32)
    store.put_coefficients(ch, coeffs)
    assert np.array_equal(store.get_coefficients(ch), coeffs)


def test_features_and_pixel_hash(store):
    ch = b"\xcc" * 32
    feats = {"width": 640, "height": 480, "orientation": 6,
             "gps": [61.5, 23.8], "pdq_quality": 100}
    store.put_features(ch, feats)
    assert store.get_features(ch) == feats
    store.put_pixel_hash(ch, b"\xdd" * 32)
    assert store.get_pixel_hash(ch) == b"\xdd" * 32


def test_register_and_ignore_lifecycle(store):
    g1 = [(b"\x01" * 32, b"\x11" * 32), (b"\x02" * 32, b"\x12" * 32)]
    n = store.register_duplicate_groups([g1])
    assert n == 2
    u1 = store.get_group_uuid(b"\x01" * 32)
    assert u1 == store.get_group_uuid(b"\x02" * 32)
    assert not store.is_ignored(b"\x01" * 32)

    # uuid stable across re-registration (pdqmap reuse)
    store.register_duplicate_groups([g1])
    assert store.get_group_uuid(b"\x01" * 32) == u1

    assert store.set_files_ignored([b"\x01" * 32]) == 1
    assert store.is_ignored(b"\x01" * 32)
    # registration must not clobber the ignored flag (db.rs:1338-1341)
    store.register_duplicate_groups([g1])
    assert store.is_ignored(b"\x01" * 32)

    ig = store.list_ignored()
    assert len(ig) == 1 and ig[0][0] == b"\x01" * 32

    assert store.unignore(group_uuid=u1) == 1
    assert not store.is_ignored(b"\x01" * 32)

    store.set_files_ignored([b"\x02" * 32])
    assert store.unignore(pdqhash=b"\x12" * 32) == 1


def test_prune(store):
    ch_old, ch_new = b"\x03" * 32, b"\x04" * 32
    mk_old = store.compute_meta_key(1, 1, 1)
    mk_new = store.compute_meta_key(2, 2, 2)
    old_ts = int(time.time()) - 10_000
    from rupphash_tpu.cache.store import NS_META
    store._put_now(NS_META, mk_old,
                   ch_old + struct.pack("<Q", old_ts))
    store.put_meta(mk_new, ch_new)
    store.put_pdqhash(ch_old, b"\x00" * 32, 1)
    store.put_pdqhash(ch_new, b"\x01" * 32, 2)
    res = store.prune(max_age_s=5000)
    assert res["dropped_meta"] == 1
    assert res["swept_orphans"] == 1
    assert store.get_pdqhash(ch_new) is not None
    assert store.get_pdqhash(ch_old) is None


def test_async_writer(tmp_path):
    s = CacheStore(tmp_path / "w.db", master_key=b"\x08" * 32)
    ch = b"\x05" * 32
    s.put_pdqhash(ch, b"\x09" * 32, 50)
    s.flush()
    assert s.get_pdqhash(ch) == (b"\x09" * 32, 50)
    s.close()


def test_put_meta_many_batched(tmp_path):
    """put_meta_many lands every refresh through ONE writer-queue
    interaction (warm rescans batch their per-hit timestamp refreshes;
    per-item puts wake the writer per file).  Durability and the
    backlog-drop accounting must match the per-item path."""
    s = CacheStore(tmp_path / "m.db", master_key=b"\x03" * 32)
    try:
        pairs = [(s.compute_meta_key(i, i + 1, i + 2), bytes([i]) * 32)
                 for i in range(50)]
        s.put_meta_many(pairs, now=1234)
        assert s.flush()
        for mk, ch in pairs:
            assert s.get_meta(mk) == ch
        # one queue item for the whole batch: fill the backlog and the
        # overflow accounting counts the WHOLE rejected batch
        import rupphash_tpu.cache.store as stmod
        before = s.dropped_updates
        old = stmod.MAX_BACKLOG
        stmod.MAX_BACKLOG = 0
        try:
            s.put_meta_many(pairs)
        finally:
            stmod.MAX_BACKLOG = old
        assert s.dropped_updates == before + len(pairs)
    finally:
        s.close()


def test_put_meta_many_without_writer(tmp_path):
    """Store-less-writer path (start_writer=False) writes synchronously
    in one transaction."""
    s = CacheStore(tmp_path / "n.db", master_key=b"\x04" * 32,
                   start_writer=False)
    try:
        pairs = [(s.compute_meta_key(9, 9, i), bytes([i + 1]) * 32)
                 for i in range(10)]
        s.put_meta_many(pairs)
        for mk, ch in pairs:
            assert s.get_meta(mk) == ch
    finally:
        s.close()


def test_config_create_and_heal(tmp_path, monkeypatch):
    monkeypatch.setenv("RUPPHASH_CONFIG_DIR", str(tmp_path))
    cfg = cfgmod.load_config()
    assert len(cfg["_master_key_bytes"]) == 32
    key1 = cfg["master_key"]
    # reload: key stable
    cfg2 = cfgmod.load_config()
    assert cfg2["master_key"] == key1
    # corrupt the key -> regenerated, other values preserved
    p = tmp_path / "rupphash.conf"
    text = p.read_text().replace(key1, "zznothex")
    p.write_text(text)
    cfg3 = cfgmod.load_config()
    assert cfg3["master_key"] != key1
    assert len(bytes.fromhex(cfg3["master_key"])) == 32


def test_corrupt_db_file_recreated(tmp_path):
    """A garbage cache file is recreated instead of crashing (the
    reference treats lmdb corruption as recomputable, db.rs:685-693)."""

    p = tmp_path / "cache.db"
    p.write_bytes(b"definitely not a sqlite database" * 64)
    st = CacheStore(p, b"\x07" * 32, start_writer=False)
    mk = st.compute_meta_key(1, 2, 3)
    st.put_meta(mk, b"c" * 32)
    assert st.get_meta(mk) == b"c" * 32
    st.close()


def test_flush_recovers_after_historic_drop(tmp_path):
    """flush() must report failure only for drops since the previous
    flush — one backlog overflow must not mark every later (healthy)
    flush undurable forever (ADVICE r2)."""
    s = CacheStore(tmp_path / "c.db", master_key=b"\x01" * 32,
                   start_writer=True)
    try:
        # simulate a historic backlog overflow
        s.dropped_updates += 5
        assert s.flush() is False          # the drop epoch that saw them
        s.put_pdqhash(b"\xaa" * 32, b"\x00" * 32, 80)
        assert s.flush() is True           # healthy again
        s.dropped_updates += 1
        assert s.flush() is False          # a fresh drop counts again
        assert s.flush() is True
    finally:
        s.close()


def test_toml_deep_nested_dict_roundtrip(tmp_path):
    """_dump_toml must not silently drop dicts nested two levels under a
    table (ADVICE r2): multi-segment dotted keys round-trip."""
    import tomllib
    cfg = {
        "top": 1,
        "gui": {"font_scale": 1.5,
                "panels": {"left": {"width": 30, "show": True},
                           "right": {"width": 20}}},
    }
    text = cfgmod._dump_toml(cfg)
    back = tomllib.loads(text)
    assert back == cfg


def test_get_many_batched(store):
    """Batched IN(...) lookups agree with the point getters, drop
    tampered values, and version-gate exactly like the singles."""
    from rupphash_tpu.cache import store as st
    chs = [bytes([i]) * 32 for i in range(5)]
    for i, ch in enumerate(chs):
        store.put_pdqhash(ch, bytes([i]) * 32, quality=50 + i)
        store.put_features(ch, {"width": 100 + i, "height": 50})
        store.put_coefficients(ch, np.full(256, float(i), np.float32))
        store.put_pixel_hash(ch, bytes([0xF0 | i]) * 32)
    mks = [store.compute_meta_key(1000 + i, 10, i) for i in range(5)]
    for mk, ch in zip(mks, chs):
        store.put_meta(mk, ch)
    absent = b"\x99" * 32

    metas = store.get_meta_many(mks + [absent])
    assert metas == dict(zip(mks, chs))
    pdqs = store.get_pdqhash_many(chs + [absent])
    feats = store.get_features_many(chs)
    coeffs = store.get_coefficients_many(chs)
    pxs = store.get_pixel_hash_many(chs)
    for i, ch in enumerate(chs):
        assert pdqs[ch] == store.get_pdqhash(ch)
        assert feats[ch] == store.get_features(ch)
        assert np.array_equal(coeffs[ch], store.get_coefficients(ch))
        assert pxs[ch] == store.get_pixel_hash(ch)
    assert absent not in pdqs

    # stale version byte -> absent from the batch (db.rs:685-693)
    v = bytes([99]) + bytes(32) + struct.pack("<H", 1)
    store._put_now(st.NS_HASH, chs[0], v)
    assert chs[0] not in store.get_pdqhash_many(chs)
    # tampered ciphertext -> absent (decrypt failure == miss)
    row = store._conn().execute(
        "SELECT v FROM kv WHERE ns = ? AND k = ?",
        (st.NS_FEATURES, chs[1])).fetchone()
    bad = bytes(row[0][:-1]) + bytes([row[0][-1] ^ 1])
    store._conn().execute(
        "UPDATE kv SET v = ? WHERE ns = ? AND k = ?",
        (bad, st.NS_FEATURES, chs[1]))
    store._conn().commit()
    assert chs[1] not in store.get_features_many(chs)
    # chunking: >500 keys still resolve (multiple IN batches)
    many = [bytes([i % 256, i // 256]) + bytes(30) for i in range(700)]
    store.put_meta_many([(store.compute_meta_key(i, 1, 1), many[i])
                         for i in range(700)])
    mks2 = [store.compute_meta_key(i, 1, 1) for i in range(700)]
    assert store.get_meta_many(mks2) == dict(zip(mks2, many))


def test_native_aead_differential():
    """Native xchacha20poly1305_{seal,open} are byte-compatible with the
    `cryptography` construction used by the fallback, reject tampering
    in any region, and both envelope directions interoperate."""
    import secrets

    from cryptography.hazmat.primitives.ciphers.aead import \
        ChaCha20Poly1305

    from rupphash_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")

    def ref_seal(key, nonce, pt, aad):
        sub, n12 = crypto._subkey_nonce(key, nonce)
        return ChaCha20Poly1305(sub).encrypt(n12, pt, aad)

    for ptlen, aadlen in [(0, 0), (1, 0), (15, 16), (16, 33), (17, 1),
                          (64, 0), (65, 7), (1025, 100)]:
        key = secrets.token_bytes(32)
        nonce = secrets.token_bytes(24)
        pt = secrets.token_bytes(ptlen)
        aad = secrets.token_bytes(aadlen)
        ref = ref_seal(key, nonce, pt, aad)
        assert native.xchacha_seal(key, nonce, pt, aad) == ref
        assert native.xchacha_open(key, nonce, ref, aad) == pt
        for pos in ([0] if ptlen else []) + [len(ref) - 1]:
            bad = bytearray(ref)
            bad[pos] ^= 1
            with pytest.raises(native.NativeTagError):
                native.xchacha_open(key, nonce, bytes(bad), aad)
        with pytest.raises(native.NativeTagError):
            native.xchacha_open(key, nonce, ref, aad + b"x")


def test_crypto_envelope_fallback_interop(monkeypatch):
    """Blobs sealed by the native path decrypt through the pure
    `cryptography` fallback and vice versa (cache files survive the
    native library appearing or disappearing between runs)."""
    from cryptography.exceptions import InvalidTag

    from rupphash_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    key = b"\x21" * 32
    blob_native = crypto.encrypt(key, b"payload", b"aad")

    monkeypatch.setattr(native, "xchacha_seal",
                        lambda *a, **k: None)
    monkeypatch.setattr(native, "xchacha_open",
                        lambda *a, **k: None)
    blob_py = crypto.encrypt(key, b"payload", b"aad")
    assert crypto.decrypt(key, blob_native, b"aad") == b"payload"
    monkeypatch.undo()
    assert crypto.decrypt(key, blob_py, b"aad") == b"payload"
    with pytest.raises(InvalidTag):
        crypto.decrypt(key, blob_py[:-1] + bytes([blob_py[-1] ^ 1]),
                       b"aad")
