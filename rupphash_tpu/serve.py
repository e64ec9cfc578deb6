"""Near-duplicate lookup service: persistent hash index + TPU query path.

New serving capability on top of the reference's batch-dedup engine
(nothing equivalent exists in the reference, which is a desktop app;
this is the production-deployment shape of the same kernels): keep a
corpus's PDQ hashes device-resident as a ±1 int8 matrix, hash incoming
images on the TPU (ops/pdq_jax.py, the same bit-exact path the scanner
uses), and answer "what in the corpus is within distance d" with one
MXU matmul per query batch — (Q·8, 256) @ (256, N) int8, min over the
8 dihedral variants, exactly the tile math of ops/hamming.py.

Surfaces:
  * library  — HashIndex (build/save/load/add) + NearDupService.query
  * HTTP     — POST /v1/query (raw image bytes) -> JSON matches,
               POST /v1/add?path=... -> index insert,
               POST /v1/remove?path=... -> index delete,
               GET  /v1/stats
  * CLI      — `rupphash --serve DIR [--port N]`

Low-quality corpus entries only match at distance 0, the scanner's
gating rule (scanner.rs:1588-1594).
"""

from __future__ import annotations

import functools
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax
import jax.numpy as jnp

from .ops import hamming

PDQ_MIN_QUALITY = 50

# device-resident per-row status codes (int8): OK matches normally, LOW
# only matches at distance 0 (scanner.rs:1588-1594), DEAD never matches
# (tombstoned by remove(); reclaimed by compaction)
STATUS_OK, STATUS_LOW, STATUS_DEAD = 0, 1, 2

# host->device upload accounting: every device_put in this module goes
# through _upload so tests can assert that add/remove traffic is
# O(delta), never O(corpus) (the tunnel to the TPU is the scarce
# resource in production).  HashIndex supports concurrent mutation
# threads, so the counter increment is lock-guarded — unsynchronized
# += would lose increments and make the accounting unreliable.
UPLOAD_BYTES = 0
_UPLOAD_LOCK = threading.Lock()


def _upload(x, sharding=None):
    global UPLOAD_BYTES
    x = np.asarray(x)
    with _UPLOAD_LOCK:
        UPLOAD_BYTES += x.nbytes
    if sharding is not None:
        return jax.device_put(x, sharding)
    return jax.device_put(x)


@functools.partial(jax.jit, static_argnames=("nbits",))
def _query_min_dists(q_packed, base_packed, base_status, nbits):
    """(Q, V, nbytes) u8 query variants vs (N, nbytes) u8 base ->
    (Q, N) int32 min-over-variant Hamming distance; low-quality base
    rows report nbits+1 unless the distance is exactly 0, dead
    (tombstoned) rows always report nbits+1."""
    q, v, nbytes = q_packed.shape
    qv = hamming.unpack_bits_pm1(q_packed).reshape(q * v, nbits)
    base = hamming.unpack_bits_pm1(base_packed)
    dots = jax.lax.dot_general(qv, base.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    dist = (nbits - dots.reshape(q, v, -1).max(axis=1)) // 2
    low = base_status[None, :] == STATUS_LOW
    dead = base_status[None, :] >= STATUS_DEAD
    gated = jnp.where(dead | (low & (dist > 0)), nbits + 1, dist)
    return gated


@jax.jit
def _dev_write_rows(base, status, rows, strows, start):
    """Append/overwrite a contiguous row block at `start` (device-side;
    the only host->device traffic is the new rows themselves)."""
    base = jax.lax.dynamic_update_slice(base, rows, (start, 0))
    status = jax.lax.dynamic_update_slice(status, strows, (start,))
    return base, status


@jax.jit
def _dev_kill_rows(status, idx):
    """Tombstone rows by index (idx padded with out-of-range values,
    dropped by mode='drop')."""
    return status.at[idx].set(STATUS_DEAD, mode="drop")


@functools.partial(jax.jit, static_argnames=("nbits", "k"))
def _query_topk(q_packed, base_packed, base_status, n_total, nbits, k):
    """Device-side selection: the k best (distance, corpus index) pairs
    per query instead of the full (Q, N) distance matrix — the
    readback is O(k) per query rather than O(N) (4 MB/query at a 1M
    corpus).  Rows past n_total (padding) report nbits+1; distance
    ties resolve to the lower corpus index (lax.top_k keeps first
    occurrences), matching the host-side stable sort it replaces."""
    gated = _query_min_dists(q_packed, base_packed, base_status, nbits)
    col = jnp.arange(gated.shape[1], dtype=jnp.int32)[None, :]
    gated = jnp.where(col >= n_total, nbits + 1, gated)
    neg, idx = jax.lax.top_k(-gated, k)
    return -neg, idx


class HashIndex:
    """Persistent (hashes, quality, paths) corpus index.

    Device residency is INCREMENTAL: the packed corpus is pushed once
    (padded to a capacity), then add() appends rows into the spare
    capacity with a device-side dynamic_update_slice (uploading only
    the new rows) and remove() tombstones rows via a status write
    (uploading only the indices).  A full re-push happens only on first
    use, capacity growth (amortized O(1) via doubling), or compaction
    (when >50% of slots are dead).  Device updates are pure — an
    in-flight query's captured snapshot stays valid while a mutation
    builds the next version.  Host slots are append-only between
    compactions, so a snapshot's (arrays, paths-list, n) triple never
    tears under concurrent mutation.
    """

    def __init__(self, nbytes: int = 32):
        self.nbytes = nbytes
        self._hashes = np.zeros((0, nbytes), dtype=np.uint8)
        self._quality = np.zeros(0, dtype=np.int32)
        self._dead = np.zeros(0, dtype=bool)
        self._paths: list[str] = []   # slot-aligned; tombstones keep slot
        self._n = 0                   # slots in use (incl. dead)
        self._n_dead = 0
        self._version = 0             # bumped on every mutation
        # device state: {"h","st" (device arrays), "cap", "applied",
        # "paths" (the slot list object at push time), "pending_dead",
        # "hsnap" (slot-aligned host hash array at push time)} — one
        # for the default device, one for a mesh (same incremental
        # machinery, arrays sharded over the mesh)
        self._dev = None
        self._dev_mesh = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------ size
    def __len__(self) -> int:
        return self._n - self._n_dead

    @property
    def _live_mask(self) -> np.ndarray:
        return ~self._dead[:self._n]

    @property
    def hashes(self) -> np.ndarray:
        """Live (non-tombstoned) hashes, compacted."""
        return self._hashes[:self._n][self._live_mask]

    @property
    def quality(self) -> np.ndarray:
        return self._quality[:self._n][self._live_mask]

    @property
    def paths(self) -> list[str]:
        """Live paths, compacted (aligned with .hashes/.quality)."""
        m = self._live_mask
        return [p for i, p in enumerate(self._paths[:self._n]) if m[i]]

    # ----------------------------------------------------------- build
    def add(self, path: str, pdqhash: bytes | np.ndarray,
            quality: int | None = None):
        h = np.frombuffer(bytes(pdqhash), dtype=np.uint8)
        if h.size != self.nbytes:
            raise ValueError(f"hash must be {self.nbytes} bytes")
        with self._lock:
            if self._n == len(self._hashes):
                grow = max(1024, len(self._hashes))
                self._hashes = np.concatenate(
                    [self._hashes,
                     np.zeros((grow, self.nbytes), np.uint8)])
                self._quality = np.concatenate(
                    [self._quality, np.zeros(grow, np.int32)])
                self._dead = np.concatenate(
                    [self._dead, np.zeros(grow, bool)])
            self._hashes[self._n] = h
            self._quality[self._n] = 100 if quality is None else quality
            self._dead[self._n] = False
            self._paths.append(str(path))
            self._n += 1
            self._version += 1
            # device state stays valid: the new row syncs as an O(1)
            # append at the next query (_device_arrays)

    def remove(self, path: str) -> int:
        """Tombstone every entry whose path matches; returns count.
        Slots are reclaimed by compaction once >50% are dead."""
        path = str(path)
        with self._lock:
            removed = 0
            devs = [d for d in (self._dev, self._dev_mesh)
                    if d is not None]
            for i in range(self._n):
                if self._paths[i] == path and not self._dead[i]:
                    self._dead[i] = True
                    self._n_dead += 1
                    removed += 1
                    for dev in devs:
                        if i < dev["applied"]:
                            dev["pending_dead"].append(i)
            if removed:
                self._version += 1
            return removed

    def _compact_locked(self):
        """Rebuild host arrays to live rows (lock held).  Builds a NEW
        paths list object so snapshots captured against the old slot
        layout keep indexing the old (immutable-from-now-on) list."""
        keep = np.flatnonzero(self._live_mask)
        self._hashes = self._hashes[:self._n][keep].copy()
        self._quality = self._quality[:self._n][keep].copy()
        self._dead = np.zeros(len(keep), dtype=bool)
        self._paths = [self._paths[i] for i in keep]
        self._n = len(keep)
        self._n_dead = 0
        self._dev = None
        self._dev_mesh = None

    @classmethod
    def from_records(cls, records) -> "HashIndex":
        """Index from scan FileRecords (pipeline/scan.py output)."""
        ix = cls()
        for r in records:
            if r.pdqhash:
                ix.add(str(r.path), r.pdqhash, r.pdq_quality)
        return ix

    # --------------------------------------------------------- persist
    def save(self, path: str | Path):
        # paths as JSON bytes, not a pickled object array: loading an
        # untrusted pickle executes code, and index files may be shared.
        # Snapshot under the lock (an in-flight add must not tear the
        # hashes<->paths alignment) and write tmp+rename (a mid-write
        # interrupt must not truncate the live file).
        import os as _os
        with self._lock:
            hashes = self.hashes.copy()
            quality = self.quality.copy()
            pb = np.frombuffer(json.dumps(self.paths).encode(),
                               dtype=np.uint8)
        path = Path(path)
        tmp = path.with_suffix(path.suffix + ".tmp")
        with open(tmp, "wb") as fh:
            np.savez_compressed(fh, hashes=hashes, quality=quality,
                                paths_json=pb)
        _os.replace(tmp, path)

    @classmethod
    def load(cls, path: str | Path) -> "HashIndex":
        with np.load(path, allow_pickle=False) as z:
            if "paths_json" not in z.files:
                raise ValueError(
                    f"{path} was saved by an older version (pickled "
                    "paths); rebuild it: rupphash --serve DIR "
                    "--index-file NEW.npz")
            ix = cls(nbytes=z["hashes"].shape[1] if z["hashes"].size
                     else 32)
            n = len(z["hashes"])
            ix._hashes = np.ascontiguousarray(z["hashes"],
                                              dtype=np.uint8)
            ix._quality = np.ascontiguousarray(z["quality"],
                                               dtype=np.int32)
            ix._dead = np.zeros(n, dtype=bool)
            ix._paths = [str(p) for p in
                         json.loads(bytes(z["paths_json"]).decode())]
            ix._n = n
        return ix

    # ----------------------------------------------------------- query
    def _status_rows(self, lo: int, hi: int) -> np.ndarray:
        """(hi-lo,) int8 device status codes for host slots [lo, hi)."""
        st = np.where(self._quality[lo:hi] < PDQ_MIN_QUALITY,
                      STATUS_LOW, STATUS_OK).astype(np.int8)
        st[self._dead[lo:hi]] = STATUS_DEAD
        return st

    def _device_arrays(self, mesh=None):
        """(hashes_dev, status_dev, paths_list, n, live_rank, hsnap) —
        captured together under the lock so concurrent add/remove
        cannot shift the index<->path mapping mid-query.  live_rank
        maps device slots to positions in the live-compacted view
        (.hashes/.paths), so the public match 'index' is consistent
        across deployment modes and corpus mutations; hsnap is the
        slot-aligned host hash array backing exact-distance recompute.
        Syncs pending mutations with O(delta) upload traffic (see
        class docstring).  With a mesh, the same incremental machinery
        runs on arrays sharded over every device (capacity a multiple
        of 8 * ndev), so mesh serving also mutates in O(delta)."""
        import math as _math

        sharding = None
        unit = 8
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P
            sharding = NamedSharding(mesh, _P(("q", "b")))
            unit = 8 * _math.prod(mesh.shape.values())
        with self._lock:
            if self._n_dead > max(64, self._n // 2):
                self._compact_locked()
            dev = self._dev if mesh is None else self._dev_mesh
            if dev is not None and mesh is not None \
                    and dev.get("mesh") is not mesh:
                dev = None   # different mesh: rebuild
            if dev is None or self._n > dev["cap"]:
                # full (re-)push: first use, capacity growth, compaction
                cap = max(1024,
                          1 << max(0, (max(self._n, 1) - 1).bit_length()))
                cap = -(-cap // unit) * unit
                hp = np.zeros((cap, self.nbytes), np.uint8)
                hp[:self._n] = self._hashes[:self._n]
                st = np.full(cap, STATUS_DEAD, np.int8)
                st[:self._n] = self._status_rows(0, self._n)
                dev = {"h": _upload(hp, sharding),
                       "st": _upload(st, sharding),
                       "cap": cap, "applied": self._n,
                       "paths": self._paths, "pending_dead": [],
                       "hsnap": self._hashes, "mesh": mesh}
                if mesh is None:
                    self._dev = dev
                else:
                    self._dev_mesh = dev
            else:
                if dev["applied"] < self._n:
                    # O(delta): upload only the appended rows (padded to
                    # a power of two so the jit compiles per bucket, not
                    # per call; pad rows land beyond n and write DEAD)
                    start, n = dev["applied"], self._n
                    r = n - start
                    rpad = min(1 << (r - 1).bit_length(),
                               dev["cap"] - start)
                    rows = np.zeros((rpad, self.nbytes), np.uint8)
                    rows[:r] = self._hashes[start:n]
                    strows = np.full(rpad, STATUS_DEAD, np.int8)
                    strows[:r] = self._status_rows(start, n)
                    dev["h"], dev["st"] = _dev_write_rows(
                        dev["h"], dev["st"], _upload(rows),
                        _upload(strows), start)
                    dev["applied"] = n
                if dev["pending_dead"]:
                    # O(delta): upload only the tombstoned indices
                    k = len(dev["pending_dead"])
                    kpad = max(64, 1 << (k - 1).bit_length())
                    idx = np.full(kpad, dev["cap"], np.int32)
                    idx[:k] = dev["pending_dead"]
                    dev["st"] = _dev_kill_rows(dev["st"], _upload(idx))
                    dev["pending_dead"] = []
            if dev.get("rank_n") != (self._n, self._n_dead):
                # slot -> live-compacted position (host-side, rebuilt
                # only when the live set changed)
                alive = self._live_mask
                dev["rank"] = np.cumsum(alive) - 1
                dev["rank_n"] = (self._n, self._n_dead)
            dev["hsnap"] = self._hashes
            return (dev["h"], dev["st"], dev["paths"], self._n,
                    dev["rank"], dev["hsnap"])

    def query_mesh(self, mesh, variants: np.ndarray,
                   similarity: int = 40, max_results: int = 100):
        """Mesh-sharded query against the INCREMENTAL sharded corpus
        (same O(delta) mutation machinery as the single-device path):
        gated distances computed per shard, a device-side top-k over
        the full corpus row (parallel/sharded.sharded_query_topk_status)
        so device->host readback is O(Q x max_results), never O(Q x N)
        — the mesh mirror of the single-device _query_topk path.
        Match indices are live-compacted positions, identical to the
        single-device path."""
        if len(self) == 0:
            return [[] for _ in range(len(variants))]
        similarity = max(0, min(int(similarity), self.nbytes * 8 - 1))
        base_dev, st_dev, paths, n, rank, _hsnap = \
            self._device_arrays(mesh)
        fn = _mesh_query_fn(mesh)
        k = min(int(base_dev.shape[0]),
                max(16, 1 << (max(1, max_results) - 1).bit_length()))
        dists, idx = (np.asarray(a) for a in fn(
            _upload(np.ascontiguousarray(variants, dtype=np.uint8)),
            base_dev, st_dev, n, similarity, k))
        out = []
        for drow, irow in zip(dists, idx):
            sel = drow <= similarity    # sentinel rows never selected
            out.append([(int(rank[int(i)]), paths[int(i)], int(d))
                        for d, i in zip(drow[sel][:max_results],
                                        irow[sel][:max_results])])
        return out

    def query(self, variants: np.ndarray, similarity: int = 40,
              max_results: int = 100, mesh=None):
        """(Q, V, nbytes) query dihedral variants -> per-query matches
        [(index, path, distance), ...] sorted by distance.  Pass a
        jax.sharding.Mesh to run the corpus matmul sharded over it.

        similarity is clamped to [0, nbits-1]: the sentinels nbits+1
        (device padding rows) and the low-quality gate must never be
        selectable by a client-supplied radius."""
        similarity = max(0, min(int(similarity), self.nbytes * 8 - 1))
        if mesh is not None:
            return self.query_mesh(mesh, variants, similarity,
                                   max_results)
        if len(self) == 0:
            return [[] for _ in range(len(variants))]
        base_dev, status_dev, paths, n, rank, _ = self._device_arrays()
        q = np.ascontiguousarray(variants, dtype=np.uint8)
        # k buckets to a power of two so the jit caches a handful of
        # executables across max_results values
        k = min(int(base_dev.shape[0]),
                max(16, 1 << (max(1, max_results) - 1).bit_length()))
        dists, idx = (np.asarray(a) for a in _query_topk(
            _upload(q), base_dev, status_dev, n,
            self.nbytes * 8, k))
        out = []
        for drow, irow in zip(dists, idx):
            sel = drow <= similarity
            # report live-compacted positions (same index space as
            # .hashes/.paths and the mesh path), not device slots
            out.append([(int(rank[int(i)]), paths[int(i)], int(d))
                        for d, i in zip(drow[sel][:max_results],
                                        irow[sel][:max_results])])
        return out


@functools.lru_cache(maxsize=8)
def _mesh_query_fn(mesh):
    # keyed on the mesh ONLY: the client-supplied radius is a traced
    # operand inside the executable, so rotating similarity values
    # cannot force shard_map recompiles (see sharded_query_topk_status)
    from .parallel import sharded as shardedmod
    return shardedmod.sharded_query_topk_status(mesh)


class NearDupService:
    """Decode -> hash (TPU) -> index query, plus the HTTP surface."""

    # /v1/query accepts raw image bytes; cap at a realistic image size
    # (the previous 512 MB allowed a trivial memory DoS through
    # ThreadingHTTPServer)
    MAX_BODY = 64_000_000

    def __init__(self, index: HashIndex, similarity: int | None = 40,
                 roots=None, mesh=None, allow_hosts=()):
        self.index = index
        # mesh-sharded corpus residency (multi-chip serving); None =
        # single default device
        self.mesh = mesh
        # CLI leaves --similarity None until grouping resolves it; the
        # service uses the reference default 40 (phdupes.rs:195-282)
        self.similarity = 40 if similarity is None else int(similarity)
        self.queries = 0
        self._lock = threading.Lock()
        # /v1/add and /v1/remove only touch files under these roots:
        # unauthenticated callers must not be able to probe or index
        # arbitrary server-readable paths (--host 0.0.0.0 is supported)
        self.roots = [Path(r).resolve() for r in (roots or [])]
        # deployment names accepted in Host beyond IP literals /
        # localhost (utils/netguard DNS-rebinding gate; --allow-host)
        self.allow_hosts = tuple(allow_hosts or ())

    def path_allowed(self, path: str) -> bool:
        if not self.roots:
            return False
        try:
            p = Path(path).resolve()
        except (OSError, ValueError):
            # ValueError: embedded NUL byte — must 403, not traceback
            return False
        return any(p == r or r in p.parents for r in self.roots)

    def hash_bytes(self, data: bytes):
        """Image bytes -> (variants (8, 32) u8, quality) or None."""
        from .ops import pdq_jax
        from .pipeline import decode

        # same sniff tiering as the scanner's generic branch (incl.
        # HEIC/JXL/DNG/PDF by magic — queries arrive with no filename)
        img = decode.sniff_decode_bytes(data)
        if img is None:
            return None
        from .pipeline.decode import prepare_luma_fast
        luma = prepare_luma_fast(img)
        if luma is None:
            return None
        out = pdq_jax.pdq_hash_batch(np.asarray(luma)[None])
        # device quality is [0,1]; records/index use the reference's
        # 0-100 scale (scanner.rs quality<50 gate)
        return (np.asarray(out["dihedral"][0]),
                float(np.asarray(out["quality"][0])) * 100.0)

    def query_bytes(self, data: bytes, similarity: int | None = None,
                    max_results: int = 100):
        hashed = self.hash_bytes(data)
        if hashed is None:
            return None
        variants, quality = hashed
        sim = self.similarity if similarity is None else similarity
        if quality < PDQ_MIN_QUALITY:
            sim = 0  # low-quality query: exact only (scanner gate)
        matches = self.index.query(variants[None], sim, max_results,
                                   mesh=self.mesh)[0]
        with self._lock:
            self.queries += 1
        return {"quality": quality,
                "hash": bytes(variants[0]).hex(),
                "matches": [{"path": p, "distance": d, "index": i}
                            for i, p, d in matches]}

    def add_path(self, path: str):
        from .pipeline import decode

        img, _ = decode.load_image(path)
        if img is None:
            return None
        from .ops import pdq_jax
        from .pipeline.decode import prepare_luma_fast
        luma = prepare_luma_fast(img)
        if luma is None:
            return None
        out = pdq_jax.pdq_hash_batch(np.asarray(luma)[None])
        h = bytes(np.asarray(out["dihedral"][0][0]))
        q = float(np.asarray(out["quality"][0])) * 100.0  # 0-100 scale
        self.index.add(path, h, int(round(q)))
        return {"path": path, "hash": h.hex(), "quality": q,
                "size": len(self.index)}

    # ------------------------------------------------------------ http
    def make_handler(service):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, obj, code=200):
                self._send(code, json.dumps(obj).encode(),
                           "application/json")

            def _gate(self, mutating: bool) -> bool:
                """Browser-borne attack gates (utils/netguard):
                reject DNS-rebound Hosts everywhere, and reject
                Origin-bearing mutation requests — browsers attach
                Origin to cross-origin POSTs, curl/SDK clients do
                not, so CSRF is blocked without an API break."""
                from .utils import netguard

                if not netguard.host_allowed(
                        self.headers.get("Host", ""),
                        service.allow_hosts):
                    self._json({"error": "forbidden host (use an IP "
                                "literal, localhost, or start with "
                                "--allow-host NAME)"}, 403)
                    return False
                if mutating and self.headers.get("Origin"):
                    self._json({"error": "browser cross-origin "
                                "mutation blocked"}, 403)
                    return False
                return True

            def do_GET(self):
                u = urlparse(self.path)
                if not self._gate(mutating=False):
                    return
                if u.path == "/":
                    body = (
                        "<!DOCTYPE html><title>rupphash near-duplicate "
                        "service</title><pre>rupphash near-duplicate "
                        "lookup service\n\n"
                        "POST /v1/query[?similarity=D]  raw image bytes "
                        "-> JSON matches\n"
                        "POST /v1/add?path=P            hash + index a "
                        "local file\n"
                        "POST /v1/remove?path=P         drop a path "
                        "from the index\n"
                        "GET  /v1/stats                 index size / "
                        "query count\n\n"
                        "curl -s --data-binary @photo.jpg "
                        "http://HOST:PORT/v1/query | jq .</pre>"
                    ).encode()
                    self._send(200, body, "text/html; charset=utf-8")
                elif u.path == "/v1/stats":
                    self._json({"indexed": len(service.index),
                                "queries": service.queries,
                                "similarity": service.similarity})
                else:
                    self._json({"error": "not found"}, 404)

            def do_POST(self):
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if not self._gate(
                        mutating=u.path in ("/v1/add", "/v1/remove")):
                    return
                if u.path == "/v1/query":
                    try:
                        n = int(self.headers.get("Content-Length", "0"))
                    except ValueError:
                        n = -1
                    if n <= 0 or n > service.MAX_BODY:
                        self._json({"error": "bad length"}, 400)
                        return
                    data = self.rfile.read(n)
                    try:
                        sim = int(q.get("similarity",
                                        [service.similarity])[0])
                    except (ValueError, TypeError):
                        sim = service.similarity
                    out = service.query_bytes(data, sim)
                    if out is None:
                        self._json({"error": "undecodable image"}, 415)
                    else:
                        self._json(out)
                elif u.path == "/v1/remove":
                    path = q.get("path", [""])[0]
                    if path and not service.path_allowed(path):
                        self._json({"error": "path outside indexed "
                                    "roots"}, 403)
                        return
                    n = service.index.remove(path) if path else 0
                    self._json({"removed": n,
                                "size": len(service.index)})
                elif u.path == "/v1/add":
                    path = q.get("path", [""])[0]
                    if not service.path_allowed(path):
                        self._json({"error": "path outside indexed "
                                    "roots"}, 403)
                        return
                    if not path or not Path(path).is_file():
                        self._json({"error": "no such file"}, 404)
                        return
                    out = service.add_path(path)
                    if out is None:
                        self._json({"error": "undecodable image"}, 415)
                    else:
                        self._json(out)
                else:
                    self._json({"error": "not found"}, 404)

        return Handler

    def serve(self, host: str = "127.0.0.1", port: int = 0):
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        return httpd, httpd.server_address[1]


def run_serve(args) -> int:
    """CLI entry for `rupphash --serve`: scan the given paths into an
    index (or load --index-file) and answer queries until interrupted."""
    import sys

    from .pipeline import scan as scanmod

    if getattr(args, "index_file", None) and \
            Path(args.index_file).exists():
        index = HashIndex.load(args.index_file)
        print(f"loaded index: {len(index)} hashes from "
              f"{args.index_file}", file=sys.stderr)
    else:
        cfg = scanmod.ScanConfig()
        records, stats = scanmod.scan(args.paths, cfg, None)
        index = HashIndex.from_records(records)
        print(f"indexed {len(index)} images "
              f"({stats.failed} failures)", file=sys.stderr)
        if getattr(args, "index_file", None):
            index.save(args.index_file)
            print(f"saved index to {args.index_file}", file=sys.stderr)
    mesh = None
    try:
        import jax as _jax
        if len(_jax.devices()) > 1:
            from .parallel import sharded as _sharded
            mesh = _sharded.make_mesh()
            print(f"corpus sharded over {len(_jax.devices())} devices "
                  f"(mesh {dict(mesh.shape)})", file=sys.stderr)
    except Exception:
        mesh = None
    svc = NearDupService(index, similarity=args.similarity,
                         roots=list(getattr(args, "paths", []) or []),
                         mesh=mesh,
                         allow_hosts=tuple(
                             getattr(args, "allow_host", None) or ()))
    host = getattr(args, "host", "127.0.0.1")
    httpd, port = svc.serve(host=host,
                            port=getattr(args, "port", 0) or 0)
    print(f"near-duplicate service at http://{host}:{port}/v1/  "
          f"(POST /v1/query with image bytes)", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        if getattr(args, "index_file", None):
            # persist /v1/add mutations across restarts
            index.save(args.index_file)
            print(f"saved index ({len(index)} hashes) to "
                  f"{args.index_file}", file=sys.stderr)
    return 0
