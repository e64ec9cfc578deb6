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


@functools.partial(jax.jit, static_argnames=("nbits",))
def _query_min_dists(q_packed, base_packed, base_low, nbits):
    """(Q, V, nbytes) u8 query variants vs (N, nbytes) u8 base ->
    (Q, N) int32 min-over-variant Hamming distance, with low-quality
    base rows reported as nbits+1 unless the distance is exactly 0."""
    q, v, nbytes = q_packed.shape
    qv = hamming.unpack_bits_pm1(q_packed).reshape(q * v, nbits)
    base = hamming.unpack_bits_pm1(base_packed)
    dots = jax.lax.dot_general(qv, base.T, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    dist = (nbits - dots.reshape(q, v, -1).max(axis=1)) // 2
    gated = jnp.where(base_low[None, :] & (dist > 0), nbits + 1, dist)
    return gated


@functools.partial(jax.jit, static_argnames=("nbits", "k"))
def _query_topk(q_packed, base_packed, base_low, n_total, nbits, k):
    """Device-side selection: the k best (distance, corpus index) pairs
    per query instead of the full (Q, N) distance matrix — the
    readback is O(k) per query rather than O(N) (4 MB/query at a 1M
    corpus).  Rows past n_total (padding) report nbits+1; distance
    ties resolve to the lower corpus index (lax.top_k keeps first
    occurrences), matching the host-side stable sort it replaces."""
    gated = _query_min_dists(q_packed, base_packed, base_low, nbits)
    col = jnp.arange(gated.shape[1], dtype=jnp.int32)[None, :]
    gated = jnp.where(col >= n_total, nbits + 1, gated)
    neg, idx = jax.lax.top_k(-gated, k)
    return -neg, idx


class HashIndex:
    """Persistent (hashes, quality, paths) corpus index.

    Device residency: packed hashes are pushed to the default device on
    first query and re-pushed after mutation; adds are O(1) amortized
    via array doubling.
    """

    def __init__(self, nbytes: int = 32):
        self.nbytes = nbytes
        self._hashes = np.zeros((0, nbytes), dtype=np.uint8)
        self._quality = np.zeros(0, dtype=np.int32)
        self.paths: list[str] = []
        self._n = 0
        # (hashes_dev, low_dev, paths_snapshot, n) or None — the path
        # snapshot is captured with the arrays so concurrent add/remove
        # cannot shift the index<->path mapping mid-query
        self._device = None
        # mesh-sharded residency: (mesh, hashes_dev, low_dev, paths, n)
        self._device_mesh = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------ size
    def __len__(self) -> int:
        return self._n

    @property
    def hashes(self) -> np.ndarray:
        return self._hashes[:self._n]

    @property
    def quality(self) -> np.ndarray:
        return self._quality[:self._n]

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
            self._hashes[self._n] = h
            self._quality[self._n] = 100 if quality is None else quality
            self.paths.append(str(path))
            self._n += 1
            self._device = None  # re-push lazily
            self._device_mesh = None

    def remove(self, path: str) -> int:
        """Drop every entry whose path matches; returns count removed."""
        with self._lock:
            keep = [i for i in range(self._n)
                    if self.paths[i] != str(path)]
            removed = self._n - len(keep)
            if removed:
                idx = np.asarray(keep, dtype=np.int64)
                self._hashes = self._hashes[:self._n][idx].copy()
                self._quality = self._quality[:self._n][idx].copy()
                self.paths = [self.paths[i] for i in keep]
                self._n = len(keep)
                self._device = None
                self._device_mesh = None
            return removed

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
            ix.paths = [str(p) for p in
                        json.loads(bytes(z["paths_json"]).decode())]
            ix._n = n
        return ix

    # ----------------------------------------------------------- query
    def _device_arrays(self):
        """(hashes_dev, low_dev, paths_snapshot, n) — captured together
        under the lock so concurrent add/remove cannot shift the
        index<->path mapping mid-query."""
        with self._lock:
            if self._device is None:
                n = max(self._n, 8)
                pad = -(-n // 8) * 8
                hp = np.zeros((pad, self.nbytes), np.uint8)
                hp[:self._n] = self.hashes
                lowp = np.ones(pad, dtype=bool)
                lowp[:self._n] = self.quality < PDQ_MIN_QUALITY
                self._device = (jax.device_put(hp),
                                jax.device_put(lowp),
                                tuple(self.paths), self._n)
            return self._device

    def _device_arrays_mesh(self, mesh):
        """Mesh-sharded corpus residency: the ±1 base matrix split over
        every device so the corpus can exceed one chip's HBM."""
        import math as _math

        from jax.sharding import NamedSharding, PartitionSpec as _P

        with self._lock:
            cur = self._device_mesh
            if cur is None or cur[0] is not mesh:
                ndev = _math.prod(mesh.shape.values())
                pad = max(-(-max(self._n, 1) // (8 * ndev)) * (8 * ndev),
                          8 * ndev)
                hp = np.zeros((pad, self.nbytes), np.uint8)
                hp[:self._n] = self.hashes
                lowp = np.ones(pad, dtype=bool)
                lowp[:self._n] = self.quality < PDQ_MIN_QUALITY
                sh = NamedSharding(mesh, _P(("q", "b")))
                # hp rides along as the HOST snapshot for exact-distance
                # recompute: indices from these device arrays must never
                # be applied to live self.hashes (concurrent add/remove
                # compaction shifts rows)
                self._device_mesh = (mesh, jax.device_put(hp, sh),
                                     jax.device_put(lowp, sh),
                                     tuple(self.paths), self._n, hp)
            return self._device_mesh

    @staticmethod
    def _host_min_dists(variants: np.ndarray, hashes_snap: np.ndarray,
                        idx: np.ndarray) -> np.ndarray:
        """Exact min-over-variant distances for a few matched rows of
        the given corpus *snapshot* (same capture as the indices)."""
        vb = np.unpackbits(variants, axis=-1)            # (V, bits)
        bb = np.unpackbits(hashes_snap[idx], axis=-1)    # (M, bits)
        return (vb[:, None, :] != bb[None, :, :]).sum(-1).min(0)

    def query_mesh(self, mesh, variants: np.ndarray,
                   similarity: int = 40, max_results: int = 100):
        """Mesh-sharded query: packed match bitmasks from every device
        (parallel/sharded.sharded_query_masks), exact distances
        recomputed host-side for the (few) matched rows only."""
        if self._n == 0:
            return [[] for _ in range(len(variants))]
        similarity = max(0, min(int(similarity), self.nbytes * 8 - 1))
        _, base_dev, low_dev, paths, n, hsnap = \
            self._device_arrays_mesh(mesh)
        fn = _mesh_query_fn(mesh, similarity)
        masks = np.asarray(fn(jax.device_put(
            np.ascontiguousarray(variants, dtype=np.uint8)),
            base_dev, low_dev))
        out = []
        for qi in range(len(variants)):
            bits = np.unpackbits(masks[qi], bitorder="little")[:n]
            hit = np.flatnonzero(bits)
            if hit.size == 0:
                out.append([])
                continue
            d = self._host_min_dists(variants[qi], hsnap, hit)
            order = np.argsort(d, kind="stable")[:max_results]
            out.append([(int(hit[k]), paths[int(hit[k])], int(d[k]))
                        for k in order])
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
        if self._n == 0:
            return [[] for _ in range(len(variants))]
        base_dev, low_dev, paths, n = self._device_arrays()
        q = np.ascontiguousarray(variants, dtype=np.uint8)
        # k buckets to a power of two so the jit caches a handful of
        # executables across max_results values
        k = min(int(base_dev.shape[0]),
                max(16, 1 << (max(1, max_results) - 1).bit_length()))
        dists, idx = (np.asarray(a) for a in _query_topk(
            jax.device_put(q), base_dev, low_dev, n,
            self.nbytes * 8, k))
        out = []
        for drow, irow in zip(dists, idx):
            sel = drow <= similarity
            out.append([(int(i), paths[int(i)], int(d))
                        for d, i in zip(drow[sel][:max_results],
                                        irow[sel][:max_results])])
        return out


@functools.lru_cache(maxsize=8)
def _mesh_query_fn(mesh, similarity: int):
    from .parallel import sharded as shardedmod
    return shardedmod.sharded_query_masks(mesh, similarity)


class NearDupService:
    """Decode -> hash (TPU) -> index query, plus the HTTP surface."""

    # /v1/query accepts raw image bytes; cap at a realistic image size
    # (the previous 512 MB allowed a trivial memory DoS through
    # ThreadingHTTPServer)
    MAX_BODY = 64_000_000

    def __init__(self, index: HashIndex, similarity: int | None = 40,
                 roots=None, mesh=None):
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

    def path_allowed(self, path: str) -> bool:
        if not self.roots:
            return False
        try:
            p = Path(path).resolve()
        except OSError:
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

            def do_GET(self):
                u = urlparse(self.path)
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
                         mesh=mesh)
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
