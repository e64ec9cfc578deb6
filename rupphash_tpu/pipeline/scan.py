"""Scan orchestration: walk -> cache probe -> decode -> TPU hash -> group.

The TPU-first analogue of scan_and_group (scanner.rs:1146-1580):

  * a host thread pool decodes and preps luma planes (PIL releases the
    GIL; pool sized from RAM like init_smart_limits, scanner.rs:59-105)
  * decoded planes accumulate in *shape buckets*; each full bucket is one
    fused-PDQ device batch (ops/pdq_jax.py) — same-shape batching keeps
    XLA shapes static and the MXU busy
  * cache probing mirrors the reference tiers (scanner.rs:1202-1521):
    meta_key hit -> reuse content_hash -> reuse pdqhash/coeffs/features;
    miss -> read, EXIF, keyed content hash, decode, optional pixel hash,
    hash on TPU; every product streams to the cache writer thread
  * grouping runs on the MXU edge search + host clustering
    (grouping/engine.py)
"""

from __future__ import annotations

import dataclasses
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from ..grouping import engine
from ..ops import pdq_jax, pdq_ref
from ..utils import hashes as H
from ..utils import trace
from . import decode, exif, walker


@dataclasses.dataclass
class ScanConfig:
    similarity: int = engine.DEFAULT_SIMILARITY
    pixel_hash: bool = False
    rehash: bool = False
    sort: str = "name"
    batch_size: int = 256
    workers: int | None = None
    recursive: bool = True


@dataclasses.dataclass
class ScanStats:
    total: int = 0
    cache_full: int = 0
    cache_partial: int = 0
    decoded: int = 0
    failed: int = 0
    hashed: int = 0


def _default_workers() -> int:
    """RAM-aware sizing (scanner.rs:59-105): ~1.5 GiB budget per decode,
    75% of RAM, clamped to core count."""
    cores = os.cpu_count() or 4
    try:
        pages = os.sysconf("SC_PHYS_PAGES")
        page = os.sysconf("SC_PAGE_SIZE")
        ram = pages * page
    except (ValueError, OSError):
        return cores
    budget = int(ram * 0.75 / (1.5 * 2**30))
    return max(1, min(cores, budget))


def _prep_one(path: Path, cfg: ScanConfig, store):
    """Per-file host work (one pool task).  Returns a dict:
    {record, luma|None, cached: bool} or None on failure."""
    try:
        fid, size, mtime_ns = H.file_identity(path)
    except OSError:
        return None

    rec = engine.FileRecord(path=path, size=size, modified=mtime_ns / 1e9,
                            unique_file_id=fid)
    mkey = store.compute_meta_key(mtime_ns, size, fid) if store else None

    content = None
    if store and not cfg.rehash:
        content = store.get_meta(mkey)
    cached = False
    if content is not None:
        rec.content_hash = content
        got = store.get_pdqhash(content)
        feats = store.get_features(content)
        coeffs = store.get_coefficients(content)
        px = store.get_pixel_hash(content) if cfg.pixel_hash else None
        if got and feats is not None and (not cfg.pixel_hash or px):
            trace.count("CACHE-FULL")
            trace.debug("CACHE-FULL", str(path))
            pdq, quality = got
            rec.pdqhash = pdq
            rec.pdq_quality = quality
            rec.pixel_hash = px
            rec.resolution = (feats.get("width", 0), feats.get("height", 0))
            rec.orientation = feats.get("orientation", 1)
            rec.gps_pos = tuple(feats["gps"]) if feats.get("gps") else None
            rec.exif_timestamp = feats.get("exif_timestamp")
            if coeffs is not None:
                rec.coeffs = coeffs
                rec.dihedral = np.stack(
                    [np.frombuffer(h, dtype=np.uint8)
                     for h in pdq_ref.dihedral_hashes(coeffs)])
            store.put_meta(mkey, content)  # refresh timestamp
            return {"record": rec, "luma": None, "cached": True}

    # cache miss: full read + decode
    trace.count("CACHE-PARTIAL" if content is not None else "CACHE-MISS")
    trace.debug("CACHE-PARTIAL" if content is not None else "CACHE-MISS",
                str(path))
    try:
        data = path.read_bytes()
    except OSError:
        return None
    if store:
        rec.content_hash = H.content_hash(store.content_key, data)
        if content is None:
            store.put_meta(mkey, rec.content_hash)
    else:
        rec.content_hash = H.keyed_hash(b"\x00" * 32, data)

    feats = exif.extract(path, data=data)
    rec.orientation = feats.get("orientation", 1)
    rec.gps_pos = tuple(feats["gps"]) if feats.get("gps") else None
    rec.exif_timestamp = feats.get("exif_timestamp")

    img, res = decode.load_image(path, data=data)
    if img is None:
        return {"record": rec, "luma": None, "cached": False,
                "features": feats, "decode_failed": True}
    rec.resolution = res
    feats["width"], feats["height"] = res

    if cfg.pixel_hash and store:
        rec.pixel_hash = H.pixel_hash_rgba16(store.content_key, img)
        store.put_pixel_hash(rec.content_hash, rec.pixel_hash)

    luma = pdq_ref.prepare_luma(img)
    return {"record": rec, "luma": luma, "cached": False,
            "features": feats}


def scan(paths, cfg: ScanConfig | None = None, store=None,
         progress=None):
    """Scan paths, hash on device, and return
    (records: list[FileRecord], stats: ScanStats)."""
    cfg = cfg or ScanConfig()
    files = walker.collect_files(paths, recursive=cfg.recursive)
    stats = ScanStats(total=len(files))
    workers = cfg.workers or _default_workers()

    # hardlink dedup: decode/hash one path per (dev, inode); clones get
    # their results copied afterwards (scanner.rs:1526-1540)
    fid_first: dict[int, Path] = {}
    hardlink_clones: dict[Path, Path] = {}  # clone path -> representative
    scan_files = []
    for p in files:
        try:
            fid, _, _ = H.file_identity(p)
        except OSError:
            continue
        if fid in fid_first:
            hardlink_clones[p] = fid_first[fid]
        else:
            fid_first[fid] = p
            scan_files.append(p)
    files = scan_files

    records: list[engine.FileRecord] = []
    buckets: dict[tuple, list] = {}   # (rows, cols) -> [(rec, luma, feats)]
    done = 0

    def apply_outputs(items, out):
        hashes = np.asarray(out["hash"])
        dihedral = np.asarray(out["dihedral"])
        quality = np.asarray(out["quality"])
        coeffs = np.asarray(out["coeffs"])
        for k, (rec, _, feats) in enumerate(items):
            rec.pdqhash = bytes(hashes[k])
            rec.pdq_quality = int(round(float(quality[k]) * 100))
            rec.dihedral = dihedral[k]
            rec.coeffs = coeffs[k]
            stats.hashed += 1
            if store:
                store.put_pdqhash(rec.content_hash, rec.pdqhash,
                                  rec.pdq_quality)
                store.put_coefficients(rec.content_hash, coeffs[k])
                if feats is not None:
                    feats["pdq_quality"] = rec.pdq_quality
                    store.put_features(rec.content_hash, feats)

    def flush_bucket(shape):
        items = buckets.pop(shape, [])
        if not items:
            return
        lumas = np.stack([l for _, l, _ in items])
        apply_outputs(items, pdq_jax.pdq_hash_batch(lumas))

    with ThreadPoolExecutor(max_workers=workers) as pool:
        for result in pool.map(lambda p: _prep_one(p, cfg, store), files):
            done += 1
            if progress:
                progress(done, len(files))
            if result is None:
                stats.failed += 1
                continue
            rec = result["record"]
            if result.get("decode_failed"):
                stats.failed += 1
                if store and result.get("features") is not None:
                    store.put_features(rec.content_hash, result["features"])
                continue
            records.append(rec)
            if result["cached"]:
                stats.cache_full += 1
                continue
            stats.decoded += 1
            luma = result["luma"]
            if luma is None:
                continue
            shape = luma.shape
            buckets.setdefault(shape, []).append(
                (rec, luma, result.get("features")))
            if len(buckets[shape]) >= cfg.batch_size:
                flush_bucket(shape)

    # leftovers: full buckets already flushed inline; combine underfull
    # shape buckets into mixed-shape padded batches (one compile per
    # padded bucket instead of one per exact shape)
    leftover = [item for shape in list(buckets)
                for item in buckets.pop(shape)]
    for i in range(0, len(leftover), cfg.batch_size):
        chunk = leftover[i:i + cfg.batch_size]
        if not chunk:
            continue
        if len({it[1].shape for it in chunk}) == 1:
            lumas = np.stack([l for _, l, _ in chunk])
            apply_outputs(chunk, pdq_jax.pdq_hash_batch(lumas))
        else:
            apply_outputs(chunk, pdq_jax.pdq_hash_batch_mixed(
                [l for _, l, _ in chunk]))

    # materialize hardlink clones with the representative's results
    if hardlink_clones:
        by_path = {r.path: r for r in records}
        for clone, rep_path in hardlink_clones.items():
            rep = by_path.get(rep_path)
            if rep is None:
                continue
            records.append(dataclasses.replace(rep, path=clone))
            stats.total += 0  # already counted in the walk

    if store:
        store.flush()
    return records, stats


def scan_and_group(paths, cfg: ScanConfig | None = None, store=None,
                   progress=None):
    """Full pipeline: scan + hash + group.  Returns
    (groups, infos, records, stats) — the analogue of
    scanner::scan_and_group (scanner.rs:1146).  Phase timings go to
    stderr as [TIMING] lines (scanner.rs:1542-1559)."""
    cfg = cfg or ScanConfig()
    with trace.Phase("scan+hash") as ph:
        records, stats = scan(paths, cfg, store, progress)
        ph.add(stats.total)
    with trace.Phase("group") as pg:
        groups, infos, edges = engine.group_files(
            records, similarity=cfg.similarity, sort_order=cfg.sort)
        pg.add(len(records))
    trace.debug("SCAN", f"cache counters: {trace.counters()}")
    return groups, infos, records, stats
