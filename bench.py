#!/usr/bin/env python
"""Headline benchmark: fused PDQ hashing throughput (images/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.md target of 100,000
images/s/chip on TPU v5e (the reference CPU does ~233 images/s/core,
NOTES.txt:42-44).  Secondary numbers (grouping pair throughput, parity)
go to stderr.

Methodology: device-resident input batches (the production scan loop
streams batches asynchronously while the previous batch hashes, so steady
state is kernel-bound), median of repeated timed runs, parity asserted
against the numpy golden before timing.
"""

import json
import os
import sys
import time
from pathlib import Path


import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_pdq(batch=2048, rows=512, cols=288, iters=20):
    import jax

    from rupphash_tpu.ops import pdq_jax, pdq_ref

    # parity gate on the reference fixture (if present)
    try:
        from PIL import Image
        img = np.asarray(Image.open(
            "/root/reference/tests/bench.jpg").convert("RGB"))
        luma = pdq_ref.prepare_luma(img)
        gold, gold_q = pdq_ref.generate_pdq(img)
        out = pdq_jax.pdq_hash_batch(luma[None])
        dist = pdq_ref.hamming_distance(bytes(np.asarray(out["hash"][0])), gold)
        log(f"parity: bench.jpg hamming={dist} quality_ok="
            f"{abs(float(out['quality'][0]) - gold_q) < 1e-6}")
        assert dist == 0, "parity failure vs golden"
    except (FileNotFoundError, ImportError, OSError) as e:
        # fixture or PIL unavailable: the headline JSON line must
        # still print (CLAUDE.md contract); AssertionError (true
        # parity breakage) still aborts
        log(f"parity: gate skipped ({type(e).__name__})")

    # Timing protocol: the device executes dispatches FIFO, so N async
    # dispatches followed by ONE host readback of the last result bounds
    # the wall time of all N batches.  (block_until_ready can ack early
    # through remote-TPU relays, so a forced readback is the only honest
    # fence; distinct input buffers defeat any result memoization.)
    # Inputs are generated ON DEVICE so a slow host<->TPU tunnel cannot
    # pollute the kernel-throughput measurement.
    #
    # Batch size (round 5, closes the r2-r4 "drift" investigation): at
    # batch=1024 the kernel finishes in ~2.5 ms while each async
    # dispatch's command send over the axon tunnel costs 2.4-3.4 ms —
    # the pipeline is DISPATCH-bound, so the published number tracked
    # tunnel weather, not the kernel (425k -> 416k -> 377k -> 304k
    # across rounds with same-day swings of 370-407k; all reproduce as
    # dispatch latency).  At batch=2048 the kernel (~3.4 ms) covers the
    # command latency and the measurement goes kernel-bound: ~600k
    # img/s with ~1.6% spread (vs ~10% when dispatch-bound); 4096
    # measures slightly lower (HBM pressure), so 2048 is the production
    # hashing batch.  A dispatch-bound run is detectable from the JSON:
    # its spread is wide and value * dispatch_ms / batch ~ 1.
    import jax.numpy as jnp

    fn = pdq_jax._jitted_core(rows, cols)

    @jax.jit
    def make_batch(key):
        return jax.random.randint(key, (batch, rows, cols), 0, 256,
                                  dtype=jnp.int32).astype(jnp.uint8)

    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    bufs = [make_batch(k) for k in keys]
    np.asarray(fn(bufs[0])["hash"][0, 0])   # warm/compile + fence

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for k in range(iters):
            out = fn(bufs[k % 4])
        np.asarray(out["hash"][0, 0])        # FIFO fence
        times.append((time.perf_counter() - t0) / iters)
    dt = float(np.median(times))
    # rate per run, slowest first: the headline JSON publishes
    # median/spread/k/runs so a regression and tunnel weather are
    # distinguishable from the JSON alone (round-4 verdict weak #2)
    rates = sorted(batch / t for t in times)
    stats = _median_spread(rates)
    stats["batch"] = batch   # a dispatch-bound rerun is diagnosable
    return batch / dt, stats


def bench_grouping(n=100_000, iters=3):
    """Secondary: fused Pallas all-pairs count sweep over n random 256-bit
    hashes with 8 dihedral variants each (the production configuration).
    Each sweep ends in a host readback of the count vector (honest fence)."""
    import jax
    import jax.numpy as jnp

    from rupphash_tpu.ops import hamming_pallas

    ta, tb = hamming_pallas.QUERY_TILE, hamming_pallas.BASE_TILE
    npad = max(ta, tb)
    npad = -(-n // npad) * npad
    npad = -(-npad // ta) * ta
    npad = -(-npad // tb) * tb

    @jax.jit
    def make_vars(key):
        bits = jax.random.bernoulli(key, 0.5, (8, npad, 256))
        return (bits.astype(jnp.int8) << 1) - 1

    bufs = [make_vars(k) for k in jax.random.split(jax.random.PRNGKey(1), 2)]
    low_d = jax.device_put(np.zeros((npad, 1), dtype=np.int32))

    def sweep(k):
        # tiny readback slice: fences the kernel without streaming the
        # whole count vector through a (possibly slow) host tunnel
        return np.asarray(hamming_pallas.scan_row_counts(
            bufs[k % 2], low_d, nbits=256, sim=31, n_total=n)[0, 0])

    sweep(0)
    sweep(1)
    t0 = time.perf_counter()
    for k in range(iters):
        sweep(k)
    dt = (time.perf_counter() - t0) / iters
    pairs = n * (n - 1) // 2 * 8
    return pairs / dt, dt


def bench_grouping_1m(iters=2):
    """The BASELINE grouping scenario, driver-visible: 1M x 256-bit
    hashes, 8 dihedral variants, full upper-triangle count sweep on ONE
    chip.  The multi-chip row-count sweep (parallel/sharded.py) is the
    same tile math partitioned disjointly over the ('q','b') mesh with
    one hash all-gather (8 MB over ICI), so v5e-8 wall clock is
    single-chip-compute/8 + gather; we report measured single-chip time
    and that projection."""
    import jax
    import jax.numpy as jnp

    from rupphash_tpu.ops import hamming_pallas

    n = 1_000_000
    ta, tb = hamming_pallas.QUERY_TILE, hamming_pallas.BASE_TILE
    npad = -(-n // ta) * ta
    npad = -(-npad // tb) * tb

    @jax.jit
    def make_vars(key):
        bits = jax.random.bernoulli(key, 0.5, (8, npad, 256))
        return (bits.astype(jnp.int8) << 1) - 1

    buf = make_vars(jax.random.PRNGKey(2))
    low_d = jax.device_put(np.zeros((npad, 1), dtype=np.int32))

    def sweep():
        return np.asarray(hamming_pallas.scan_row_counts(
            buf, low_d, nbits=256, sim=31, n_total=n)[0, 0])

    sweep()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        sweep()
    dt = (time.perf_counter() - t0) / iters
    return dt


def bench_grouping_1m_e2e():
    """End-to-end production grouping at the BASELINE scale: 1M packed
    256-bit hashes with 8 dihedral variants each and 2000 injected
    duplicate triples, host in -> (i, j) edges + union-find groups out
    via ops/hamming.find_edges_fast (packed device ship + on-device
    +/-1 unpack, fused count sweep, hot-row extraction).  Returns
    (seconds, n_edges, n_groups)."""
    import time as _t

    from rupphash_tpu import native
    from rupphash_tpu.ops import hamming

    n, k = 1_000_000, 2000
    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    # 2000 clusters of 3 (first 6000 rows, shuffled positions)
    pos = rng.permutation(n)[:3 * k]
    for c in range(k):
        base[pos[3 * c + 1]] = base[pos[3 * c]]
        base[pos[3 * c + 2]] = base[pos[3 * c]]
    variants = np.repeat(base[:, None, :], 8, axis=1)
    low = np.zeros(n, dtype=bool)

    # warm call compiles the unpack/sweep/extract executables (first
    # compiles behind the axon tunnel take tens of seconds and are a
    # one-time cost any long-lived scanner amortizes); each timed run
    # still pays the full host->device hash transfer.  Tunnel transfer
    # latency varies 2x run-to-run (CLAUDE.md), so each configuration
    # runs median-of-k (k=3, bounded by a wall-clock budget so the
    # driver's overall timeout holds) with the spread reported —
    # round-3 verdict weak #1: regression vs tunnel weather must be
    # answerable from the JSON alone.
    hamming.find_edges_fast(base, variants, low, similarity=31)
    times = []
    budget_t0 = _t.perf_counter()
    for _ in range(3):
        t0 = _t.perf_counter()
        ei, ej = hamming.find_edges_fast(base, variants, low,
                                         similarity=31)
        parent = native.union_find_roots(n, ei, ej)
        times.append(_t.perf_counter() - t0)
        if _t.perf_counter() - budget_t0 > 120:
            break
    host_stats = _median_spread(times)
    log(f"  e2e runs (host-in): {host_stats}")
    n_groups = len({int(parent[i]) for i in np.concatenate([ei, ej])}) \
        if len(ei) else 0

    # The production scan->group configuration: the 8 dihedral hashes
    # were computed ON DEVICE by the hashing stage and never left the
    # chip, so grouping pays zero hash re-upload.  The host-in number
    # above additionally pays a ~256 MB variant ship, which through the
    # axon tunnel is transfer-bound (not device-bound) — on a
    # co-located host that transfer is PCIe-speed noise.
    import jax
    var_dev = jax.device_put(variants)
    jax.block_until_ready(var_dev)
    hamming.find_edges_fast_resident(var_dev, low, similarity=31)
    rtimes = []
    budget_t0 = _t.perf_counter()
    for _ in range(3):
        t0 = _t.perf_counter()
        ei2, ej2 = hamming.find_edges_fast_resident(var_dev, low,
                                                    similarity=31)
        native.union_find_roots(n, ei2, ej2)
        rtimes.append(_t.perf_counter() - t0)
        if _t.perf_counter() - budget_t0 > 90:
            break
    res_stats = _median_spread(rtimes)
    log(f"  e2e runs (device-resident): {res_stats}")
    assert len(ei2) == len(ei), "resident path edge-count mismatch"
    return host_stats, res_stats, int(len(ei)), n_groups


def _median_spread(runs):
    """{median, spread, k, runs}: spread = max - min, the honesty
    fields the round-3 verdict asked for (a regression and tunnel
    weather must be distinguishable from the JSON alone)."""
    return {"median": round(float(np.median(runs)), 2),
            "spread": round(float(max(runs) - min(runs)), 2),
            "k": len(runs),
            "runs": [round(float(t), 2) for t in runs]}


def bench_scan_e2e(n_images=752, k=3):
    """Decode-fed end-to-end scan benchmark (SURVEY §7 hard part #4):
    walk -> decode -> hash -> cache on a generated JPEG corpus (large
    enough that pool spin-up and first-batch compile wait amortize),
    then warm-cache rescans.  Each cold run uses a FRESH cache.
    Returns (cold_stats, warm_stats, profile) where the stats are
    _median_spread dicts of images/s and profile is the per-stage
    host-loop breakdown (ScanStats.stage_s) of the LAST cold run in ms
    per image — the whole-scan analogue of bench_decode_profile
    (round-4 verdict item 1).

    Methodology (round-4 verdict item 2): the PDQ batch executable is
    compiled on a dummy batch BEFORE run 1 (n_images+dups is an exact
    multiple of the 256 batch size so only that one shape runs), so no
    run pays jit-compile/tunnel-first-contact wait and cold runs
    measure the scan, not the compiler.

    Caveat (CLAUDE.md): this box exposes ONE host core, so the decode
    side of the cold number is a single-core figure — the reference's
    comparable number is 233 images/s/core (NOTES.txt:42-44,
    4.286 ms/image); production hosts scale it by their core count via
    the scan process pool.  The cached rescan is stat+probe bound and
    matches the README's ~1,600 files/s claim shape (README.md:67)."""
    import shutil
    import tempfile

    from PIL import Image

    from rupphash_tpu.cache.store import CacheStore
    from rupphash_tpu.ops import pdq_jax
    from rupphash_tpu.pipeline import scan as scanmod

    tmp = Path(tempfile.mkdtemp(prefix="rupbench_"))
    try:
        rng = np.random.default_rng(7)
        # textured 320x240-class JPEGs (quality>=50 so grouping is
        # exercised realistically); a handful of duplicate pairs.
        # 752 + 16 dups = 768 = 3 full 256-batches: no leftover batch,
        # so the dummy-batch warm-up below covers every shape the scan
        # compiles.
        for i in range(n_images):
            px = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
            im = Image.fromarray(px).resize((320, 240), Image.BILINEAR)
            im.save(tmp / f"img_{i:04d}.jpg", quality=90)
            if i % 50 == 0:
                im.save(tmp / f"img_{i:04d}_dup.jpg", quality=85)
        total = len(list(tmp.glob("*.jpg")))

        # pre-warm: compile the (256, 240, 320) hashing executable so
        # run 1 is not a compiler benchmark
        np.asarray(pdq_jax.pdq_hash_batch(
            np.zeros((256, 240, 320), dtype=np.uint8))["hash"][0])

        cfg = scanmod.ScanConfig(workers=1)
        cold_rates, warm_rates = [], []
        profile = {}
        for run in range(k):
            store = CacheStore(tmp / f"cache_{run}.db",
                               master_key=b"\x05" * 32)
            t0 = time.perf_counter()
            records, stats = scanmod.scan([tmp], cfg, store)
            cold_rates.append(total / (time.perf_counter() - t0))
            assert stats.failed == 0 and len(records) == total
            profile = {f"{name}_ms_per_img": round(v / total * 1000, 3)
                       for name, v in stats.stage_s.items()}
            store.flush()
            t0 = time.perf_counter()
            records2, stats2 = scanmod.scan([tmp], cfg, store)
            warm_rates.append(total / (time.perf_counter() - t0))
            assert stats2.cache_full == total, \
                f"rescan missed cache: {stats2}"
            store.close()
        return (_median_spread(cold_rates), _median_spread(warm_rates),
                profile)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_scan_e2e_cpu_backend():
    """The same scan e2e in a CPU-backend subprocess: the host loop
    with the axon tunnel taken out of the picture.  The TPU-backend
    number above folds tunnel weather into every stage (the 19.6 MB
    luma uploads share one wire with the output readbacks and one CPU
    core with the decoder; observed same-minute swings of 108-402
    img/s), so this companion figure is what separates "the host loop
    regressed" from "the tunnel had a bad minute" — on a co-located
    production host the transfer is PCIe-speed noise and the CPU
    figure's host loop is the binding one.  Returns (cold_stats,
    warm_stats) parsed from the subprocess's JSON line."""
    import subprocess
    import sys

    code = (
        "import os, json\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import bench\n"
        "cold, warm, prof = bench.bench_scan_e2e()\n"
        "print(json.dumps({'cold': cold, 'warm': warm}))\n"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RUPPHASH_PLATFORM"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=300, cwd=str(Path(__file__).parent))
    if out.returncode != 0:
        raise RuntimeError(f"cpu scan subprocess failed: {out.stderr[-400:]}")
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    return payload["cold"], payload["warm"]


def bench_decode_profile(n=64, chip_ips=None):
    """Per-stage host decode profile + feed model (round-3 verdict
    weak #4 / reference NOTES.txt:42-48 analogue): for each format
    class, time the cold-scan stages — file read, keyed blake2b, EXIF
    sweep, image decode, luma+<=512 box resample — per image on one
    host core, and derive the chips-fed-per-host-core model against
    the measured chip hash rate."""
    import shutil
    import tempfile

    from PIL import Image

    from rupphash_tpu.pipeline import decode as decmod
    from rupphash_tpu.pipeline import exif as exifmod
    from rupphash_tpu.utils import hashes as H

    tmp = Path(tempfile.mkdtemp(prefix="rupprof_"))
    profile = {}
    try:
        rng = np.random.default_rng(11)
        classes = {
            "jpeg_320x240": ("jpg", {"quality": 90}, (320, 240)),
            "jpeg_4mp": ("jpg", {"quality": 90}, (2304, 1728)),
            "png_320x240": ("png", {}, (320, 240)),
            "webp_320x240": ("webp", {"quality": 90}, (320, 240)),
        }
        key = b"\x06" * 32
        for name, (ext, kw, size) in classes.items():
            count = n if size[0] <= 640 else max(8, n // 8)
            paths = []
            for i in range(count):
                px = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
                im = Image.fromarray(px).resize(size, Image.BILINEAR)
                p = tmp / f"{name}_{i:03d}.{ext}"
                im.save(p, **kw)
                paths.append(p)
            # JPEGs/PNGs take the fused probes in production (rows ->
            # luma/resample accumulators, native/jpegfast.py +
            # pngfast.py): decode and luma_resize collapse into one
            # stage, reported under decode_ms with fused=True
            from rupphash_tpu.native import jpegfast, pngfast, webpfast
            if ext == "jpg" and jpegfast.available():
                fused_probe = jpegfast.probe_luma
            elif ext == "png" and pngfast.available():
                fused_probe = pngfast.probe_luma
            elif ext == "webp" and webpfast.available():
                fused_probe = webpfast.probe_luma
            else:
                fused_probe = None
            fused = fused_probe is not None
            stages = {"read": 0.0, "blake2b": 0.0, "exif": 0.0,
                      "decode": 0.0, "luma_resize": 0.0}
            for p in paths:
                t0 = time.perf_counter()
                data = p.read_bytes()
                t1 = time.perf_counter()
                H.content_hash(key, data)
                t2 = time.perf_counter()
                exifmod.extract(p, data=data)
                t3 = time.perf_counter()
                if fused:
                    assert fused_probe(data) is not None
                    t4 = t5 = time.perf_counter()
                else:
                    img, _res = decmod.load_image(p, data=data)
                    t4 = time.perf_counter()
                    decmod.prepare_luma_fast(img)
                    t5 = time.perf_counter()
                stages["read"] += t1 - t0
                stages["blake2b"] += t2 - t1
                stages["exif"] += t3 - t2
                stages["decode"] += t4 - t3
                stages["luma_resize"] += t5 - t4
            total_s = sum(stages.values())
            entry = {f"{k}_ms": round(v / count * 1000, 3)
                     for k, v in stages.items()}
            if fused:
                entry["fused"] = True
            entry["total_ms"] = round(total_s / count * 1000, 3)
            entry["images_per_s_per_core"] = round(count / total_s, 1)
            profile[name] = entry
        if chip_ips:
            # feed model: host cores needed to keep ONE chip at its
            # measured hash rate, per format class; multihost DCN
            # sharding (parallel/multihost.py) is how the scan spreads
            # those cores across hosts
            profile["feed_model"] = {
                f"cores_per_chip_{name}": round(
                    chip_ips / v["images_per_s_per_core"], 1)
                for name, v in profile.items()
                if "images_per_s_per_core" in v}
            profile["feed_model"]["chip_images_per_s"] = round(chip_ips)
        return profile
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    # Liveness gate BEFORE anything touches device init: a dead axon
    # tunnel hangs jax.devices() forever inside the global backend lock
    # (observed as a multi-hour outage), which would mean no JSON line
    # at all — worse than an honestly-labelled CPU number.  The probe
    # runs in a subprocess (utils/backendprobe.py); on failure the
    # process pins itself to the CPU backend and shrinks the workload.
    probe_s = float(os.environ.get("RUPPHASH_BENCH_PROBE_S", "150"))
    from rupphash_tpu.utils import backendprobe
    backend_status = backendprobe.ensure_backend_alive(
        timeout_s=probe_s, log=log, use_ttl=False)
    cpu_fallback = backend_status == "cpu-fallback"

    # persistent XLA compile cache: cold compiles over the axon tunnel
    # cost minutes; after the first bench run every kernel starts hot
    from rupphash_tpu.utils import jaxcache
    jaxcache.enable()

    import jax
    log(f"backend={jax.default_backend()} devices={jax.devices()} "
        f"probe={backend_status}")

    # wall-clock budget for the EXTRAS: the driver runs this script
    # under a timeout, and tunnel weather can stretch first compiles
    # by minutes — once the headline number is measured, every extra
    # is optional and the JSON line must always land.  Each skip is
    # logged (no silent caps).
    import time as _time
    _t0 = _time.perf_counter()
    _budget = float(os.environ.get("RUPPHASH_BENCH_BUDGET_S", "420"))

    def over_budget(name: str) -> bool:
        el = _time.perf_counter() - _t0
        if el > _budget:
            log(f"SKIPPED {name}: wall-clock budget exhausted "
                f"({el:.0f}s > {_budget:.0f}s) — rerun with "
                f"RUPPHASH_BENCH_BUDGET_S to widen")
            return True
        return False

    # Mid-stage watchdog: over_budget only fires BETWEEN stages, but a
    # degraded device can stall INSIDE one (observed 2026-08-19: a hot
    # 1M count sweep — compile-cached, 6.25 s twenty minutes earlier —
    # ran 470 s; the budget check can't help once the stage started,
    # and a blocked device readback holds the main thread past the
    # driver's timeout, losing the JSON line).  Each extra runs in a
    # daemon thread and gets the remaining budget plus a margin; a
    # stage that blows it is abandoned (its thread keeps the device
    # busy, so later device stages skip loudly) and the process exits
    # via os._exit after printing, so the stuck handle can't wedge
    # interpreter teardown.
    import threading
    _state = {"degraded": False}

    def run_stage(name: str, fn, device: bool = True,
                  floor: float = 180.0):
        if _state["degraded"] and device:
            log(f"SKIPPED {name}: device/tunnel degraded (an earlier "
                f"stage blew its watchdog)")
            return None
        # A device-stage watchdog fires at roughly budget+120, i.e.
        # with the budget already exhausted — but the host-only stages
        # ARE the degraded-day figures, so on a degraded run they
        # bypass over_budget and rely on their own (bounded) watchdog
        # instead.  Worst case added wall: two host stages x their
        # floors, still far inside the driver timeout.
        if not (_state["degraded"] and not device):
            if over_budget(name):
                return None
        env_t = os.environ.get("RUPPHASH_BENCH_STAGE_S")
        timeout = float(env_t) if env_t else max(
            floor, _budget - (_time.perf_counter() - _t0) + 120.0)
        box: dict = {}

        def work():
            try:
                box["result"] = fn()
            except BaseException as e:   # noqa: BLE001 — re-raised below
                box["error"] = e

        th = threading.Thread(target=work, daemon=True,
                              name=f"bench-{name}")
        th.start()
        th.join(timeout)
        if th.is_alive():
            if device:
                _state["degraded"] = True
                why = "device/tunnel degraded mid-run"
            else:
                why = "host-side stall"
            log(f"SKIPPED {name}: stage watchdog fired after "
                f"{timeout:.0f}s ({why})")
            return None
        if "error" in box:
            raise box["error"]
        return box.get("result")

    if cpu_fallback:
        # tiny workload: the point is a labelled JSON line, not a
        # meaningful CPU throughput; TPU-scale extras are skipped
        ips, ips_stats = bench_pdq(batch=32, iters=2)
        _budget = 0.0
    else:
        ips, ips_stats = bench_pdq()
    log(f"pdq_hash: {ips:,.0f} images/s/chip {ips_stats}")

    extra = {"pdq_images_per_sec_stats": ips_stats}
    if cpu_fallback:
        extra["backend"] = "cpu-fallback (accelerator transport dead)"
    try:
        r = run_stage("grouping count-sweep", bench_grouping)
        if r is not None:
            pps, gdt = r
            log(f"grouping count-sweep: {pps/1e9:.1f} Gpairs/s "
                f"(100k x 100k x 8 variants in {gdt:.2f}s)")
            extra["grouping_100k_gpairs_per_s"] = round(pps / 1e9, 1)
    except Exception as e:  # secondary metric must not break the headline
        log(f"grouping bench failed: {e}")

    try:
        g1m = run_stage("grouping 1M", bench_grouping_1m)
        if g1m is not None:
            proj = g1m / 8.0
            log(f"grouping 1M x 1M x 8 variants, single chip: "
                f"{g1m:.2f}s; projected v5e-8 (disjoint tiles / 8 "
                f"chips): {proj:.2f}s vs BASELINE target <2s")
            extra["grouping_1m_single_chip_s"] = round(g1m, 2)
            extra["grouping_1m_v5e8_projected_s"] = round(proj, 2)
    except Exception as e:
        log(f"1M grouping bench failed: {e}")

    try:
        r = run_stage("scan e2e", bench_scan_e2e)
        if r is not None:
            cold, warm, sprof = r
            log(f"scan end-to-end (walk->decode->hash->cache, 1 host "
                f"core): {cold['median']:,.0f} images/s {cold}; cached "
                f"rescan: {warm['median']:,.0f} files/s {warm}")
            log(f"scan profile (per-stage host loop, ms/img): {sprof}")
            extra["scan_e2e_images_per_s"] = cold["median"]
            extra["scan_e2e_stats"] = cold
            # the TPU-backend scan shares one tunnel wire (19.6 MB
            # luma uploads + readbacks) and one host core with the
            # decoder, so its spread is transfer weather, not host
            # loop variance — scan_e2e_cpu_backend_* isolates the
            # host loop (the binding figure on a co-located host)
            extra["scan_e2e_note"] = (
                "TPU runs ride the remote-device tunnel; spread is "
                "transfer weather — see scan_e2e_cpu_backend_stats "
                "for the tunnel-free host loop")
            extra["cached_rescan_files_per_s"] = warm["median"]
            extra["cached_rescan_stats"] = warm
            extra["scan_profile_ms_per_img"] = sprof
    except Exception as e:
        log(f"scan e2e bench failed: {e}")

    try:
        # subprocess with its own 300 s timeout + host-only: runs even
        # when the device went degraded (it IS the degraded-day
        # figure).  floor > the subprocess timeout so a slow run fails
        # INWARD (TimeoutExpired in the thread, caught below) instead
        # of the watchdog abandoning a child that keeps burning the
        # single host core under the next stage's measurements.
        r = run_stage("scan e2e cpu-backend", bench_scan_e2e_cpu_backend,
                      device=False, floor=330.0)
        if r is not None:
            ccold, cwarm = r
            log(f"scan end-to-end CPU BACKEND (host loop, tunnel out of "
                f"the picture): {ccold['median']:,.0f} images/s {ccold}; "
                f"cached rescan {cwarm['median']:,.0f} files/s")
            extra["scan_e2e_cpu_backend_images_per_s"] = ccold["median"]
            extra["scan_e2e_cpu_backend_stats"] = ccold
    except Exception as e:
        log(f"cpu-backend scan bench failed: {e}")

    try:
        profile = run_stage("decode profile",
                            lambda: bench_decode_profile(chip_ips=ips),
                            device=False)
        if profile is not None:
            log(f"decode profile (1 host core): {json.dumps(profile)}")
            extra["decode_profile"] = profile
    except Exception as e:
        log(f"decode profile failed: {e}")

    try:
        r = run_stage("grouping 1M e2e", bench_grouping_1m_e2e)
        if r is not None:
            host_stats, res_stats, n_edges, n_groups = r
            log(f"grouping 1M end-to-end (counts -> hot-row extraction "
                f"-> union-find): host-in {host_stats['median']:.2f}s / "
                f"device-resident {res_stats['median']:.2f}s, {n_edges} "
                f"edges, {n_groups} groups (expected 6000 edges / 2000 "
                f"groups)")
            extra["grouping_1m_e2e_s"] = host_stats["median"]
            extra["grouping_1m_e2e_stats"] = host_stats
            extra["grouping_1m_e2e_resident_s"] = res_stats["median"]
            extra["grouping_1m_e2e_resident_stats"] = res_stats
            extra["grouping_1m_e2e_edges"] = n_edges
    except Exception as e:
        log(f"1M e2e grouping bench failed: {e}")

    if _state["degraded"]:
        extra["degraded"] = (
            "device/tunnel degraded mid-run: a stage watchdog fired; "
            "later device stages skipped (headline was measured before "
            "degradation)")
    print(json.dumps({
        "metric": "pdq_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/s/chip",
        "vs_baseline": round(ips / 100_000.0, 3),
        "extra": extra,
    }))
    if _state["degraded"]:
        # an abandoned stage thread still holds a blocked device call;
        # jax teardown at exit could wedge on it — the JSON is printed,
        # leave nothing to chance
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


if __name__ == "__main__":
    main()
