"""The driver contract: bench.py must print exactly ONE JSON line with
{metric, value, unit, vs_baseline} on stdout no matter what happens to
the extras, and the wall-clock budget must skip extras LOUDLY once
exhausted (stage functions monkeypatched — real numbers come from the
TPU run, this pins the plumbing)."""
import importlib
import json

import pytest


@pytest.fixture
def benchmod(monkeypatch):
    b = importlib.import_module("bench")
    PDQ_STATS = {"median": 123456.0, "spread": 1000.0, "k": 3,
                 "runs": [123000.0, 123456.0, 124000.0]}
    monkeypatch.setattr(b, "bench_pdq", lambda: (123456.0, PDQ_STATS))
    monkeypatch.setattr(b, "bench_grouping", lambda: (2.5e9, 1.0))
    monkeypatch.setattr(b, "bench_grouping_1m", lambda: 6.0)
    monkeypatch.setattr(
        b, "bench_scan_e2e",
        lambda: ({"median": 500.0, "spread": 10.0, "k": 2,
                  "runs": [495.0, 505.0]},
                 {"median": 5000.0, "spread": 100.0, "k": 2,
                  "runs": [4950.0, 5050.0]},
                 {"heavy_ms_per_img": 1.0}))
    monkeypatch.setattr(
        b, "bench_scan_e2e_cpu_backend",
        lambda: ({"median": 700.0, "spread": 20.0, "k": 3,
                  "runs": [690.0, 700.0, 710.0]},
                 {"median": 6000.0, "spread": 100.0, "k": 3,
                  "runs": [5900.0, 6000.0, 6100.0]}))
    monkeypatch.setattr(b, "bench_decode_profile",
                        lambda chip_ips=None: {"jpeg_4mp": {}})
    monkeypatch.setattr(
        b, "bench_grouping_1m_e2e",
        lambda: ({"median": 20.0, "spread": 1.0, "k": 3,
                  "runs": [19.5, 20.0, 20.5]},
                 {"median": 11.0, "spread": 0.5, "k": 3,
                  "runs": [10.8, 11.0, 11.3]}, 6000, 2000))
    return b


def _run(benchmod, capsys):
    benchmod.main()
    out = capsys.readouterr()
    lines = [ln for ln in out.out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines      # exactly ONE stdout JSON line
    return json.loads(lines[0]), out.err


def test_bench_json_contract_full(benchmod, capsys, monkeypatch):
    monkeypatch.setenv("RUPPHASH_BENCH_BUDGET_S", "3600")
    payload, err = _run(benchmod, capsys)
    assert payload["metric"] == "pdq_images_per_sec_per_chip"
    assert payload["value"] == 123456.0
    assert payload["unit"] == "images/s/chip"
    assert payload["vs_baseline"] == pytest.approx(1.235, abs=1e-3)
    extra = payload["extra"]
    assert extra["grouping_100k_gpairs_per_s"] == 2.5
    assert extra["grouping_1m_single_chip_s"] == 6.0
    assert extra["grouping_1m_v5e8_projected_s"] == 0.75
    assert extra["scan_e2e_images_per_s"] == 500.0
    assert extra["cached_rescan_files_per_s"] == 5000.0
    assert extra["grouping_1m_e2e_s"] == 20.0
    assert extra["grouping_1m_e2e_resident_s"] == 11.0
    assert extra["grouping_1m_e2e_edges"] == 6000
    assert extra["decode_profile"] == {"jpeg_4mp": {}}
    assert extra["scan_e2e_cpu_backend_images_per_s"] == 700.0
    assert extra["scan_e2e_cpu_backend_stats"]["k"] == 3
    # honesty stats travel with the medians — including the headline
    # itself (round-4 verdict weak #2)
    assert extra["pdq_images_per_sec_stats"]["k"] == 3
    assert extra["scan_e2e_stats"]["k"] == 2
    assert extra["scan_profile_ms_per_img"]["heavy_ms_per_img"] == 1.0
    assert extra["grouping_1m_e2e_stats"]["spread"] == 1.0
    assert "SKIPPED" not in err


def test_bench_budget_skips_loudly(benchmod, capsys, monkeypatch):
    monkeypatch.setenv("RUPPHASH_BENCH_BUDGET_S", "0.000001")
    payload, err = _run(benchmod, capsys)
    assert payload["value"] == 123456.0    # headline always lands
    # every extra skipped (the headline's own stats always travel)...
    assert set(payload["extra"]) == {"pdq_images_per_sec_stats"}
    assert err.count("SKIPPED") == 6       # ...and each one says so
    assert "RUPPHASH_BENCH_BUDGET_S" in err


def test_bench_dead_accelerator_still_prints(benchmod, capsys,
                                             monkeypatch):
    # a dead TPU transport must yield a labelled CPU line, not a hang
    monkeypatch.setenv("RUPPHASH_BENCH_BUDGET_S", "3600")
    from rupphash_tpu.utils import backendprobe
    monkeypatch.setattr(
        backendprobe, "ensure_backend_alive",
        lambda timeout_s=None, log=None, use_ttl=True: "cpu-fallback")
    monkeypatch.setattr(
        benchmod, "bench_pdq",
        lambda **kw: (2000.0, {"median": 2000.0, "spread": 0.0, "k": 2,
                               "runs": [2000.0, 2000.0]}))
    payload, err = _run(benchmod, capsys)
    assert payload["value"] == 2000.0      # headline still lands
    assert "cpu-fallback" in payload["extra"]["backend"]
    # TPU-scale extras are all skipped loudly, none silently run
    assert "grouping_1m_single_chip_s" not in payload["extra"]
    assert err.count("SKIPPED") == 6


def test_bench_extra_failure_does_not_break_headline(
        benchmod, capsys, monkeypatch):
    monkeypatch.setenv("RUPPHASH_BENCH_BUDGET_S", "3600")
    def boom():
        raise RuntimeError("synthetic stage failure")
    monkeypatch.setattr(benchmod, "bench_grouping_1m_e2e", boom)
    payload, err = _run(benchmod, capsys)
    assert payload["value"] == 123456.0
    assert "grouping_1m_e2e_s" not in payload["extra"]
    assert payload["extra"]["scan_e2e_images_per_s"] == 500.0
    assert "synthetic stage failure" in err


def test_bench_stage_watchdog_rescues_json(tmp_path):
    """A device stage that stalls mid-run (observed: a hot 1M sweep
    running 75x slow on a degraded tunnel) must not cost the JSON
    line: the watchdog abandons the stage, later device stages skip
    loudly, host-only stages still run, and the process exits 0 via
    os._exit despite the stuck daemon thread."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    driver = tmp_path / "drive.py"
    driver.write_text(
        "import time\n"
        "import bench\n"
        "PDQ = {'median': 1000.0, 'spread': 1.0, 'k': 3,\n"
        "       'runs': [999.0, 1000.0, 1001.0]}\n"
        "bench.bench_pdq = lambda **kw: (1000.0, PDQ)\n"
        "bench.bench_grouping = lambda: (2.5e9, 1.0)\n"
        "bench.bench_grouping_1m = lambda: time.sleep(600)  # stalls\n"
        "bench.bench_scan_e2e = lambda: (_ for _ in ()).throw(\n"
        "    AssertionError('device stage ran after degradation'))\n"
        "bench.bench_scan_e2e_cpu_backend = lambda: (\n"
        "    {'median': 700.0, 'spread': 20.0, 'k': 3,\n"
        "     'runs': [690.0, 700.0, 710.0]},\n"
        "    {'median': 6000.0, 'spread': 100.0, 'k': 3,\n"
        "     'runs': [5900.0, 6000.0, 6100.0]})\n"
        "bench.bench_decode_profile = lambda chip_ips=None: {'ok': 1}\n"
        "bench.bench_grouping_1m_e2e = lambda: (_ for _ in ()).throw(\n"
        "    AssertionError('device stage ran after degradation'))\n"
        "from rupphash_tpu.utils import backendprobe\n"
        "backendprobe.ensure_backend_alive = (\n"
        "    lambda timeout_s=None, log=None, use_ttl=True: 'ok')\n"
        "bench.main()\n")
    env = dict(os.environ)
    env["RUPPHASH_BENCH_BUDGET_S"] = "3600"
    env["RUPPHASH_BENCH_STAGE_S"] = "2"
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    out = subprocess.run([sys.executable, str(driver)], env=env,
                         capture_output=True, text=True, timeout=120,
                         cwd=repo)
    assert out.returncode == 0, out.stderr[-800:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["value"] == 1000.0              # headline landed
    extra = payload["extra"]
    assert "degraded" in extra                     # labelled honestly
    assert extra["grouping_100k_gpairs_per_s"] == 2.5   # pre-stall ran
    assert "grouping_1m_single_chip_s" not in extra     # stalled stage
    # later device stages skipped, host-only stages still ran
    assert "scan_e2e_images_per_s" not in extra
    assert extra["scan_e2e_cpu_backend_images_per_s"] == 700.0
    assert extra["decode_profile"] == {"ok": 1}
    assert out.stderr.count("watchdog fired") == 1
    assert out.stderr.count("SKIPPED") >= 3


def test_bench_degraded_run_still_collects_host_figures(tmp_path):
    """Finding from the watchdog review: a device-stage watchdog fires
    at roughly budget+120s, i.e. with the budget already exhausted —
    but the host-only stages ARE the degraded-day figures, so on a
    degraded run they must bypass over_budget (bounded by their own
    watchdog) instead of being silently budget-skipped."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    driver = tmp_path / "drive.py"
    driver.write_text(
        "import time\n"
        "import bench\n"
        "PDQ = {'median': 1000.0, 'spread': 1.0, 'k': 3,\n"
        "       'runs': [999.0, 1000.0, 1001.0]}\n"
        "bench.bench_pdq = lambda **kw: (1000.0, PDQ)\n"
        "bench.bench_grouping = lambda: (2.5e9, 1.0)\n"
        "bench.bench_grouping_1m = lambda: time.sleep(600)  # stalls\n"
        "bench.bench_scan_e2e = lambda: (_ for _ in ()).throw(\n"
        "    AssertionError('device stage ran after degradation'))\n"
        "bench.bench_scan_e2e_cpu_backend = lambda: (\n"
        "    {'median': 700.0, 'spread': 20.0, 'k': 3,\n"
        "     'runs': [690.0, 700.0, 710.0]},\n"
        "    {'median': 6000.0, 'spread': 100.0, 'k': 3,\n"
        "     'runs': [5900.0, 6000.0, 6100.0]})\n"
        "bench.bench_decode_profile = lambda chip_ips=None: {'ok': 1}\n"
        "bench.bench_grouping_1m_e2e = lambda: (_ for _ in ()).throw(\n"
        "    AssertionError('device stage ran after degradation'))\n"
        "from rupphash_tpu.utils import backendprobe\n"
        "backendprobe.ensure_backend_alive = (\n"
        "    lambda timeout_s=None, log=None, use_ttl=True: 'ok')\n"
        "bench.main()\n")
    env = dict(os.environ)
    # the 1M stall starts well under the 1.05s budget (mocked earlier
    # stages are instant) and its watchdog fires at STAGE_S=2s — past
    # the budget, which is exactly the production geometry (the real
    # watchdog fires at budget+120)
    env["RUPPHASH_BENCH_BUDGET_S"] = "1.05"
    env["RUPPHASH_BENCH_STAGE_S"] = "2"
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    out = subprocess.run([sys.executable, str(driver)], env=env,
                         capture_output=True, text=True, timeout=120,
                         cwd=repo)
    assert out.returncode == 0, out.stderr[-800:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    payload = json.loads(lines[0])
    extra = payload["extra"]
    assert "degraded" in extra
    # budget was exhausted when the watchdog fired, yet the host-only
    # degraded-day figures were still collected...
    assert extra["scan_e2e_cpu_backend_images_per_s"] == 700.0
    assert extra["decode_profile"] == {"ok": 1}
    # ...while device stages after the fire stayed skipped
    assert "scan_e2e_images_per_s" not in extra
    assert "grouping_1m_e2e_s" not in extra
