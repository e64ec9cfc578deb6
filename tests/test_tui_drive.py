"""End-to-end curses TUI drive through a pty: the list renders, the
sort-menu modal opens, the prompt editor accepts multi-byte UTF-8
(get_wch — byte-wise getch produced mojibake), and quit exits cleanly.
The richer per-key behaviors live in test_tui.py as pure-logic tests;
this locks the actual terminal surface.
"""
import os
import pty
import select
import subprocess
import sys
import time

import numpy as np
import pytest


@pytest.mark.skipif(not hasattr(pty, "openpty"), reason="pty unavailable")
def test_tui_pty_drive(tmp_path):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(3)
    base = rng.integers(30, 220, (24, 32, 3), dtype=np.uint8)
    img = np.asarray(Image.fromarray(base).resize((160, 120),
                                                  Image.BILINEAR))
    Image.fromarray(img).save(d / "a.png")
    Image.fromarray(img).save(d / "b.png")

    env = dict(os.environ, TERM="xterm-256color", LINES="12",
               COLUMNS="90", RUPPHASH_PLATFORM="cpu",
               RUPPHASH_CACHE_DIR=str(tmp_path / "cache"),
               RUPPHASH_CONFIG_DIR=str(tmp_path / "cache"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    # openpty + subprocess instead of pty.fork(): forking the
    # JAX-threaded pytest process warns about deadlocks even though
    # the child execs immediately
    fd, slave = pty.openpty()
    proc = subprocess.Popen(
        [sys.executable, "-m", "rupphash_tpu", str(d), "--use-tui"],
        env=env, stdin=slave, stdout=slave, stderr=slave,
        close_fds=True, start_new_session=True)
    os.close(slave)

    out = b""

    def read_for(secs):
        nonlocal out
        t0 = time.time()
        while time.time() - t0 < secs:
            r, _, _ = select.select([fd], [], [], 0.3)
            if r:
                try:
                    out += os.read(fd, 65536)
                except OSError:
                    return

    try:
        deadline = time.time() + 60
        while b"roup" not in out and time.time() < deadline:
            read_for(2)
        assert b"roup" in out, out[-2000:]   # Group header rendered
        os.write(fd, b"j")                   # navigate
        read_for(1)
        os.write(fd, b"s")                   # sort menu modal
        read_for(1)
        assert b"Sort order" in out, out[-1500:]
        os.write(fd, b"\x1b")                # close menu
        read_for(1)
        os.write(fd, b"r")                   # rename prompt
        read_for(1)
        os.write(fd, "é".encode())           # multi-byte UTF-8 input
        read_for(1)
        assert "é".encode() in out, out[-1200:]
        os.write(fd, b"\x1b")                # cancel
        read_for(1)
        os.write(fd, b"z")                   # quit
        read_for(3)
    finally:
        try:
            os.close(fd)
        except OSError:
            pass
        rc = proc.wait(timeout=30)
    assert rc == 0
