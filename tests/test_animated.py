"""Animated image probes, frame decode, GUI passthrough."""
import io

import numpy as np
from PIL import Image

from rupphash_tpu.pipeline import animated


def _gif(n_frames=4, duration=50, size=(32, 24)) -> bytes:
    rng = np.random.default_rng(0)
    frames = [Image.fromarray(
        rng.integers(0, 256, (size[1], size[0], 3), dtype=np.uint8))
        for _ in range(n_frames)]
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True,
                   append_images=frames[1:], duration=duration, loop=0)
    return buf.getvalue()


def _webp_anim(n_frames=3, duration=80) -> bytes:
    rng = np.random.default_rng(1)
    frames = [Image.fromarray(
        rng.integers(0, 256, (20, 28, 3), dtype=np.uint8))
        for _ in range(n_frames)]
    buf = io.BytesIO()
    frames[0].save(buf, format="WEBP", save_all=True,
                   append_images=frames[1:], duration=duration)
    return buf.getvalue()


def test_probe_gif():
    assert animated.probe(_gif()) == "gif"
    # single frame gif is not animated
    buf = io.BytesIO()
    Image.new("RGB", (8, 8)).save(buf, format="GIF")
    assert animated.probe(buf.getvalue()) is None


def test_probe_webp():
    assert animated.probe(_webp_anim()) == "webp"
    buf = io.BytesIO()
    Image.new("RGB", (8, 8)).save(buf, format="WEBP")
    assert animated.probe(buf.getvalue()) is None


def test_probe_garbage():
    assert animated.probe(b"") is None
    assert animated.probe(b"RIFFxxxxWEBP") is None
    assert animated.probe(b"\x89PNG\r\n\x1a\nbroken") is None


def test_decode_frames_and_delays():
    frames, delays = animated.decode_frames(_gif(5, duration=50))
    assert frames is not None and len(frames) == 5
    assert all(abs(d - 0.05) < 1e-9 for d in delays)
    # zero/unspecified delay -> 100 ms default (gui/image.rs:1668)
    frames, delays = animated.decode_frames(_gif(3, duration=0))
    assert delays == [animated.DEFAULT_FRAME_DELAY_S] * 3
    # 240 fps cap
    frames, delays = animated.decode_frames(_gif(3, duration=1))
    assert all(d >= animated.MIN_FRAME_DELAY_S for d in delays)
    # stills return (None, None)
    assert animated.decode_frames(b"garbage") == (None, None)


def test_sniff_animatable():
    """16-byte magic gate: true for GIF/WebP/PNG heads, false for
    formats that cannot animate (no full-file read for RAW/TIFF)."""
    assert animated.sniff_animatable(_gif()[:16])
    assert animated.sniff_animatable(_webp_anim()[:16])
    assert animated.sniff_animatable(b"\x89PNG\r\n\x1a\n" + b"\0" * 8)
    assert not animated.sniff_animatable(b"\xff\xd8\xff\xe0" + b"\0" * 12)
    assert not animated.sniff_animatable(b"II*\x00" + b"\0" * 12)
    assert not animated.sniff_animatable(b"")


def test_gui_serves_animated_original_with_wrong_extension(tmp_path):
    """An animated GIF named .jpg still streams as an animation — the
    server gates on a magic-byte sniff, not the extension (advisor r3)."""
    import threading
    import urllib.request

    from rupphash_tpu.grouping.engine import FileRecord, GroupInfo
    from rupphash_tpu.gui import server
    from rupphash_tpu.state import AppState

    gif = _gif()
    p = tmp_path / "mislabeled.jpg"
    p.write_bytes(gif)
    st = AppState([[FileRecord(path=p, size=len(gif),
                               unique_file_id=9)]], [GroupInfo()])
    srv = server.GuiServer(st)
    httpd, port = srv.serve()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/image?g=0&f=0",
                timeout=10) as r:
            assert r.headers["Content-Type"] == "image/gif"
            assert r.read() == gif
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_gui_serves_animated_original(tmp_path):
    import threading
    import urllib.request

    from rupphash_tpu.grouping.engine import FileRecord, GroupInfo
    from rupphash_tpu.gui import server
    from rupphash_tpu.state import AppState

    gif = _gif()
    p = tmp_path / "anim.gif"
    p.write_bytes(gif)
    st = AppState([[FileRecord(path=p, size=len(gif),
                               unique_file_id=7)]], [GroupInfo()])
    srv = server.GuiServer(st)
    httpd, port = srv.serve()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/image?g=0&f=0",
                timeout=10) as r:
            assert r.headers["Content-Type"] == "image/gif"
            assert r.read() == gif  # untouched original
        # with a transform active, frames are processed server-side
        # and re-encoded as APNG — the animation keeps playing
        srv.apply_intent("rotate_cw")
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/image?g=0&f=0",
                timeout=10) as r:
            assert r.headers["Content-Type"] == "image/png"
            body = r.read()
            assert b"acTL" in body[:200]
            im = Image.open(io.BytesIO(body))
            assert im.size == (24, 32)  # rotated frames
    finally:
        httpd.shutdown()
        httpd.server_close()
