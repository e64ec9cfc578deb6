"""TUI modal logic (ui.rs:102-432 parity): Tab completion cycling,
sort menu table, time formatting.  Pure-logic tests — the curses screen
itself is driven via tmux in the verify recipe."""
import time

from rupphash_tpu import tui


def test_rename_completion_cycles_and_rescans(tmp_path):
    for name in ("alpha.png", "alpine.png", "beta.png"):
        (tmp_path / name).touch()
    comp = tui._Completer(tui.complete_rename(tmp_path))
    # scan on first Tab, then cycle (ui.rs:210-255)
    assert comp.next("al") == "alpha.png"
    assert comp.next("alpha.png") == "alpine.png"
    assert comp.next("alpine.png") == "alpha.png"  # wraps
    # typing something new re-scans
    assert comp.next("b") == "beta.png"
    # no candidates: buffer unchanged
    assert comp.next("zzz") == "zzz"


def test_move_completion_directories_only(tmp_path):
    (tmp_path / "photos").mkdir()
    (tmp_path / "phrases").mkdir()
    (tmp_path / "photo.txt").touch()  # file must not complete
    comp = tui._Completer(tui.complete_move())
    first = comp.next(str(tmp_path / "ph"))
    assert first == str(tmp_path / "photos")
    second = comp.next(first)
    assert second == str(tmp_path / "phrases")
    # trailing separator lists the directory's subdirs
    comp2 = tui._Completer(tui.complete_move())
    hit = comp2.next(str(tmp_path) + "/")
    assert hit in (str(tmp_path / "photos"), str(tmp_path / "phrases"))


def test_sort_menu_matches_reference_digits():
    # ui.rs:303-336: digits 1..9 in this exact order
    assert tui.SORT_MENU == [
        "name", "name-desc", "name-natural", "name-natural-desc",
        "date", "date-desc", "size", "size-desc", "random"]
    from rupphash_tpu.grouping import engine
    recs = [engine.FileRecord(path=__import__("pathlib").Path(p),
                              size=i, modified=float(i))
            for i, p in enumerate(["b.png", "a10.png", "a2.png"])]
    for order in tui.SORT_MENU:
        engine.sort_files(list(recs), order)  # every entry is accepted


def test_relative_time_format():
    now = time.time()
    assert tui._fmt_time(now - 30, True) == "just now"
    assert tui._fmt_time(now - 7200, True) == "2h ago"
    assert tui._fmt_time(now - 3 * 86400, True) == "3d ago"
    absolute = tui._fmt_time(now, False)
    assert len(absolute) == 16 and absolute[4] == "-"
    assert tui._fmt_time(0, True) == "?"
