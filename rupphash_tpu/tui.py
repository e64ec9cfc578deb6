"""Terminal UI: grouped duplicate browser with mark/delete/move.

A curses re-creation of the reference TUI (src/ui.rs): grouped list with
color coding (marked=magenta, bit-identical=green, hardlink=cyan),
mark/unmark, delete/trash with confirm modal, move-marked, sort menu,
filename search, and the same single-letter keymap where it translates
(KEYS.txt / ui.rs:102-432).

Keys:
  up/down/j/k   move cursor          g/G    first/last file
  pgup/pgdn     page                 m/space mark current
  a             mark all in group    u      unmark all
  d             delete marked (confirm)     t  toggle trash mode
  v             move marked to target dir   s  cycle sort order
  /             filename search      n      next search hit
  q             quit
"""

from __future__ import annotations

import curses
from pathlib import Path

from .grouping import engine
from .utils import fileops


class TuiState:
    """Session state: the analogue of AppState (state.rs:137-244)."""

    def __init__(self, groups, infos, use_trash=False, move_target=None,
                 sort_order="name"):
        self.groups = groups
        self.infos = infos
        self.cursor_group = 0
        self.cursor_file = 0
        self.marked: set[Path] = set()
        self.use_trash = use_trash
        self.move_target = move_target
        self.sort_order = sort_order
        self.status = ""
        self.search = ""
        self.rows: list[tuple[int, int]] = []
        self._rebuild_rows()

    def _rebuild_rows(self):
        self.rows = [(gi, fi) for gi, g in enumerate(self.groups)
                     for fi in range(len(g))]

    @property
    def flat_cursor(self) -> int:
        for k, (gi, fi) in enumerate(self.rows):
            if gi == self.cursor_group and fi == self.cursor_file:
                return k
        return 0

    def move(self, delta: int):
        if not self.rows:
            return
        k = max(0, min(len(self.rows) - 1, self.flat_cursor + delta))
        self.cursor_group, self.cursor_file = self.rows[k]

    def current(self):
        if not self.groups:
            return None
        return self.groups[self.cursor_group][self.cursor_file]

    def toggle_mark(self):
        f = self.current()
        if f:
            if f.path in self.marked:
                self.marked.discard(f.path)
            else:
                self.marked.add(f.path)
            self.move(1)

    def mark_group(self):
        for f in self.groups[self.cursor_group]:
            self.marked.add(f.path)

    def unmark_all(self):
        self.marked.clear()

    def delete_marked(self) -> int:
        """Delete/trash marked files; prune emptied groups
        (state.rs:814-955)."""
        count = 0
        for path in sorted(self.marked):
            try:
                fileops.delete_file(path, self.use_trash)
                count += 1
            except OSError:
                pass
        self._drop_paths(self.marked)
        self.marked.clear()
        return count

    def move_marked(self) -> int:
        if not self.move_target:
            return 0
        count = 0
        moved = set()
        for path in sorted(self.marked):
            try:
                fileops.safe_move(path, self.move_target)
                moved.add(path)
                count += 1
            except OSError:
                pass
        self._drop_paths(moved)
        self.marked -= moved
        return count

    def _drop_paths(self, paths):
        new_groups, new_infos = [], []
        for g, inf in zip(self.groups, self.infos):
            g2 = [f for f in g if f.path not in paths]
            if len(g2) > 1:
                new_groups.append(g2)
                new_infos.append(inf)
        self.groups, self.infos = new_groups, new_infos
        self.cursor_group = min(self.cursor_group,
                                max(0, len(self.groups) - 1))
        self.cursor_file = 0
        self._rebuild_rows()

    def resort(self):
        orders = ["name", "name-natural", "date", "date-desc",
                  "size", "size-desc"]
        i = (orders.index(self.sort_order) + 1 if self.sort_order in orders
             else 0) % len(orders)
        self.sort_order = orders[i]
        for g in self.groups:
            engine.sort_files(g, self.sort_order)
        self._rebuild_rows()

    def find_next(self):
        """Filename substring search (state.rs:957-1031)."""
        if not self.search or not self.rows:
            return
        start = self.flat_cursor + 1
        order = self.rows[start:] + self.rows[:start]
        for gi, fi in order:
            if self.search.lower() in self.groups[gi][fi].path.name.lower():
                self.cursor_group, self.cursor_file = gi, fi
                return


def _draw(stdscr, st: TuiState, offset: int) -> int:
    from .cli import format_size

    h, w = stdscr.getmaxyx()
    stdscr.erase()
    visible = h - 2
    cur = st.flat_cursor
    if cur < offset:
        offset = cur
    if cur >= offset + visible:
        offset = cur - visible + 1

    row = 0
    last_group = -1
    k = offset
    while row < visible and k < len(st.rows):
        gi, fi = st.rows[k]
        g = st.groups[gi]
        if gi != last_group and fi == 0:
            info = st.infos[gi]
            hdr = f"-- Group {gi + 1} (max dist {info.max_dist}, {info.status}) --"
            stdscr.addnstr(row, 0, hdr, w - 1, curses.A_BOLD)
            row += 1
            last_group = gi
            if row >= visible:
                break
        f = g[fi]
        sel = (gi, fi) == (st.cursor_group, st.cursor_file)
        attrs = curses.A_REVERSE if sel else curses.A_NORMAL
        if f.path in st.marked:
            attrs |= curses.color_pair(1)
        marker = "M" if f.path in st.marked else " "
        res = f"{f.resolution[0]}x{f.resolution[1]}" if f.resolution else "?"
        line = f" [{marker}] {format_size(f.size):>10} {res:>10}  {f.path}"
        stdscr.addnstr(row, 0, line, w - 1, attrs)
        row += 1
        k += 1

    mode = "trash" if st.use_trash else "delete"
    bar = (f" {len(st.groups)} groups | {len(st.marked)} marked | "
           f"sort:{st.sort_order} | mode:{mode} | q quit  m mark  d {mode}  "
           f"/ search")
    stdscr.addnstr(h - 2, 0, bar[:w - 1], w - 1, curses.A_REVERSE)
    stdscr.addnstr(h - 1, 0, st.status[:w - 1], w - 1)
    stdscr.refresh()
    return offset


def _prompt(stdscr, text: str) -> str:
    h, w = stdscr.getmaxyx()
    stdscr.addnstr(h - 1, 0, text + " " * (w - len(text) - 1), w - 1,
                   curses.A_REVERSE)
    curses.echo()
    try:
        out = stdscr.getstr(h - 1, len(text)).decode()
    except Exception:
        out = ""
    curses.noecho()
    return out


def _loop(stdscr, st: TuiState):
    curses.curs_set(0)
    curses.start_color()
    curses.use_default_colors()
    curses.init_pair(1, curses.COLOR_MAGENTA, -1)
    offset = 0
    while True:
        offset = _draw(stdscr, st, offset)
        ch = stdscr.getch()
        if ch in (ord("q"), 27):
            return
        elif ch in (curses.KEY_DOWN, ord("j")):
            st.move(1)
        elif ch in (curses.KEY_UP, ord("k")):
            st.move(-1)
        elif ch == curses.KEY_NPAGE:
            st.move(20)
        elif ch == curses.KEY_PPAGE:
            st.move(-20)
        elif ch == ord("g"):
            st.move(-10**9)
        elif ch == ord("G"):
            st.move(10**9)
        elif ch in (ord("m"), ord(" ")):
            st.toggle_mark()
        elif ch == ord("a"):
            st.mark_group()
        elif ch == ord("u"):
            st.unmark_all()
        elif ch == ord("t"):
            st.use_trash = not st.use_trash
        elif ch == ord("s"):
            st.resort()
        elif ch == ord("d"):
            if st.marked:
                verb = "trash" if st.use_trash else "DELETE"
                ans = _prompt(stdscr, f"{verb} {len(st.marked)} files? (y/N) ")
                if ans.lower() == "y":
                    n = st.delete_marked()
                    st.status = f"removed {n} files"
        elif ch == ord("v"):
            if st.marked and st.move_target:
                n = st.move_marked()
                st.status = f"moved {n} files to {st.move_target}"
            elif not st.move_target:
                st.status = "no --move-marked target set"
        elif ch == ord("/"):
            st.search = _prompt(stdscr, "search: ")
            st.find_next()
        elif ch == ord("n"):
            st.find_next()
        if not st.groups:
            return


def run(groups, infos, args) -> int:
    if not groups:
        print("No duplicate groups to browse.")
        return 0
    st = TuiState(groups, infos, use_trash=args.use_trash,
                  move_target=args.move_marked, sort_order=args.sort)
    curses.wrapper(_loop, st)
    return 0
