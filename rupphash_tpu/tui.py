"""Terminal UI: grouped duplicate browser on the shared AppState.

A curses re-creation of the reference TUI (src/ui.rs): grouped list with
color coding (marked=magenta, bit-identical=green), mark/unmark,
delete/trash with confirm modal, move-marked, rename, sort cycling,
filename regex search, ignore management, and the reference keymap where
it translates (KEYS.txt / ui.rs:102-432).  All mutations go through
state.AppState.handle_input — the TUI only renders and maps keys to
intents (L7 -> L6).

Keys:
  up/down/j/k  item      left/right/h/l  group       pgup/pgdn  page
  g/G   first/last       m/space  mark    a  mark group   u  unmark all
  d  delete marked (y confirms)   x  delete current      t  trash mode
  v  move marked                  r  rename              s  cycle sort
  /  search    n/N  next/prev hit   [ ]  prev/next distance band
  q  ignore current/marked  Q  ignore group (y confirms)  ESC/z quit
"""

from __future__ import annotations

import curses

from .state import AppState, Intent

_SORT_CYCLE = ["name", "name-natural", "date", "date-desc",
               "size", "size-desc"]


def _draw(stdscr, st: AppState, offset: int) -> int:
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
            hdr = (f"-- Group {gi + 1} (max dist {info.max_dist}, "
                   f"{info.status}) --")
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
    if st.pending_confirm == "delete":
        bar = (f" {mode.upper()} {len(st.marked)} marked files? "
               f"y=yes  any other key=no")
    elif st.pending_confirm == "ignore-group":
        bar = " Ignore whole group? y=yes  any other key=no"
    else:
        bar = (f" {len(st.groups)} groups | {len(st.marked)} marked | "
               f"sort:{st.sort_order} | mode:{mode} | "
               f"m mark  d {mode}  q ignore  / search  z quit")
    stdscr.addnstr(h - 2, 0, bar[:w - 1], w - 1, curses.A_REVERSE)
    stdscr.addnstr(h - 1, 0, st.status[:w - 1], w - 1)
    stdscr.refresh()
    return offset


def _prompt(stdscr, text: str) -> str:
    h, w = stdscr.getmaxyx()
    stdscr.addnstr(h - 1, 0, text + " " * max(0, w - len(text) - 1), w - 1,
                   curses.A_REVERSE)
    curses.echo()
    try:
        out = stdscr.getstr(h - 1, len(text)).decode()
    except Exception:
        out = ""
    curses.noecho()
    return out


_KEYMAP = {
    curses.KEY_DOWN: Intent.NEXT_ITEM, ord("j"): Intent.NEXT_ITEM,
    curses.KEY_UP: Intent.PREV_ITEM, ord("k"): Intent.PREV_ITEM,
    curses.KEY_RIGHT: Intent.NEXT_GROUP, ord("l"): Intent.NEXT_GROUP,
    curses.KEY_LEFT: Intent.PREV_GROUP, ord("h"): Intent.PREV_GROUP,
    curses.KEY_NPAGE: Intent.PAGE_DOWN, curses.KEY_PPAGE: Intent.PAGE_UP,
    ord("g"): Intent.HOME, ord("G"): Intent.END,
    ord("m"): Intent.TOGGLE_MARK, ord(" "): Intent.TOGGLE_MARK,
    ord("a"): Intent.MARK_GROUP, ord("u"): Intent.UNMARK_ALL,
    ord("t"): Intent.TOGGLE_USE_TRASH,
    ord("x"): Intent.DELETE_IMMEDIATE,
    ord("v"): Intent.MOVE_MARKED,
    ord("n"): Intent.NEXT_SEARCH, ord("N"): Intent.PREV_SEARCH,
    ord("]"): Intent.NEXT_GROUP_BY_DIST, ord("["): Intent.PREV_GROUP_BY_DIST,
    ord("q"): Intent.IGNORE_CURRENT,
}


def _loop(stdscr, st: AppState):
    curses.curs_set(0)
    curses.start_color()
    curses.use_default_colors()
    curses.init_pair(1, curses.COLOR_MAGENTA, -1)
    offset = 0
    while not st.quit and st.groups:
        offset = _draw(stdscr, st, offset)
        ch = stdscr.getch()
        if st.pending_confirm:
            if ch in (ord("y"), ord("Y")):
                yes = {"delete": Intent.EXECUTE_DELETE,
                       "delete-one": Intent.EXECUTE_DELETE,
                       "move": Intent.MOVE_MARKED,
                       "ignore-group": Intent.IGNORE_GROUP}
                st.handle_input(yes.get(st.pending_confirm, Intent.CANCEL))
            else:
                st.handle_input(Intent.CANCEL)
            continue
        if ch in (27, ord("z")):
            return
        if ch == ord("d"):
            st.handle_input(Intent.CONFIRM_DELETE)
        elif ch == ord("Q"):
            st.handle_input(Intent.IGNORE_GROUP)
        elif ch == ord("s"):
            i = (_SORT_CYCLE.index(st.sort_order) + 1
                 if st.sort_order in _SORT_CYCLE else 0) % len(_SORT_CYCLE)
            st.handle_input(Intent.CHANGE_SORT, _SORT_CYCLE[i])
        elif ch == ord("r"):
            st.handle_input(Intent.SUBMIT_RENAME, _prompt(stdscr, "rename: "))
        elif ch == ord("c"):
            st.handle_input(Intent.SET_MOVE_TARGET,
                            _prompt(stdscr, "move target dir: "))
        elif ch == ord("/"):
            st.handle_input(Intent.SUBMIT_SEARCH, _prompt(stdscr, "search: "))
        elif ch in _KEYMAP:
            st.handle_input(_KEYMAP[ch])


def run(groups, infos, args, store=None) -> int:
    if not groups:
        print("No duplicate groups to browse.")
        return 0
    view_mode = bool(getattr(args, "view", False)
                     or getattr(args, "view_flatten", False)
                     or getattr(args, "shuffle", False)
                     or getattr(args, "slideshow", None) is not None)
    st = AppState(groups, infos, use_trash=args.use_trash,
                  move_target=args.move_marked, sort_order=args.sort,
                  relative_times=args.relative_times, store=store,
                  keep_singletons=view_mode)
    curses.wrapper(_loop, st)
    return 0
