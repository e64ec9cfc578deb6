"""Directory walking and file identity.

Mirrors scan_and_group's collection phase (scanner.rs:1158-1176):
recursive walk, canonicalize + dedup (the same file reached through two
CLI paths or symlinks is scanned once), image-extension gate, and
hardlink identity via (dev, inode) (scanner.rs:1526-1540).
"""

from __future__ import annotations

import os
from pathlib import Path

from . import decode


def collect_files(paths, recursive: bool = True):
    """Walk the given files/directories; returns a sorted list of unique
    canonical Paths that look like images."""
    seen: set[str] = set()
    out: list[Path] = []

    def add(p: Path):
        try:
            canon = os.path.realpath(p)
        except OSError:
            return
        if canon in seen:
            return
        if not decode.is_image_ext(canon):
            return
        seen.add(canon)
        out.append(Path(canon))

    for root in paths:
        root = Path(root)
        if root.is_file():
            add(root)
        elif root.is_dir():
            if recursive:
                for dirpath, dirnames, filenames in os.walk(root):
                    dirnames.sort()
                    for name in sorted(filenames):
                        add(Path(dirpath) / name)
            else:
                for child in sorted(root.iterdir()):
                    if child.is_file():
                        add(child)
    out.sort()
    return out


def dedup_hardlinks(records):
    """Given FileRecords with unique_file_id set, return the hardlink
    groups as {unique_file_id: [records]} for every id with more than
    one path (scanner.rs:1526-1540).  The scan's actual dedup happens
    in pipeline/scan.py's prepass; this is the reporting helper."""
    by_id: dict[int, list] = {}
    for r in records:
        by_id.setdefault(r.unique_file_id, []).append(r)
    groups = {fid: rs for fid, rs in by_id.items() if len(rs) > 1}
    return groups
