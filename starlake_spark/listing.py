"""Storage-listing seam: every maintenance path that enumerates a table
prefix (vacuum, fsck, parquet-layout adoption, task-output harvest)
goes through ONE pluggable lister instead of calling ``os.walk``
directly.

Why a seam (the 100 TB story)
-----------------------------
All ordinary reads and writes in this engine are MANIFEST-driven: the
committed version files name every live data file, so scans, upserts,
compaction and time travel never list storage at all. Listing is only
needed where the manifest is by definition silent — ORPHANS: task
attempts that died before commit, writers that lost a CAS, sidecars
whose commits expired. That is exactly the shape of Delta/Iceberg
VACUUM: diff a full prefix listing against the manifest's referenced
set, and age-gate what the manifest does not know.

On a POSIX filesystem the default :class:`FileSystemLister` walks the
directory tree. On an object store the same contract is a paginated
``ListObjectsV2`` over the table prefix (size and mtime come with each
page for free — no per-key HEAD), ``remove`` is ``DeleteObject``, and
there is no directory tree to recurse. Registering such a lister is
the ONLY storage-API change vacuum/fsck need; the manifest-diff logic
above the seam is storage-agnostic. The maintenance cadence bounds the
cost: one LIST per table per vacuum run, never per query.

Registration mirrors the lock-provider seam (locking.py):
``set_lister(obj)`` installs process-wide;
``STARLAKE_LISTER="pkg.module:ClassName?kw=v"`` installs at import.
"""

from __future__ import annotations

import importlib
import os
from dataclasses import dataclass
from typing import Any, Iterator


@dataclass
class FileEntry:
    path: str    # absolute path/key
    size: int
    mtime: float


class FileSystemLister:
    """Default local/POSIX implementation (HDFS-style mounts included)."""

    def list_files(self, root: str) -> Iterator[FileEntry]:
        """Every file under ``root``, recursively. Missing root yields
        nothing; entries racing a concurrent delete are skipped."""
        for r, _dirs, names in os.walk(root):
            for n in names:
                p = os.path.join(r, n)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                yield FileEntry(p, st.st_size, st.st_mtime)

    def remove(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


_default = FileSystemLister()
_lister: Any | None = None


def set_lister(lister: Any | None) -> None:
    """Install a process-wide lister (None → filesystem default)."""
    global _lister
    _lister = lister


def get_lister():
    return _lister if _lister is not None else _default


def _from_env() -> None:
    spec = os.environ.get("STARLAKE_LISTER", "")
    if not spec:
        return
    spec, _, query = spec.partition("?")
    mod_name, _, cls_name = spec.partition(":")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    kwargs: dict[str, Any] = {}
    if query:
        for pair in query.split("&"):
            k, _, v = pair.partition("=")
            for cast in (int, float, str):
                try:
                    kwargs[k] = cast(v)
                    break
                except ValueError:
                    continue
    set_lister(cls(**kwargs))


_from_env()
