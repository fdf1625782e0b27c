"""File-change watcher: native inotify fast path, mtime polling fallback.

The engine polls the config and every file-backed kernel each frame
(reference behavior, src/render.rs:497-519).  With the native watcher
(native/watcher.cpp) the per-frame cost collapses to one non-blocking
``read`` on an inotify fd; the engine's mtime comparison — which remains
the authoritative change detector — only runs when the watcher reports
directory activity.  Without the .so (or off Linux) ``poll`` always
returns True and behavior degrades to pure polling.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterable, Optional

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libreforge_watch.so")
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.rf_watch_create.restype = ctypes.c_int
    lib.rf_watch_add_dir.restype = ctypes.c_int
    lib.rf_watch_add_dir.argtypes = [ctypes.c_int, ctypes.c_char_p]
    lib.rf_watch_poll.restype = ctypes.c_int
    lib.rf_watch_poll.argtypes = [ctypes.c_int]
    lib.rf_watch_close.argtypes = [ctypes.c_int]
    _lib = lib
    return _lib


class FileWatcher:
    """Watches the parent directories of a set of files."""

    def __init__(self, paths: Iterable[str]):
        self._fd = -1
        lib = _native()
        if lib is None:
            return
        dirs = sorted({os.path.dirname(os.path.abspath(p)) or "." for p in paths})
        fd = lib.rf_watch_create()
        if fd < 0:
            return
        added_any = False
        for d in dirs:
            if lib.rf_watch_add_dir(fd, d.encode()) >= 0:
                added_any = True
        if not added_any:
            lib.rf_watch_close(fd)
            return
        self._fd = fd

    @property
    def active(self) -> bool:
        return self._fd >= 0

    def poll(self) -> bool:
        """True when watched directories saw activity (or no native watcher
        is available — callers then fall back to mtime polling)."""
        if self._fd < 0:
            return True
        lib = _native()
        rc = lib.rf_watch_poll(self._fd)
        if rc < 0:
            return True  # watcher broke: fail open to polling
        return rc == 1

    def close(self) -> None:
        if self._fd >= 0:
            _native().rf_watch_close(self._fd)
            self._fd = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
