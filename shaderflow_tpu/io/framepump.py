"""
ctypes binding + lazy build of the C++ frame pump (framepump.cpp), with a
pure-Python threaded fallback when no compiler is available.

Usage:
    pump = FramePump(fd, slot_size=frame_bytes, slots=5)
    pump.submit(frame_bytes_like)   # returns immediately; worker writes
    pump.close()                    # drain + join, raises on write errors
"""

from __future__ import annotations

import ctypes
import queue
import subprocess
import threading
from pathlib import Path
from typing import Optional

from shaderflow_tpu import logger

_BUILD_DIR = Path(__file__).parent / "_build"
_SOURCE = Path(__file__).parent / "framepump.cpp"
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load_library() -> Optional[ctypes.CDLL]:
    """Compile (once) and load libframepump.so; None if unavailable."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB

    library = _BUILD_DIR / "libframepump.so"
    try:
        if (not library.exists()
                or library.stat().st_mtime < _SOURCE.stat().st_mtime):
            _BUILD_DIR.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(library), str(_SOURCE), "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(library))
        lib.pump_create.restype = ctypes.c_void_p
        lib.pump_create.argtypes = [ctypes.c_int, ctypes.c_size_t, ctypes.c_int]
        lib.pump_submit.restype = ctypes.c_long
        lib.pump_submit.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.pump_flush.restype = ctypes.c_long
        lib.pump_flush.argtypes = [ctypes.c_void_p]
        lib.pump_error.restype = ctypes.c_long
        lib.pump_error.argtypes = [ctypes.c_void_p]
        lib.pump_destroy.restype = ctypes.c_long
        lib.pump_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except Exception as error:
        logger.warn(f"framepump native build unavailable ({error}); "
                    f"falling back to Python writer thread")
        _LIB_FAILED = True
    return _LIB


class FramePump:
    """Asynchronous ordered writer to a file descriptor."""

    def __init__(self, fd: int, slot_size: int, slots: int = 5, native: bool = True):
        self.fd = fd
        self.slot_size = int(slot_size)
        self.slots = max(1, int(slots))
        self._native = None
        self._python: Optional["_PythonPump"] = None

        lib = _load_library() if native else None
        if lib is not None:
            handle = lib.pump_create(fd, self.slot_size, self.slots)
            if handle:
                self._native = (lib, ctypes.c_void_p(handle))
        if self._native is None:
            self._python = _PythonPump(fd, self.slots)

    @property
    def is_native(self) -> bool:
        return self._native is not None

    def submit(self, data) -> None:
        """Queue one buffer for writing (blocks only when all slots busy).

        pump_submit memcpys into its ring slot before returning, so the
        caller's buffer may be reused immediately — numpy arrays are passed
        by pointer, zero intermediate copies."""
        import numpy as np
        if self._native is not None:
            lib, handle = self._native
            if isinstance(data, np.ndarray) and data.flags.c_contiguous:
                pointer, nbytes = data.ctypes.data, data.nbytes
                status = lib.pump_submit(handle, ctypes.c_void_p(pointer), nbytes)
            else:
                view = memoryview(data).cast("B")
                buffer = (ctypes.c_char * len(view)).from_buffer_copy(view)
                status = lib.pump_submit(handle, buffer, len(view))
            if status != 0:
                raise BrokenPipeError(f"framepump write failed (errno {-status})")
        else:
            view = memoryview(data).cast("B")
            self._python.submit(bytes(view))

    def flush(self) -> None:
        if self._native is not None:
            lib, handle = self._native
            status = lib.pump_flush(handle)
            if status != 0:
                raise BrokenPipeError(f"framepump write failed (errno {-status})")
        else:
            self._python.flush()

    def close(self) -> None:
        if self._native is not None:
            lib, handle = self._native
            status = lib.pump_destroy(handle)
            self._native = None
            if status != 0:
                raise BrokenPipeError(f"framepump write failed (errno {-status})")
        elif self._python is not None:
            self._python.close()
            self._python = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class _PythonPump:
    """Fallback: one writer thread + bounded queue (ordered, overlapping)."""

    def __init__(self, fd: int, slots: int):
        import os
        self._write = lambda data: os.write(fd, data)
        self._queue: "queue.Queue[Optional[bytes]]" = queue.Queue(maxsize=slots)
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            try:
                if item is None:
                    return
                if self._error is None:
                    view = memoryview(item)
                    while view.nbytes:
                        wrote = self._write(view)
                        view = view[wrote:]
            except BaseException as error:  # surfaced on next submit/flush
                self._error = error
            finally:
                self._queue.task_done()

    def _check(self) -> None:
        if self._error is not None:
            raise BrokenPipeError(f"frame writer failed: {self._error}")

    def submit(self, data: bytes) -> None:
        self._check()
        self._queue.put(data)

    def flush(self) -> None:
        self._queue.join()
        self._check()

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join()
        self._check()
