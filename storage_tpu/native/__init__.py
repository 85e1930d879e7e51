"""ctypes bindings for the native host runtime (``storage_native.cpp``).

The library is built on demand with the in-tree Makefile (g++); if no
compiler is available, consumers fall back to the pure-Python paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import typing as tp

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libstorage_native.so")
_lock = threading.Lock()
_lib: tp.Optional[ctypes.CDLL] = None
_build_failed = False

JOB_FN = ctypes.CFUNCTYPE(None, ctypes.c_int64, ctypes.c_void_p)

JOB_PENDING = 0
JOB_RUNNING = 1
JOB_SUCCESS = 2
JOB_ERROR = 3
JOB_CANCELLED = 4


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> tp.Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        src = os.path.join(_DIR, "storage_native.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)

        lib.stpu_inventory_space_reduce.restype = ctypes.c_int
        lib.stpu_inventory_space_reduce.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]

        lib.stpu_job_engine_create.restype = ctypes.c_void_p
        lib.stpu_job_engine_create.argtypes = [ctypes.c_int]
        lib.stpu_job_engine_destroy.argtypes = [ctypes.c_void_p]
        lib.stpu_job_submit.restype = ctypes.c_int64
        lib.stpu_job_submit.argtypes = [ctypes.c_void_p, JOB_FN, ctypes.c_void_p]
        lib.stpu_job_status.restype = ctypes.c_int
        lib.stpu_job_status.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stpu_job_progress.restype = ctypes.c_double
        lib.stpu_job_progress.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stpu_job_set_progress.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double
        ]
        lib.stpu_job_set_status.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        lib.stpu_job_request_cancel.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stpu_job_cancel_requested.restype = ctypes.c_int
        lib.stpu_job_cancel_requested.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stpu_job_wait.restype = ctypes.c_int
        lib.stpu_job_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stpu_job_engine_num_running.restype = ctypes.c_int
        lib.stpu_job_engine_num_running.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib
