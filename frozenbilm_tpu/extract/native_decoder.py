"""ctypes binding for the native C++ decode-prefetch service
(frozenbilm_tpu/native/decode_service.cc). Builds on demand with make/g++.

Usage:
    with DecodeService(n_workers=3) as ds:
        for i, cmd in enumerate(cmds):
            ds.submit(i, cmd)
        ds.finish()
        for job_id, raw in ds:   # completion order
            ...
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdecode_service.so")


def build_library(force: bool = False) -> str:
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


def _load():
    lib = ctypes.CDLL(build_library())
    lib.ds_create.restype = ctypes.c_void_p
    lib.ds_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.ds_submit.restype = ctypes.c_int
    lib.ds_submit.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_char_p), ctypes.c_int]
    lib.ds_finish.argtypes = [ctypes.c_void_p]
    lib.ds_next.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.ds_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                            ctypes.POINTER(ctypes.c_int64)]
    lib.ds_free_result.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    lib.ds_destroy.argtypes = [ctypes.c_void_p]
    return lib


class DecodeService:
    def __init__(self, n_workers: int = 3, capacity: int = 8):
        self._lib = _load()
        self._h = self._lib.ds_create(n_workers, capacity)
        self._finished = False

    def submit(self, job_id: int, argv: List[str]) -> None:
        arr = (ctypes.c_char_p * len(argv))(*[a.encode() for a in argv])
        rc = self._lib.ds_submit(self._h, job_id, arr, len(argv))
        if rc != 0:
            raise RuntimeError("submit after finish/shutdown")

    def finish(self) -> None:
        self._finished = True
        self._lib.ds_finish(self._h)

    def next(self) -> Optional[Tuple[int, Optional[bytes]]]:
        """(job_id, raw bytes or None on failed decode); None when drained."""
        job_id = ctypes.c_int64()
        size = ctypes.c_int64()
        ptr = self._lib.ds_next(self._h, ctypes.byref(job_id), ctypes.byref(size))
        if not ptr:
            if job_id.value == -1:
                return None
            return (job_id.value, None)
        try:
            data = ctypes.string_at(ptr, size.value)
        finally:
            self._lib.ds_free_result(ptr)
        return (job_id.value, data)

    def __iter__(self) -> Iterator[Tuple[int, Optional[bytes]]]:
        while True:
            item = self.next()
            if item is None:
                return
            yield item

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self) -> None:
        if self._h:
            self._lib.ds_destroy(self._h)
            self._h = None


def frames_from_raw(raw: Optional[bytes], height: int, width: int) -> Optional[np.ndarray]:
    """rawvideo rgb24 bytes -> (n, h, w, 3) uint8, or None."""
    if not raw:
        return None
    frame_bytes = height * width * 3
    n = len(raw) // frame_bytes
    if n == 0:
        return None
    return np.frombuffer(raw[: n * frame_bytes], np.uint8).reshape(n, height, width, 3)
