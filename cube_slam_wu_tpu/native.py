"""ctypes bindings for the native runtime library (native/cubeslam_native.cpp).

Builds the shared library on first use (cached next to the sources) and
exposes: fast table parsing, the aggregating profiler, and the threaded file
prefetcher.  Falls back to pure-python implementations when no C++ toolchain
is available, so the package stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libcubeslam_native.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not _LIB_PATH.exists() or (
            _LIB_PATH.stat().st_mtime
            < (_NATIVE_DIR / "cubeslam_native.cpp").stat().st_mtime
        ):
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
    except (OSError, subprocess.CalledProcessError):
        _build_failed = True
        return None

    lib.csn_parse_table.restype = ctypes.c_int
    lib.csn_parse_table.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.csn_prof_tictoc.argtypes = [ctypes.c_char_p]
    lib.csn_prof_report.restype = ctypes.c_long
    lib.csn_prof_report.argtypes = [ctypes.c_char_p, ctypes.c_long]
    lib.csn_loader_create.restype = ctypes.c_void_p
    lib.csn_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_long,
        ctypes.c_int,
    ]
    lib.csn_loader_get.restype = ctypes.c_long
    lib.csn_loader_get.argtypes = [
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.c_char_p,
        ctypes.c_long,
    ]
    lib.csn_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_table(text: str | bytes, max_rows: int = 100000, max_cols: int = 16) -> np.ndarray:
    """Parse a whitespace numeric table (native fast path with python
    fallback); matches utils.io.read_number_txt semantics."""
    lib = _load()
    if isinstance(text, str):
        text = text.encode()
    if lib is None:
        from cube_slam_wu_tpu.utils.io import read_number_txt
        import io as _io
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
            f.write(text)
            name = f.name
        try:
            return read_number_txt(name)
        finally:
            pathlib.Path(name).unlink()
    out = np.zeros((max_rows, max_cols), dtype=np.float64)
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    lib.csn_parse_table(
        text,
        len(text),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_rows,
        max_cols,
        ctypes.byref(rows),
        ctypes.byref(cols),
    )
    return out[: rows.value, : cols.value].copy()


def read_table(path) -> np.ndarray:
    return parse_table(pathlib.Path(path).read_bytes())


def prof_tictoc(name: str) -> None:
    lib = _load()
    if lib is None:
        from cube_slam_wu_tpu.utils.profiler import GLOBAL

        GLOBAL.tictoc(name)
        return
    lib.csn_prof_tictoc(name.encode())


def prof_report() -> str:
    lib = _load()
    if lib is None:
        from cube_slam_wu_tpu.utils.profiler import GLOBAL

        return GLOBAL.report()
    buf = ctypes.create_string_buffer(1 << 16)
    n = lib.csn_prof_report(buf, len(buf))
    return buf.raw[:n].decode()


def prof_reset() -> None:
    lib = _load()
    if lib is None:
        from cube_slam_wu_tpu.utils.profiler import GLOBAL

        GLOBAL.reset()
        return
    lib.csn_prof_reset()


class FilePrefetcher:
    """Threaded read-ahead over a list of files (native loader when
    available).  Use for overlapping dataset IO with device compute."""

    def __init__(self, paths, n_threads: int = 4):
        self.paths = [str(p) for p in paths]
        self._lib = _load()
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._keepalive = arr
            self._handle = self._lib.csn_loader_create(
                arr, len(self.paths), n_threads
            )
        else:
            self._handle = None

    def get(self, idx: int) -> bytes:
        if self._handle is None:
            return pathlib.Path(self.paths[idx]).read_bytes()
        n = self._lib.csn_loader_get(self._handle, idx, None, 0)
        if n < 0:
            raise IOError(f"prefetch failed: {self.paths[idx]}")
        buf = ctypes.create_string_buffer(n)
        self._lib.csn_loader_get(self._handle, idx, buf, n)
        return buf.raw

    def close(self) -> None:
        if self._handle is not None:
            self._lib.csn_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        return len(self.paths)
