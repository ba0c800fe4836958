"""ctypes binding for the native host runtime (native/libmhc_host.so).

The container payload plane — concatenating / splitting up to ~10^5
variable-length unit streams per 100 MB — is host memory-bound; the
native library does it with threaded memcpy. Every entry point has a
numpy fallback so the framework works without the .so (it is built on
demand with `make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "libmhc_host.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", os.path.join(_REPO, "native")],
                           capture_output=True, timeout=120, check=False)
        except Exception:
            pass
    if os.path.exists(_SO):
        try:
            lib = ctypes.CDLL(_SO)
            lib.mhc_join.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.mhc_split.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.mhc_code_lengths.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p]
            lib.mhc_version.restype = ctypes.c_int
            if lib.mhc_version() == 2:
                _lib = lib
        except OSError:
            _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def join_rows(rows: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate per-row prefixes: rows (R, S) uint8, lens (R,) ->
    packed bytes of sum(lens)."""
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    R, S = rows.shape
    offsets = np.zeros(R, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    total = int(lens.sum())
    lib = _load()
    if lib is None:
        mask = np.arange(S)[None, :] < lens[:, None]
        return rows[mask].tobytes()
    out = np.empty(total, dtype=np.uint8)
    lib.mhc_join(rows.ctypes.data, R, S, lens.ctypes.data,
                 offsets.ctypes.data, out.ctypes.data)
    return out.tobytes()


def code_lengths(scaled_counts: np.ndarray, max_len: int) -> np.ndarray:
    """Huffman code lengths for (nctx, 256) pre-rescaled counts — the
    native twin of ops/huffman.code_lengths (bit-identical, tested).
    Falls back to the numpy builder when the .so is absent."""
    counts = np.ascontiguousarray(scaled_counts, dtype=np.int32)
    flat = counts.reshape(-1, 256)
    lib = _load()
    if lib is None:
        from ..ops import huffman
        rows = [huffman.code_lengths_np(row, max_len) for row in flat]
        return np.stack(rows).reshape(scaled_counts.shape).astype(np.uint8)
    out = np.empty(flat.shape, dtype=np.uint8)
    lib.mhc_code_lengths(flat.ctypes.data, flat.shape[0], max_len,
                         out.ctypes.data)
    return out.reshape(scaled_counts.shape)


def split_rows(payload, lens: np.ndarray, stride: int) -> np.ndarray:
    """Inverse of join_rows: packed payload + lens -> (R, stride) uint8
    zero-padded rows."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    R = lens.shape[0]
    offsets = np.zeros(R, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    lib = _load()
    rows = np.zeros((R, stride), dtype=np.uint8)
    if lib is None:
        mask = np.arange(stride)[None, :] < lens[:, None]
        rows[mask] = buf[: int(lens.sum())]
        return rows
    lib.mhc_split(buf.ctypes.data, R, stride, lens.ctypes.data,
                  offsets.ctypes.data, rows.ctypes.data)
    return rows
