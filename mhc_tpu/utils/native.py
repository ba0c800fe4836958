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


_CODEC_VERSION = 5  # keep in sync with mhc_codec_version()


def _stale() -> bool:
    """Rebuild when the .so is missing or older than its sources (the
    version pin below catches binary/ABI drift the mtimes miss)."""
    if not os.path.exists(_SO):
        return True
    so_t = os.path.getmtime(_SO)
    ndir = os.path.dirname(_SO)
    return any(os.path.getmtime(os.path.join(ndir, f)) > so_t
               for f in os.listdir(ndir) if f.endswith(".cpp"))


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if _stale():
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
            lib.mhc_hist_markov.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]
            lib.mhc_hist_order0.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.mhc_build_enc_table.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.mhc_encode_units.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int]
            lib.mhc_build_dec_lut.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.mhc_decode_units.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_int]
            lib.mhc_entropy_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
            lib.mhc_entropy_decode.restype = ctypes.c_int64
            lib.mhc_codec_version.restype = ctypes.c_int
            lib.mhc_version.restype = ctypes.c_int
            if lib.mhc_version() == 2 \
                    and lib.mhc_codec_version() == _CODEC_VERSION:
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


def entropy_decode(coded: bytes, lengths: np.ndarray, n_out: int):
    """Decode n_out symbols of a canonical order-0 stream (container
    metadata sections). Returns (symbols uint8, bytes_consumed).
    Native LUT decoder with a pure-python fallback."""
    lens = np.ascontiguousarray(lengths, dtype=np.uint8)
    A = lens.shape[0]
    src = np.frombuffer(coded, dtype=np.uint8)
    out = np.empty(n_out, dtype=np.uint8)
    if n_out == 0:
        return out, 0
    lib = _load()
    if lib is not None:
        used = lib.mhc_entropy_decode(src.ctypes.data, src.size,
                                      lens.ctypes.data, A, n_out,
                                      out.ctypes.data)
        if used < 0:
            raise ValueError("mhc: corrupt entropy-coded section")
        return out, int(used)
    # python fallback: canonical decode with a 15-bit LUT
    from ..ops.canonical import canonical_codes_np
    full = np.zeros(256, np.int64)
    full[:A] = lens
    t = canonical_codes_np(full)
    codes, ls = t["codes"].astype(np.int64), full
    lut_sym = np.zeros(1 << 15, np.uint8)
    lut_len = np.zeros(1 << 15, np.uint8)
    for s in range(A):
        if ls[s] == 0:
            continue
        a = int(codes[s]) << (15 - int(ls[s]))
        b = (int(codes[s]) + 1) << (15 - int(ls[s]))
        lut_sym[a:b] = s
        lut_len[a:b] = ls[s]
    acc = 0
    nbits = 0
    pos = 0
    bits_used = 0
    nb = src.size
    for i in range(n_out):
        while nbits <= 56:
            acc = (acc | (int(src[pos]) if pos < nb else 0) << (56 - nbits)) \
                & ((1 << 64) - 1)
            pos += 1
            nbits += 8
        w = acc >> (64 - 15)
        l = int(lut_len[w])
        if l == 0:
            raise ValueError("mhc: corrupt entropy-coded section")
        out[i] = lut_sym[w]
        acc = (acc << l) & ((1 << 64) - 1)
        nbits -= l
        bits_used += l
    return out, (bits_used + 7) // 8


def hist_markov(data: np.ndarray, unit: int) -> np.ndarray | None:
    """Threaded (256,256) markov histogram with per-unit context reset.
    Returns None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(data, dtype=np.uint8)
    counts = np.zeros(256 * 256, np.int64)
    lib.mhc_hist_markov(d.ctypes.data, d.size, unit, counts.ctypes.data)
    return counts.reshape(256, 256)


def hist_order0(data: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    d = np.ascontiguousarray(data, dtype=np.uint8)
    counts = np.zeros(256, np.int64)
    lib.mhc_hist_order0(d.ctypes.data, d.size, counts.ctypes.data)
    return counts


def build_enc_table(lengths: np.ndarray) -> np.ndarray | None:
    """(nctx, 256) lengths -> (nctx, 256) packed u32 (len<<16 | code)."""
    lib = _load()
    if lib is None:
        return None
    lens = np.ascontiguousarray(lengths, dtype=np.uint8).reshape(-1, 256)
    packed = np.empty(lens.shape, np.uint32)
    lib.mhc_build_enc_table(lens.ctypes.data, lens.shape[0],
                            packed.ctypes.data)
    return packed


def encode_units(data: np.ndarray, unit: int, packed: np.ndarray,
                 markov: bool, row_stride: int, raw_mode: int = 0):
    """Encode ceil(n/unit) unit streams. Returns (rows, bit_lens).
    raw_mode: 0 = no literal substitution, 1 = unaligned-layout rule,
    2 = word-aligned rule (container FLAG_RAW_UNITS, round 5)."""
    lib = _load()
    d = np.ascontiguousarray(data, dtype=np.uint8)
    n_units = (d.size + unit - 1) // unit
    rows = np.empty((n_units, row_stride), np.uint8)
    bit_lens = np.empty(n_units, np.int64)
    lib.mhc_encode_units(d.ctypes.data, d.size, unit, n_units,
                         np.ascontiguousarray(packed, np.uint32).ctypes.data,
                         1 if markov else 0, rows.ctypes.data, row_stride,
                         bit_lens.ctypes.data, raw_mode)
    return rows, bit_lens


def build_dec_lut(lengths: np.ndarray) -> np.ndarray | None:
    """(nctx, 256) lengths -> (nctx, 2^15) u16 LUT (sym | len<<8)."""
    lib = _load()
    if lib is None:
        return None
    lens = np.ascontiguousarray(lengths, dtype=np.uint8).reshape(-1, 256)
    lut = np.empty((lens.shape[0], 1 << 15), np.uint16)
    lib.mhc_build_dec_lut(lens.ctypes.data, lens.shape[0], lut.ctypes.data)
    return lut


def decode_units(payload: np.ndarray, offsets: np.ndarray,
                 byte_lens: np.ndarray, unit: int, n_total: int,
                 lut: np.ndarray, markov: bool, out: np.ndarray,
                 raw_mode: int = 0) -> None:
    """Decode unit streams into `out` (preallocated, n_units*unit... view).
    out[u*unit : u*unit+m) receives unit u's bytes. raw_mode as in
    encode_units (literal units are memcpy'd through)."""
    lib = _load()
    n_units = len(byte_lens)
    lib.mhc_decode_units(
        np.ascontiguousarray(payload, np.uint8).ctypes.data,
        np.ascontiguousarray(offsets, np.int64).ctypes.data,
        np.ascontiguousarray(byte_lens, np.int64).ctypes.data,
        n_units, unit, n_total, lut.ctypes.data, 1 if markov else 0,
        out.ctypes.data, raw_mode)


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
