"""MHTC container format — the durable artifact of the codec.

Capability parity: reference L3 writes magic/mode/length + serialized
tables + one bit-serial stream (SURVEY.md §2 L3; mount empty, §0). The
TPU-native container differs in one deliberate way: the payload is a
sequence of independently decodable, byte-aligned blocks with a per-block
bit-length index, so decode parallelism is a property of the FORMAT, not
of the decoder implementation (BASELINE.json:5 "per-block bit offsets").

Layout (little-endian):
  0   4  magic  b"MHTC"
  4   1  version (1)
  5   1  mode    (0 = order-0 Huffman, 1 = Markov-Huffman)
  6   1  flags   bit0: crc32 trailer present; bit1: sub-stream payload
  7   1  log2(decode_unit) when flags bit1, else 0
  8   8  orig_len  u64
  16  4  block_size u32
  20  4  n_blocks  u32
  --- table section ---
  order-0: 128 bytes, nibble-packed code lengths (sym 2i low nibble)
  markov : 32-byte context-presence bitmap, then 128 bytes of nibble-packed
           lengths per present context, ascending context order
  --- index ---
  legacy payload: n_blocks * u32 bit length of each block's stream
  sub-stream payload: n_units * u16 byte length of each unit's stream,
    where units are decode_unit-sized slices of the input
    (n_units = ceil(orig_len / decode_unit)); each unit is byte-aligned
    and independently decodable (Markov context resets per unit)
  --- payload ---
  concatenated byte-aligned streams (block order == unit order)
  --- trailer ---
  crc32 u32 of the original bytes (if flags bit0)

The sub-stream layout is what makes TPU decode fast: sequential decode
length drops from block_size to decode_unit symbols while the number of
parallel lanes multiplies by block_size/decode_unit.

Code lengths alone reconstruct the exact canonical tables on any host
(canonical.py), so tables cost 4 bits/symbol/context with absent contexts
skipped entirely.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

MAGIC = b"MHTC"
VERSION = 1
MODE_ORDER0 = 0
MODE_MARKOV = 1
FLAG_CRC32 = 1
FLAG_SUBSTREAMS = 2
FLAG_PACKED_INDEX = 4

_HEADER = struct.Struct("<4sBBBBQII")


@dataclass
class ContainerMeta:
    mode: int
    orig_len: int
    block_size: int
    n_blocks: int
    flags: int
    decode_unit: int | None   # set when FLAG_SUBSTREAMS
    lengths: np.ndarray       # (256,) order-0 or (256, 256) markov, uint8
    bit_lengths: np.ndarray   # legacy: (n_blocks,) bit lengths, int64
    byte_lengths: np.ndarray  # substream: (n_units,) byte lengths, int64
    index_bytes: int          # serialized index size
    payload_off: int
    crc32: int | None


def pack_nibbles(lengths: np.ndarray) -> bytes:
    """(..., 256) uint8 lengths in 0..15 -> (..., 128) bytes."""
    a = np.asarray(lengths, dtype=np.uint8)
    assert a.shape[-1] % 2 == 0
    lo = a[..., 0::2]
    hi = a[..., 1::2]
    return ((hi << 4) | lo).tobytes()


def unpack_nibbles(raw: bytes, shape) -> np.ndarray:
    b = np.frombuffer(raw, dtype=np.uint8)
    out = np.empty(b.size * 2, dtype=np.uint8)
    out[0::2] = b & 0x0F
    out[1::2] = b >> 4
    return out.reshape(shape)


def serialize_tables(mode: int, lengths: np.ndarray) -> bytes:
    if mode == MODE_ORDER0:
        return pack_nibbles(lengths.reshape(256))
    present = (lengths.reshape(256, 256) > 0).any(axis=1)
    bitmap = np.packbits(present, bitorder="little").tobytes()  # 32 bytes
    rows = pack_nibbles(lengths.reshape(256, 256)[present])
    return bitmap + rows


def parse_tables(mode: int, raw: bytes, off: int):
    if mode == MODE_ORDER0:
        lengths = unpack_nibbles(raw[off:off + 128], (256,))
        return lengths, off + 128
    bitmap = np.frombuffer(raw[off:off + 32], dtype=np.uint8)
    present = np.unpackbits(bitmap, bitorder="little").astype(bool)
    off += 32
    npresent = int(present.sum())
    rows = unpack_nibbles(raw[off:off + 128 * npresent], (npresent, 256))
    off += 128 * npresent
    lengths = np.zeros((256, 256), dtype=np.uint8)
    lengths[present] = rows
    return lengths, off


def pack_index(byte_lens: np.ndarray) -> bytes:
    """Bit-packed unit index: u16 base + u8 nbits + nbits-per-unit
    residuals (LSB-first). Unit stream lengths cluster tightly, so this
    typically costs well under half the flat u16 index."""
    lens = np.asarray(byte_lens, np.int64)
    if lens.size == 0:
        return struct.pack("<HB", 0, 0)
    base = int(lens.min())
    resid = lens - base
    span = int(resid.max())
    nbits = max(span.bit_length(), 0)
    head = struct.pack("<HB", base, nbits)
    if nbits == 0:
        return head
    bits = ((resid[:, None] >> np.arange(nbits)[None, :]) & 1).astype(np.uint8)
    return head + np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_index(raw: bytes, off: int, n_units: int):
    """Inverse of pack_index. Returns (byte_lengths int64, new offset)."""
    if len(raw) < off + 3:
        raise ValueError("mhc: truncated container (packed index header)")
    base, nbits = struct.unpack_from("<HB", raw, off)
    off += 3
    if nbits == 0:
        return np.full(n_units, base, np.int64), off
    nbytes = (n_units * nbits + 7) // 8
    if len(raw) < off + nbytes:
        raise ValueError("mhc: truncated container (packed index)")
    bits = np.unpackbits(np.frombuffer(raw, np.uint8, nbytes, off),
                         bitorder="little")[: n_units * nbits]
    resid = (bits.reshape(n_units, nbits).astype(np.int64)
             << np.arange(nbits)[None, :]).sum(axis=1)
    return base + resid, off + nbytes


def build_container(mode: int, orig_len: int, block_size: int,
                    lengths: np.ndarray, bit_lengths: np.ndarray,
                    payload: bytes, crc: int | None,
                    decode_unit: int | None = None) -> bytes:
    """bit_lengths: per-unit BIT lengths (units are decode_unit slices when
    decode_unit is set, else whole blocks). payload: already-concatenated
    byte-aligned unit streams."""
    flags = FLAG_CRC32 if crc is not None else 0
    if decode_unit is not None and decode_unit != block_size:
        flags |= FLAG_SUBSTREAMS | FLAG_PACKED_INDEX
        du_log2 = decode_unit.bit_length() - 1
        assert (1 << du_log2) == decode_unit, "decode_unit must be pow2"
        n_blocks = (orig_len + block_size - 1) // block_size
        index = pack_index((np.asarray(bit_lengths, np.int64) + 7) // 8)
    else:
        du_log2 = 0
        n_blocks = len(bit_lengths)
        index = np.asarray(bit_lengths, dtype="<u4").tobytes()
    head = _HEADER.pack(MAGIC, VERSION, mode, flags, du_log2,
                        orig_len, block_size, n_blocks)
    tables = serialize_tables(mode, lengths)
    parts = [head, tables, index, payload]
    if crc is not None:
        parts.append(struct.pack("<I", crc & 0xFFFFFFFF))
    return b"".join(parts)


def parse_container(blob: bytes) -> ContainerMeta:
    if len(blob) < _HEADER.size:
        raise ValueError("mhc: truncated container (no header)")
    magic, version, mode, flags, du_log2, orig_len, block_size, n_blocks = \
        _HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("mhc: bad magic — not an MHTC container")
    if version != VERSION:
        raise ValueError(f"mhc: unsupported container version {version}")
    if mode not in (MODE_ORDER0, MODE_MARKOV):
        raise ValueError(f"mhc: unknown mode {mode}")
    off = _HEADER.size
    lengths, off = parse_tables(mode, blob, off)
    idx_start = off
    if flags & FLAG_SUBSTREAMS:
        decode_unit = 1 << du_log2
        n_units = (orig_len + decode_unit - 1) // decode_unit
        bit_lengths = np.zeros((0,), np.int64)
        if flags & FLAG_PACKED_INDEX:
            byte_lengths, off = unpack_index(blob, off, n_units)
        else:
            idx_bytes = 2 * n_units
            if len(blob) < off + idx_bytes:
                raise ValueError("mhc: truncated container (unit index)")
            byte_lengths = np.frombuffer(
                blob[off:off + idx_bytes], dtype="<u2").astype(np.int64)
            off += idx_bytes
    else:
        decode_unit = None
        idx_bytes = 4 * n_blocks
        if len(blob) < off + idx_bytes:
            raise ValueError("mhc: truncated container (block index)")
        bit_lengths = np.frombuffer(
            blob[off:off + idx_bytes], dtype="<u4").astype(np.int64)
        byte_lengths = (bit_lengths + 7) // 8
        off += idx_bytes
    index_bytes = off - idx_start
    payload_len = int(byte_lengths.sum())
    crc = None
    tail = off + payload_len
    if flags & FLAG_CRC32:
        if len(blob) < tail + 4:
            raise ValueError("mhc: truncated container (crc trailer)")
        crc = struct.unpack_from("<I", blob, tail)[0]
    if len(blob) < tail:
        raise ValueError("mhc: truncated container (payload)")
    return ContainerMeta(mode=mode, orig_len=orig_len, block_size=block_size,
                         n_blocks=n_blocks, flags=flags,
                         decode_unit=decode_unit, lengths=lengths,
                         bit_lengths=bit_lengths, byte_lengths=byte_lengths,
                         index_bytes=index_bytes, payload_off=off, crc32=crc)


def split_payload(blob: bytes, meta: ContainerMeta) -> list[bytes]:
    byte_lens = meta.byte_lengths
    offs = np.concatenate([[0], np.cumsum(byte_lens)]) + meta.payload_off
    return [blob[offs[i]:offs[i + 1]] for i in range(len(byte_lens))]


def payload_to_words(blob: bytes, meta: ContainerMeta, W: int,
                     lo: int = 0, hi: int | None = None) -> np.ndarray:
    """Unit-stream unpacking: payload -> (n_units, W) uint32 (native
    threaded memcpy via utils/native.py, numpy-mask fallback).
    [lo, hi) selects a unit range (chunked decode)."""
    from .utils import native
    byte_lens = meta.byte_lengths[lo:hi]
    n_units = len(byte_lens)
    start = int(meta.byte_lengths[:lo].sum())
    total = int(byte_lens.sum())
    flat = np.frombuffer(
        blob, np.uint8, count=total, offset=meta.payload_off + start)
    buf = native.split_rows(flat, byte_lens, W * 4)
    return buf.view(">u4").astype(np.uint32).reshape(n_units, W)


def container_size(meta: ContainerMeta) -> int:
    """Total byte size of the container a meta was parsed from."""
    size = meta.payload_off + int(meta.byte_lengths.sum())
    if meta.flags & FLAG_CRC32:
        size += 4
    return size


def verify_crc(data: bytes, meta: ContainerMeta) -> None:
    if meta.crc32 is not None and (zlib.crc32(data) & 0xFFFFFFFF) != meta.crc32:
        raise ValueError("mhc: crc32 mismatch — corrupt payload or bad decode")
