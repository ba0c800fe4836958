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
  6   1  flags   bit0: crc32 trailer present
  7   1  reserved (0)
  8   8  orig_len  u64
  16  4  block_size u32
  20  4  n_blocks  u32
  --- table section ---
  order-0: 128 bytes, nibble-packed code lengths (sym 2i low nibble)
  markov : 32-byte context-presence bitmap, then 128 bytes of nibble-packed
           lengths per present context, ascending context order
  --- block index ---
  n_blocks * u32 bit length of each block's stream
  --- payload ---
  concatenated byte-aligned block streams
  --- trailer ---
  crc32 u32 of the original bytes (if flags bit0)

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

_HEADER = struct.Struct("<4sBBBBQII")


@dataclass
class ContainerMeta:
    mode: int
    orig_len: int
    block_size: int
    n_blocks: int
    flags: int
    lengths: np.ndarray       # (256,) order-0 or (256, 256) markov, uint8
    bit_lengths: np.ndarray   # (n_blocks,) int64
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


def build_container(mode: int, orig_len: int, block_size: int,
                    lengths: np.ndarray, bit_lengths: np.ndarray,
                    block_streams: list[bytes], crc: int | None) -> bytes:
    n_blocks = len(block_streams)
    flags = FLAG_CRC32 if crc is not None else 0
    head = _HEADER.pack(MAGIC, VERSION, mode, flags, 0,
                        orig_len, block_size, n_blocks)
    tables = serialize_tables(mode, lengths)
    index = np.asarray(bit_lengths, dtype="<u4").tobytes()
    parts = [head, tables, index, *block_streams]
    if crc is not None:
        parts.append(struct.pack("<I", crc & 0xFFFFFFFF))
    return b"".join(parts)


def parse_container(blob: bytes) -> ContainerMeta:
    if len(blob) < _HEADER.size:
        raise ValueError("mhc: truncated container (no header)")
    magic, version, mode, flags, _, orig_len, block_size, n_blocks = \
        _HEADER.unpack_from(blob, 0)
    if magic != MAGIC:
        raise ValueError("mhc: bad magic — not an MHTC container")
    if version != VERSION:
        raise ValueError(f"mhc: unsupported container version {version}")
    if mode not in (MODE_ORDER0, MODE_MARKOV):
        raise ValueError(f"mhc: unknown mode {mode}")
    off = _HEADER.size
    lengths, off = parse_tables(mode, blob, off)
    idx_bytes = 4 * n_blocks
    if len(blob) < off + idx_bytes:
        raise ValueError("mhc: truncated container (block index)")
    bit_lengths = np.frombuffer(blob[off:off + idx_bytes], dtype="<u4").astype(np.int64)
    off += idx_bytes
    payload_len = int(((bit_lengths + 7) // 8).sum())
    crc = None
    tail = off + payload_len
    if flags & FLAG_CRC32:
        if len(blob) < tail + 4:
            raise ValueError("mhc: truncated container (crc trailer)")
        crc = struct.unpack_from("<I", blob, tail)[0]
    if len(blob) < tail:
        raise ValueError("mhc: truncated container (payload)")
    return ContainerMeta(mode=mode, orig_len=orig_len, block_size=block_size,
                         n_blocks=n_blocks, flags=flags, lengths=lengths,
                         bit_lengths=bit_lengths, payload_off=off, crc32=crc)


def split_payload(blob: bytes, meta: ContainerMeta) -> list[bytes]:
    byte_lens = (meta.bit_lengths + 7) // 8
    offs = np.concatenate([[0], np.cumsum(byte_lens)]) + meta.payload_off
    return [blob[offs[i]:offs[i + 1]] for i in range(meta.n_blocks)]


def verify_crc(data: bytes, meta: ContainerMeta) -> None:
    if meta.crc32 is not None and (zlib.crc32(data) & 0xFFFFFFFF) != meta.crc32:
        raise ValueError("mhc: crc32 mismatch — corrupt payload or bad decode")
