"""Public single-process API: compress / decompress.

Capability parity: reference L4 encode/decode drivers (SURVEY.md §2 L4,
§3.1–3.3; mount empty, §0) — two-pass encode (stats, then emit) and
single-pass decode — re-expressed as batched device programs:

  compress:   bytes -> (B, n) block batch -> histogram (MXU matmul)
              -> code lengths (vmapped tree-free Huffman) -> canonical
              tables -> block-parallel bit-pack -> container assembly
  decompress: container -> tables from lengths -> block-parallel scan
              decode -> bytes (+ crc verify)

Multi-chip sharded variants live in `parallel/pipeline.py`.
"""

from __future__ import annotations

import os
import zlib
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import container
from .models.entropy import get_model
from .ops import bitpack

DEFAULT_BLOCK_SIZE = 64 * 1024
# Sequential decode length per lane. Smaller units = more decode lanes
# and fewer sequential steps, but each unit costs index bytes, payload
# alignment padding, and a context reset. 8 KB keeps the 100 MB markov
# container under the reference oracle (0.99991 vs oracle; 4 KB was
# 1.00037 with the aligned layout) at IDENTICAL measured decode speed
# (total symbol-steps per chip are unit-size-invariant; 214 vs 210 ms
# per 16 MB chunk on v5e) while the Pallas stream buffer still fits the
# VMEM budget. Order-0 decode amortizes its loop-invariant table fetch
# over the whole unit, so longer units cost little speed and minimize
# index overhead.
DEFAULT_DECODE_UNIT = 8192
DEFAULT_DECODE_UNIT_ORDER0 = 16384


# Knob resolution lives in mhc_tpu.config (one source of truth — round-2
# review found these defaults duplicated across api/engine/serve). The
# _default_* names are kept as the public spelling used by benches/tests.
from . import config as _cfg

_default_hist_method = _cfg.hist_method
_default_decode_method = _cfg.decode_method
_default_pack_method = _cfg.pack_method


def blockify(data: bytes | np.ndarray, block_size: int):
    """bytes -> ((B, block_size) uint8 padded batch, (B,) int32 valid)."""
    flat = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) \
        else np.asarray(data, dtype=np.uint8).reshape(-1)
    n = flat.size
    if n == 0:
        return np.zeros((0, block_size), np.uint8), np.zeros((0,), np.int32)
    B = (n + block_size - 1) // block_size
    padded = np.zeros(B * block_size, dtype=np.uint8)
    padded[:n] = flat
    n_valid = np.full(B, block_size, dtype=np.int32)
    n_valid[-1] = n - (B - 1) * block_size
    return padded.reshape(B, block_size), n_valid


def build_tables(model, blocks: np.ndarray, n_valid: np.ndarray,
                 hist_method: str | None = None):
    """Two-pass stage 1: global histogram + canonical tables. Returns
    (tables dict of device arrays, lengths uint8 host array for the header)."""
    model = get_model(model)
    method = hist_method or _default_hist_method()
    counts = model.histogram(jnp.asarray(blocks), jnp.asarray(n_valid),
                             method=method)
    lengths = model.lengths_from_counts(np.asarray(counts))
    tables = model.tables_from_lengths(lengths)
    return tables, np.asarray(lengths, dtype=np.uint8)


@jax.jit
def lookup_codes(units, n_valid, tables):
    """Per-symbol (code, len) lookup — flat XLA gathers (~10 G/s on TPU)."""
    cl = lookup_cl(units, n_valid, tables)
    return ((cl & 0xFFFF).astype(jnp.uint32),
            (cl >> 16).astype(jnp.int32))


@jax.jit
def lookup_cl(units, n_valid, tables):
    """Per-symbol PACKED (len<<16 | code) u32 lookup — the form the
    Pallas pack kernel consumes (half the HBM traffic of code+len)."""
    data = units.astype(jnp.int32)
    B, n = data.shape
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), data[:, :-1]], axis=1)
    cl = bitpack._gather_packed(
        tables["codes"], tables["lengths"], prev, data)
    valid = jnp.arange(n)[None, :] < n_valid[:, None]
    return jnp.where(valid, cl, jnp.uint32(0))


@jax.jit
def lookup_cl_t(units, n_valid, tables):
    """lookup_cl in STEP-MAJOR (n, B) layout: the units transpose
    happens on the 1-byte input instead of the 4-byte cl plane, and the
    pack kernel reads the result directly via its BlockSpec (no
    moveaxis relayout of the operand — that cost ~2 ns/byte).

    One body with lookup_cl_sm (delegation): the step-major staging
    relies on the two forms being bit-identical.
    """
    # cast BEFORE transposing: u8 relayouts are pathologically slow on
    # TPU (sublane shuffles per nibble); the i32 transpose uses the
    # fast path
    return lookup_cl_sm(units.astype(jnp.int32).T, n_valid, tables)


def lookup_cl_t_auto(units, n_valid, tables):
    """lookup_cl_t with MHC_LOOKUP resolution: 'pallas' selects the
    VMEM-resident int8 MXU row-fetch kernel (TPU), everything else the
    XLA forms inside lookup_cl_t. Bit-identical outputs (tested)."""
    if _cfg.lookup_method() == "pallas" \
            and jax.default_backend() == "tpu":
        from .ops.kernels import lookup_pallas
        return lookup_pallas.lookup_cl_t_pallas(
            units, n_valid, tables, variant=_cfg.lookup_variant())
    return lookup_cl_t(units, n_valid, tables)


@jax.jit
def lookup_cl_sm(ut, n_valid, tables):
    """lookup_cl_t on PRE-transposed step-major (n, B) units (u8 or i32
    device array): the XLA i32 transpose of the unit batch — measured as
    a large share of the round-3 lookup stage — is replaced by a host-
    side relayout at staging time (engine.stage/compress, NOT codec-time
    device work). Bit-identical to lookup_cl_t on the unit-major batch
    (tested)."""
    ut = ut.astype(jnp.int32)                    # (n, B)
    n, B = ut.shape
    prev = jnp.concatenate(
        [jnp.zeros((1, B), jnp.int32), ut[:-1]], axis=0)
    cl = bitpack._gather_packed(
        tables["codes"], tables["lengths"], prev, ut)
    valid = jnp.arange(n)[:, None] < n_valid[None, :]
    return jnp.where(valid, cl, jnp.uint32(0))


def _fused_variant() -> str:
    """Lookup-table build for the fused lookup+pack megakernel — follows
    MHC_LOOKUP_VARIANT; w3's weighted fold has no fused form (-> i8)."""
    v = _cfg.lookup_variant()
    return v if v in ("i8", "bf16", "rank", "rankbf") else "i8"


def lookup_cl_sm_auto(ut, n_valid, tables):
    """lookup_cl_sm with MHC_LOOKUP resolution (pallas kernel on TPU)."""
    if _cfg.lookup_method() == "pallas" \
            and jax.default_backend() == "tpu":
        from .ops.kernels import lookup_pallas
        return lookup_pallas.lookup_cl_sm_pallas(
            ut, n_valid, tables, variant=_cfg.lookup_variant())
    return lookup_cl_sm(ut, n_valid, tables)


def resolve_decode_unit(block_size: int, decode_unit: int | None,
                        markov: bool = True) -> int:
    """Clamp the decode unit to the block size; units must divide blocks."""
    du = decode_unit or (DEFAULT_DECODE_UNIT if markov
                         else DEFAULT_DECODE_UNIT_ORDER0)
    du = min(du, block_size)
    if block_size % du != 0 or du & (du - 1):
        raise ValueError(
            f"decode_unit {du} must be a power of two dividing "
            f"block_size {block_size}")
    # u16 unit index requires worst-case unit stream < 64 KB
    from .ops.huffman import MAX_CODE_LEN
    if du != block_size and du * MAX_CODE_LEN // 8 >= (1 << 16):
        raise ValueError(f"decode_unit {du} too large for u16 unit index")
    return du


def _is_kernel_compile_error(e: Exception) -> bool:
    """True when `e` looks like a Mosaic/XLA kernel COMPILE failure —
    the only error class the matmul-histogram fallback may swallow
    (ADVICE r3: a bare `except Exception` also hid shape bugs, OOMs and
    relay failures behind a silent recompute)."""
    msg = f"{type(e).__name__}: {e}"
    # Compile-time signatures only (ADVICE r4: RESOURCE_EXHAUSTED and a
    # bare "vmem" also match genuine runtime HBM OOMs, which must NOT be
    # silently retried as a recompute). Mosaic scoped-vmem compile
    # failures mention "Mosaic"/"scoped vmem"/"compil" on this toolchain.
    needles = ("Mosaic", "mosaic", "compil", "scoped vmem",
               "Internal TPU kernel", "Not implemented",
               "NotImplemented", "Unsupported", "HTTP 500",
               "remote_compile")
    return any(n in msg for n in needles)


def _hist_with_fallback(model, devs, hist_method: str):
    """Accumulate the histogram over (units, n_valid) device chunks with
    the guarded Mosaic->matmul fallback shared by api and engine."""
    # materialize: callers may pass a one-shot iterator (zip), and the
    # fallback loop must see EVERY chunk again (round-4 review: a
    # consumed iterator silently dropped chunk 0 from the retry counts)
    devs = list(devs)
    counts = None
    try:
        for ud, nvd in devs:
            c = model.histogram(ud, nvd, method=hist_method)
            counts = c if counts is None else counts + c
    except Exception as e:
        if hist_method == "matmul" or not _is_kernel_compile_error(e):
            raise
        import warnings
        warnings.warn(
            f"mhc: histogram method '{hist_method}' failed to compile "
            f"({type(e).__name__}); falling back to identical-counts "
            "XLA matmul", RuntimeWarning, stacklevel=2)
        counts = None
        for ud, nvd in devs:
            c = model.histogram(ud, nvd, method="matmul")
            counts = c if counts is None else counts + c
    return counts


def _tracer():
    if os.environ.get("MHC_TRACE"):
        from .utils.metrics import Trace
        return Trace()
    return None


def _chunk_units(du: int) -> int:
    """Units per device batch. Chunking bounds HBM/compile size at any
    input size and lets h2d / compute / d2h overlap (async dispatch)."""
    mb = int(os.environ.get("MHC_CHUNK_MB", "16"))
    return max(1, (mb << 20) // du)


def _pad_rows(a: np.ndarray, rows: int) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    pad = np.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], axis=0)


def _d2h_sub() -> int:
    """Device->host transfers are issued as many independent sub-buffers:
    the transport parallelizes across in-flight buffers (measured ~10x
    aggregate over a single large copy on the axon relay)."""
    return int(os.environ.get("MHC_D2H_SUB_MB", "2")) << 20


@partial(jax.jit, static_argnames=("m",))
def _split_flat(x: jnp.ndarray, m: int):
    """One dispatch -> m equal flat sub-buffers (separate device arrays,
    so each gets its own async d2h stream)."""
    x = x.reshape(m, -1)
    return tuple(x[i] for i in range(m))


def _split_count(nbytes: int) -> int:
    """How many equal sub-buffers to split an nbytes transfer into."""
    for sub in (_d2h_sub(), 1 << 20, 1 << 19, 1 << 18):
        if nbytes >= 2 * sub and nbytes % sub == 0:
            return nbytes // sub
    return 1


def _fetch_subs(x: jnp.ndarray):
    """Split a device array into sub-buffers and start their d2h copies.
    Returns the tuple of in-flight device buffers."""
    flat = x.reshape(-1)
    subs = _split_flat(flat, _split_count(flat.size * flat.dtype.itemsize))
    for s in subs:
        s.copy_to_host_async()
    return subs


def _expand_words_u32(payload_d, offsets, word_lens, W):
    """Aligned-payload expansion, MHC_EXPAND_IMPL-resolved (round-3 v5e:
    batched slices 32 ms vs flat gather 107 ms at the 32 MB shape)."""
    impl = _cfg.expand_impl()
    fn = {"slices": bitpack.device_expand_words_slices,
          "blocks": bitpack.device_expand_words_blocks}.get(
        impl, bitpack.device_expand_words_u32)
    return fn(payload_d, offsets, word_lens, W)


def _compact_words(words, offsets, total_pad):
    """Aligned-payload compaction, MHC_COMPACT_IMPL-resolved (round-3
    v5e: batched update-slices 30 ms vs cumsum+gather 107 ms)."""
    impl = _cfg.compact_impl()
    fn = {"slices": bitpack.device_compact_words_slices,
          "blocks": bitpack.device_compact_words_blocks}.get(
        impl, bitpack.device_compact_words)
    return fn(words, offsets, total_pad)


def compress(data: bytes, mode: str = "markov",
             block_size: int = DEFAULT_BLOCK_SIZE,
             hist_method: str | None = None, crc: bool = True,
             pack_method: str | None = None,
             decode_unit: int | None = None) -> bytes:
    model = get_model(mode)
    if block_size & (block_size - 1):
        raise ValueError("block_size must be a power of two")
    tr = _tracer()
    from contextlib import nullcontext
    ph = (lambda *a, **k: nullcontext()) if tr is None else tr.phase
    du = resolve_decode_unit(block_size, decode_unit, model.markov)
    with ph("blockify", len(data)):
        units, n_valid = blockify(data, du)
    orig_len = len(data)
    with ph("crc32", orig_len):
        checksum = (zlib.crc32(data) & 0xFFFFFFFF) if crc else None
    R = units.shape[0]
    if R == 0:
        return container.build_container(
            model.mode, 0, block_size,
            np.zeros((256, 256) if model.markov else (256,), np.uint8),
            np.zeros((0,), np.int64), b"", checksum, decode_unit=du)

    # Chunked two-pass pipeline. One chunk == one static compile shape;
    # the last chunk is zero-row-padded (n_valid 0 rows emit no bits, so
    # containers are byte-identical to the monolithic path).
    C = min(_chunk_units(du), R)
    n_chunks = (R + C - 1) // C
    hist_method = hist_method or _default_hist_method()
    pack_method = pack_method or _default_pack_method()
    device_compact = os.environ.get("MHC_DEVICE_COMPACT", "1") != "0"

    want_sm = (pack_method in ("pallas", "dense", "fused")
               and jax.default_backend() == "tpu"
               and os.environ.get("MHC_STAGE_SM", "1") != "0")
    with ph("h2d", units.nbytes):
        devs = []
        sms = []
        for k in range(n_chunks):
            lo = k * C
            u = _pad_rows(units[lo:lo + C], C)
            nv = _pad_rows(n_valid[lo:lo + C], C)
            devs.append((jnp.asarray(u), jnp.asarray(nv)))
            # host-side step-major relayout: skips the slow device i32
            # transpose in the lookup stage (round 4)
            sms.append(jnp.asarray(np.ascontiguousarray(u.T))
                       if want_sm else None)
    with ph("tables", orig_len):
        counts = _hist_with_fallback(model, devs, hist_method)
        counts.copy_to_host_async()   # avoid the slow cold-fetch path
        lengths = model.lengths_from_counts(np.asarray(counts))
        tables = model.tables_from_lengths(lengths)
        lengths_host = np.asarray(lengths, dtype=np.uint8)
    raw_units = du != block_size          # substream layout only
    with ph("pack", orig_len):
        packed = []
        for (ud, nvd), utd in zip(devs, sms):
            if pack_method == "fused" and utd is not None:
                from .ops.kernels import encode_pallas
                words, bits = encode_pallas.pack_blocks_fused_sm(
                    utd, nvd, tables,
                    variant=_fused_variant())
            elif pack_method in ("pallas", "dense", "fused"):
                from .ops.kernels import encode_pallas
                pk = (encode_pallas.pack_blocks_pallas
                      if pack_method == "pallas"
                      else encode_pallas.pack_blocks_dense)
                cl = (lookup_cl_sm_auto(utd, nvd, tables)
                      if utd is not None
                      else lookup_cl_t_auto(ud, nvd, tables))
                words, bits = pk(cl, step_major=True)
            else:
                encode = (bitpack.encode_blocks_merge
                          if pack_method == "merge"
                          else bitpack.encode_blocks)
                words, bits = encode(ud, nvd,
                                     tables["codes"], tables["lengths"])
            if raw_units:
                words, bits = bitpack.substitute_raw_units(
                    words, bits, ud, nvd,
                    container.aligned_payload(model.mode))
            bits.copy_to_host_async()
            packed.append((words, bits))
    bits_parts = []
    enc_fetch = os.environ.get(
        "MHC_ENC_FETCH", "slice" if device_compact else "padded")
    if enc_fetch == "slice":
        # Dense device slice to the chunk-max stream width + host-side
        # native join: no gathers on device, modest extra bytes on the
        # link, ~20x faster than the on-device byte compaction.
        from .utils import native
        with ph("compact", orig_len):
            pending = []
            for words, bits in packed:
                bits_h = np.asarray(bits).astype(np.int64)
                bits_parts.append(bits_h)
                byte_lens = container.stream_byte_lens(bits_h, model.mode)
                wmax = max((int(byte_lens.max()) + 3) // 4, 1) \
                    if byte_lens.size else 1
                wmax32 = min(-(-wmax // 32) * 32, words.shape[1])
                rows_d = bitpack.device_rows_to_bytes(words, wmax32)
                pending.append((_fetch_subs(rows_d), byte_lens, wmax32))
        with ph("d2h", sum(int(b.sum()) for _, b, _ in pending)):
            fetched = []
            for subs, byte_lens, wmax32 in pending:
                flat = np.concatenate([np.asarray(s) for s in subs])
                rows = flat.reshape(-1, wmax32 * 4)
                fetched.append(native.join_rows(rows, byte_lens))
        payload = b"".join(fetched)
    elif enc_fetch == "compact":
        aligned = container.aligned_payload(model.mode)
        with ph("compact", orig_len):
            pending = []
            for words, bits in packed:
                bits_h = np.asarray(bits).astype(np.int64)
                bits_parts.append(bits_h)
                lens = container.stream_byte_lens(bits_h, model.mode)
                if aligned:
                    lens = lens // 4
                offsets = np.zeros(len(lens) + 1, np.int32)
                np.cumsum(lens, out=offsets[1:])
                total = int(offsets[-1])
                gran = (1 << 18) if aligned else (1 << 20)
                pad = max(-(-total // gran) * gran, gran)
                if aligned:
                    payload_d = _compact_words(
                        words, jnp.asarray(offsets), pad)
                else:
                    payload_d = bitpack.device_compact_payload(
                        words, jnp.asarray(offsets), pad)
                pending.append((_fetch_subs(payload_d), total))
        with ph("d2h", sum((4 if aligned else 1) * t for _, t in pending)):
            fetched = []
            for subs, total in pending:
                flat = np.concatenate([np.asarray(s) for s in subs])
                if aligned:
                    fetched.append(flat[:total].astype(">u4").tobytes())
                else:
                    fetched.append(flat[:total].tobytes())
        payload = b"".join(fetched)
    else:
        with ph("d2h", sum(int(w.size) * 4 for w, _ in packed)):
            parts = []
            for words, bits in packed:
                parts.append((np.asarray(words),
                              np.asarray(bits).astype(np.int64)))
        with ph("marshal", orig_len):
            chunks = []
            for words_h, bits_h in parts:
                bits_parts.append(bits_h)
                chunks.append(bitpack.words_to_payload(
                    words_h, bits_h,
                    aligned=container.aligned_payload(model.mode)))
            payload = b"".join(chunks)
    bits_all = np.concatenate(bits_parts)[:R]
    with ph("container", len(payload)):
        blob = container.build_container(
            model.mode, orig_len, block_size, lengths_host, bits_all,
            payload, checksum, decode_unit=du)
    if tr is not None:
        import sys
        print(f"[mhc-trace compress] {tr.dumps()}", file=sys.stderr)
    return blob


def decompress(blob: bytes, verify: bool = True,
               decode_method: str | None = None) -> bytes:
    """decode_method: 'scan' (XLA scan, any backend) or 'pallas'
    (Mosaic kernel; TPU only — symbol loop runs on-chip with no
    per-step dispatch overhead). Default from MHC_DECODE_METHOD env
    var, else 'scan'."""
    decode_method = decode_method or _default_decode_method()
    tr = _tracer()
    from contextlib import nullcontext
    ph = (lambda *a, **k: nullcontext()) if tr is None else tr.phase
    meta = container.parse_container(blob)
    model = get_model(meta.mode)
    if meta.orig_len == 0:
        return b""
    with ph("tables", 0):
        tables = model.tables_from_lengths(
            jnp.asarray(meta.lengths, jnp.int32))
        jax.block_until_ready(tables["lim"])
    du = meta.decode_unit or meta.block_size
    device_compact = os.environ.get("MHC_DEVICE_COMPACT", "1") != "0"
    byte_lens_all = meta.byte_lengths.astype(np.int64)
    R = len(byte_lens_all)
    fetch_impl = _cfg.fetch_impl()
    refill = _cfg.refill_impl()
    # Stream buffer width: the worst case (15 bits/symbol) pads every unit
    # to ~1.9x the decode unit, but the Mosaic kernel keeps the whole
    # (8, 128, W) tile stream in VMEM — size it by the container's actual
    # max stream length (rounded to the kernel's 128-word lanes so one
    # compile covers all chunks) and keep the worst case only as a cap.
    W_worst = bitpack.words_for_block(du)
    max_bl = int(byte_lens_all.max()) if R else 0
    W = min(W_worst, max(-(-(-(-max_bl // 4) + 1) // 128) * 128, 128))
    if decode_method == "pallas":
        from .ops.kernels import decode_pallas
        # real scoped-VMEM accounting (round 1's 9 MB heuristic ignored
        # the output buffers / fetch table and killed the bench compile)
        n_tiles = -(-min(_chunk_units(du), max(R, 1))
                    // decode_pallas.LANES)
        if decode_pallas.vmem_bytes(W, fetch_impl=fetch_impl,
                                    n_tiles=n_tiles, n_out=du) \
                > decode_pallas.VMEM_BUDGET:
            decode_method = "scan"
    C = min(_chunk_units(du), R)
    n_chunks = (R + C - 1) // C
    starts = np.zeros(R + 1, np.int64)
    np.cumsum(byte_lens_all, out=starts[1:])

    def _decode(words_d, nv_h):
        if decode_method == "pallas":
            from .ops.kernels import decode_pallas
            return decode_pallas.decode_blocks_pallas(
                words_d, tables["lim"], tables["base"],
                tables["first_code"], tables["sorted_syms"],
                n_out=du, markov=model.markov, fetch_impl=fetch_impl,
                refill=refill, lane_tiles=_cfg.lane_tiles_cap(),
                chains=_cfg.decode_chains())
        return bitpack.decode_blocks(
            words_d, jnp.asarray(nv_h),
            tables["lim"], tables["base"], tables["first_code"],
            tables["sorted_syms"], n_out=du, markov=model.markov)

    outs = []
    for k in range(n_chunks):
        lo = k * C
        hi = min(lo + C, R)
        bl = _pad_rows(byte_lens_all[lo:hi].astype(np.int32), C)
        nv = np.full(C, du, dtype=np.int32)
        nv[hi - lo:] = 0
        if hi == R:
            nv[hi - lo - 1] = meta.orig_len - (R - 1) * du
        if device_compact and not (meta.flags & container.FLAG_ALIGNED_PAYLOAD):
            # legacy (round-1) unaligned container: per-byte expansion
            offsets = np.zeros(C + 1, np.int32)
            np.cumsum(bl, out=offsets[1:])
            total = int(offsets[-1])
            total_pad = max(-(-total // (1 << 20)) << 20, 1 << 20)
            flat = np.zeros(total_pad, np.uint8)
            flat[:total] = np.frombuffer(
                blob, np.uint8, total, meta.payload_off + int(starts[lo]))
            with ph("h2d", total):
                payload_d = jnp.asarray(flat)
            with ph("expand", total):
                words_d = bitpack.device_expand_words(
                    payload_d, jnp.asarray(offsets), jnp.asarray(bl), W)
        elif device_compact:
            word_lens = bl // 4
            offsets = np.zeros(C + 1, np.int32)
            np.cumsum(word_lens, out=offsets[1:])
            total_w = int(offsets[-1])
            pad_w = max(-(-total_w // (1 << 18)) << 18, 1 << 18)
            flat = np.zeros(pad_w, np.uint32)
            raw = np.frombuffer(blob, np.uint8, total_w * 4,
                                meta.payload_off + int(starts[lo]))
            flat[:total_w] = raw.copy().view(">u4")
            with ph("h2d", total_w * 4):
                payload_d = jnp.asarray(flat)
            with ph("expand", total_w * 4):
                words_d = _expand_words_u32(
                    payload_d, jnp.asarray(offsets),
                    jnp.asarray(word_lens), W)
        else:
            with ph("unmarshal", int(bl.sum())):
                words = container.payload_to_words(blob, meta, W,
                                                   lo=lo, hi=hi)
                words = _pad_rows(words, C)
            with ph("h2d", int(words.nbytes)):
                words_d = jnp.asarray(words)
        with ph("decode", (hi - lo) * du):
            out = _decode(words_d, nv)
            if meta.flags & container.FLAG_RAW_UNITS:
                # literal units: overwrite the (garbage) entropy-decode
                # rows with the payload bytes (round 5, FLAG_RAW_UNITS)
                raw_m = bitpack.raw_unit_mask(
                    _pad_rows(byte_lens_all[lo:hi], C), nv,
                    bool(meta.flags & container.FLAG_ALIGNED_PAYLOAD))
                if raw_m.any():
                    out = jnp.where(
                        jnp.asarray(raw_m)[:, None],
                        bitpack.words_to_unit_bytes(words_d, du), out)
            outs.append(_fetch_subs(out))
    with ph("d2h", meta.orig_len):
        data = b"".join(np.asarray(s).tobytes()
                        for subs in outs for s in subs)[: meta.orig_len]
    with ph("crc32", meta.orig_len):
        if verify:
            container.verify_crc(data, meta)
    if tr is not None:
        import sys
        print(f"[mhc-trace decompress] {tr.dumps()}", file=sys.stderr)
    return data


# Segment chaining: a file larger than segment_size is stored as a plain
# concatenation of independent containers. Bounds host/device memory and
# keeps every per-context histogram total within int32 (the table-build
# contract — ops/huffman.py), so multi-GB corpora need no special casing.
DEFAULT_SEGMENT_SIZE = 1 << 30


def compress_file(in_path: str, out_path: str, mode: str = "markov",
                  block_size: int = DEFAULT_BLOCK_SIZE,
                  decode_unit: int | None = None, crc: bool = True,
                  segment_size: int = DEFAULT_SEGMENT_SIZE,
                  sharded: bool = False, mesh=None,
                  host_fraction: float | None = None) -> dict:
    """Streaming file compression with segment chaining. Returns stats.
    host_fraction routes that share of units to the hybrid host/device
    executor (hybrid.py); containers are byte-identical either way."""
    total_in = os.path.getsize(in_path)
    total_out = 0
    n_segments = 0
    with open(in_path, "rb") as f, open(out_path, "wb") as out:
        while True:
            seg = f.read(segment_size)
            if not seg and n_segments > 0:
                break
            if sharded:
                from .parallel import pipeline
                blob = pipeline.compress_sharded(
                    seg, mesh, mode=mode, block_size=block_size,
                    crc=crc, decode_unit=decode_unit)
            elif host_fraction is not None:
                from . import hybrid
                blob = hybrid.compress(
                    seg, mode=mode, block_size=block_size, crc=crc,
                    decode_unit=decode_unit, host_fraction=host_fraction)
            else:
                blob = compress(seg, mode=mode, block_size=block_size,
                                crc=crc, decode_unit=decode_unit)
            out.write(blob)
            total_out += len(blob)
            n_segments += 1
            if len(seg) < segment_size:
                break
    return {"orig_bytes": total_in, "compressed_bytes": total_out,
            "ratio": total_out / max(total_in, 1),
            "n_segments": n_segments}


def _next_segment(f, buf: bytes) -> tuple[bytes | None, bytes]:
    """Read exactly one container from file f (with `buf` carry-over from
    the previous read). Returns (segment bytes or None at EOF, new carry).
    Memory is bounded by one segment — never the whole file."""
    if not buf:
        buf = f.read(1 << 18)
        if not buf:
            return None, b""
    while True:
        try:
            meta = container.parse_container(buf, head_only=True)
            break
        except ValueError as e:
            if "truncated" not in str(e):
                raise
            more = f.read(max(len(buf), 1 << 18))
            if not more:
                raise
            buf += more
    size = container.container_size(meta)
    if len(buf) < size:
        rest = f.read(size - len(buf))
        if len(rest) != size - len(buf):
            raise ValueError("mhc: truncated container (payload)")
        return buf + rest, b""
    return buf[:size], buf[size:]


def decompress_file(in_path: str, out_path: str, verify: bool = True,
                    decode_method: str | None = None,
                    sharded: bool = False, mesh=None,
                    host_fraction: float | None = None) -> dict:
    """Streaming decompression of a (possibly segment-chained) file.
    Segments are read and decoded one at a time (constant memory in the
    number of segments — round 1 buffered the entire file)."""
    total_out = 0
    n_segments = 0
    with open(in_path, "rb") as f, open(out_path, "wb") as out:
        carry = b""
        while True:
            seg, carry = _next_segment(f, carry)
            if seg is None:
                break
            if sharded:
                from .parallel import pipeline
                data = pipeline.decompress_sharded(seg, mesh, verify=verify)
            elif host_fraction is not None:
                from . import hybrid
                data = hybrid.decompress(seg, verify=verify,
                                         host_fraction=host_fraction,
                                         decode_method=decode_method)
            else:
                data = decompress(seg, verify=verify,
                                  decode_method=decode_method)
            out.write(data)
            total_out += len(data)
            n_segments += 1
    return {"orig_bytes": total_out, "n_segments": n_segments}


def compression_report(data: bytes, blob: bytes) -> dict:
    """Structured size accounting (SURVEY.md §5 metrics/observability)."""
    meta = container.parse_container(blob)
    index_bytes = meta.index_bytes
    table_bytes = meta.payload_off - 24 - index_bytes
    payload = int(meta.byte_lengths.sum())
    return {
        "orig_bytes": len(data),
        "compressed_bytes": len(blob),
        "ratio": len(blob) / max(len(data), 1),
        "payload_bytes": payload,
        "table_bytes": table_bytes,
        "index_bytes": index_bytes,
        "header_bytes": 24,
        "n_blocks": meta.n_blocks,
        "n_units": len(meta.byte_lengths),
        "block_size": meta.block_size,
        "decode_unit": meta.decode_unit or meta.block_size,
        "mode": "markov" if meta.mode == container.MODE_MARKOV else "huffman",
    }
