"""Pallas TPU block-parallel bit-pack (encode) kernel.

The XLA packers hit pathological lowerings (gather-based merge: ~584 GB
touched per MB; barrel-shifter merge: ~25 ms/MB of masked dense passes).
This kernel runs the per-lane bit accumulation on-chip like the decode
kernel runs bit consumption: 1024 unit streams per tile, a 64-bit MSB-
aligned accumulator per lane, two code appends + one flush round per
loop iteration.

The flush avoids per-lane scatters entirely: every round writes its word
to a DENSE row (round index) with a validity flag — a "bubble stream".
Lanes emit a word on ~50-94%% of rounds (8 bits/sym avg -> ~50%%); XLA
compacts the bubbles afterwards with one cumsum + one scatter (both fast
on TPU). Table lookups (prev,cur)->(code,len) also stay in XLA — flat
gathers measured at ~10 G lookups/s.

All primitives used here were individually verified on the v5e Mosaic
toolchain (variable per-lane shifts, masked selects, dense dynamic-row
stores, grid+scratch state).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..huffman import MAX_CODE_LEN
from ..bitpack import words_for_block

LANES = 1024
CHUNK_STEPS = 256          # symbols per grid chunk (2 appends/round)
# Rounds per fori_loop iteration: the Mosaic loop costs ~6.5 us/iter in
# FIXED overhead (bench/loop_calib.py) while the ~40 chained vector ops
# of one pack round cost ~2 ns each — unrolling is a near-linear win.
PACK_UNROLL = 16


def _append(a0, a1, cnt, code, ln):
    """Insert `ln` bits of `code` at bit offset cnt of the 64-bit acc."""
    for w in range(2):
        shift = 32 * (w + 1) - cnt - ln            # (8,128) i32
        left = code << jnp.clip(shift, 0, 31).astype(jnp.uint32)
        right = code >> jnp.clip(-shift, 0, 31).astype(jnp.uint32)
        piece = jnp.where(shift >= 0,
                          jnp.where(shift <= 31, left, 0),
                          jnp.where(shift >= -31, right, 0))
        if w == 0:
            a0 = a0 | piece
        else:
            a1 = a1 | piece
    return a0, a1, cnt + ln


def _pack_round(a0, a1, cnt, codes2, lens2):
    """Two appends + one flush. codes2/lens2: tuple of 2 (8,128) arrays."""
    for k in range(2):
        a0, a1, cnt = _append(a0, a1, cnt, codes2[k], lens2[k])
    emit = cnt >= 32
    word = a0
    a0 = jnp.where(emit, a1, a0)
    a1 = jnp.where(emit, jnp.uint32(0), a1)
    cnt = cnt - jnp.where(emit, 32, 0)
    return a0, a1, cnt, word, emit.astype(jnp.int32)


def _pack_kernel(cl_ref, bw_ref, bv_ref, tail_ref, nbits_ref,
                 a0s, a1s, cnts, totals, *, out_chunk: int, n_chunks: int,
                 unroll: int = PACK_UNROLL, step_major: bool = False):
    # cl_ref: PACKED (len<<16 | code) u32 per symbol — one operand
    # stream instead of separate code+len planes. Block layout is
    # (1, steps, 8, 128) or (steps, 1, 8, 128) when step_major.
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        a0s[:] = jnp.zeros((8, 128), jnp.uint32)
        a1s[:] = jnp.zeros((8, 128), jnp.uint32)
        cnts[:] = jnp.zeros((8, 128), jnp.int32)
        totals[:] = jnp.zeros((8, 128), jnp.int32)

    def _cl(j):
        return cl_ref[j, 0] if step_major else cl_ref[0, j]

    def body(i, carry):
        a0, a1, cnt, tot = carry
        for r in range(unroll):           # amortize the per-iter tax
            j = i * unroll + r
            cl0 = _cl(2 * j)
            cl1 = _cl(2 * j + 1)
            c0 = cl0 & jnp.uint32(0xFFFF)
            c1 = cl1 & jnp.uint32(0xFFFF)
            l0 = (cl0 >> jnp.uint32(16)).astype(jnp.int32)
            l1 = (cl1 >> jnp.uint32(16)).astype(jnp.int32)
            a0, a1, cnt, word, valid = _pack_round(
                a0, a1, cnt, (c0, c1), (l0, l1))
            bw_ref[0, j] = word
            bv_ref[0, j] = valid
            tot = tot + l0 + l1
        return a0, a1, cnt, tot

    carry = (a0s[:], a1s[:], cnts[:], totals[:])
    a0, a1, cnt, tot = jax.lax.fori_loop(
        0, out_chunk // 2 // unroll, body, carry)
    a0s[:] = a0
    a1s[:] = a1
    cnts[:] = cnt
    totals[:] = tot

    @pl.when(o == n_chunks - 1)
    def _fin():
        # cnt <= 31 here (flush keeps it below 32); a0 holds the tail bits
        tail_ref[0] = a0
        nbits_ref[0] = tot


# ---------------------------------------------------------------------------
# Dense pack (round 3): in-kernel word-stream assembly.
#
# The bubble-stream kernel writes (word, valid) pairs to HBM and leaves
# densification to an XLA cumsum+scatter — measured ~9 ns per round slot
# on v5e (~0.15 s of the 32 MB encode, the single largest encode stage
# after the lookup). This variant assembles each lane's dense word
# stream ON CHIP with the decode kernel's group-window machinery run in
# REVERSE: every emitted word is inserted into a 2-group VMEM lookahead
# window at the lane's word pointer, and once per unrolled iteration the
# window is flushed into the (W, 8, 128) output stack (two masked
# selects per 16-word slab) and rotated when a lane crosses a group
# boundary. Output is the dense zero-padded (R, W) word matrix — the
# same contract as pack_blocks_pallas — with no scatter anywhere.

PGRP = 16            # pack window group (words); sync period (rounds)
PLOG2 = 4
PWINDOW = 2 * PGRP   # per-lane window: current + next group


def _window_flush_rotate(out_ref, win, gb, wp, W: int):
    """Write both window halves into the output stack and advance the
    window base to the lane's current group. Idempotent: slots past a
    lane's wp are zeros in the window and zeros in the (zero-init)
    output, so partial groups may be flushed many times. Shared by the
    dense and fused pack kernels — their word/bit outputs must stay
    bit-identical (tested)."""
    gbw = jnp.broadcast_to(gb[None], (PGRP, 8, 128))
    win0 = win[:PGRP]
    win1 = win[PGRP:]
    for g in range(W // PGRP):
        slab = out_ref[0, g * PGRP:(g + 1) * PGRP]
        slab = jnp.where(gbw == g, win0, slab)
        if g > 0:
            slab = jnp.where(gbw == g - 1, win1, slab)
        out_ref[0, g * PGRP:(g + 1) * PGRP] = slab
    g0 = wp >> PLOG2
    moved = jnp.broadcast_to((g0 > gb)[None], (PGRP, 8, 128))
    new_win = jnp.concatenate(
        [jnp.where(moved, win1, win0),
         jnp.where(moved, jnp.int32(0), win1)], axis=0)
    return new_win, g0


def _pack_dense_kernel(cl_ref, out_ref, nbits_ref,
                       a0s, a1s, cnts, wps, tots, wins, gbs,
                       *, W: int, n_chunks: int,
                       unroll: int = PACK_UNROLL,
                       step_major: bool = False):
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        a0s[:] = jnp.zeros((8, 128), jnp.uint32)
        a1s[:] = jnp.zeros((8, 128), jnp.uint32)
        cnts[:] = jnp.zeros((8, 128), jnp.int32)
        wps[:] = jnp.zeros((8, 128), jnp.int32)
        tots[:] = jnp.zeros((8, 128), jnp.int32)
        wins[:] = jnp.zeros((PWINDOW, 8, 128), jnp.int32)
        gbs[:] = jnp.zeros((8, 128), jnp.int32)
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def _cl(j):
        return cl_ref[j, 0] if step_major else cl_ref[0, j]

    w32_iota = jax.lax.broadcasted_iota(jnp.int32, (PWINDOW, 8, 128), 0)

    def _flush_rotate(win, gb, wp):
        return _window_flush_rotate(out_ref, win, gb, wp, W)

    def body(i, carry):
        a0, a1, cnt, wp, tot, win, gb = carry
        # sync: a lane emits at most `unroll` <= PGRP words per
        # iteration, so flushing+rotating once per iteration keeps every
        # insert inside the 2-group window
        win, gb = _flush_rotate(win, gb, wp)
        gbase = gb << PLOG2
        for r in range(unroll):
            j = i * unroll + r
            cl0 = _cl(2 * j)
            cl1 = _cl(2 * j + 1)
            c0 = cl0 & jnp.uint32(0xFFFF)
            c1 = cl1 & jnp.uint32(0xFFFF)
            l0 = (cl0 >> jnp.uint32(16)).astype(jnp.int32)
            l1 = (cl1 >> jnp.uint32(16)).astype(jnp.int32)
            a0, a1, cnt, word, valid = _pack_round(
                a0, a1, cnt, (c0, c1), (l0, l1))
            off = jnp.broadcast_to((wp - gbase)[None],
                                   (PWINDOW, 8, 128))
            hit = jnp.broadcast_to((valid > 0)[None], (PWINDOW, 8, 128))
            win = jnp.where((w32_iota == off) & hit,
                            word.astype(jnp.int32), win)
            wp = wp + valid
            tot = tot + l0 + l1
        return a0, a1, cnt, wp, tot, win, gb

    carry = (a0s[:], a1s[:], cnts[:], wps[:], tots[:],
             wins[:], gbs[:])
    rounds = cl_ref.shape[0 if step_major else 1] // 2
    a0, a1, cnt, wp, tot, win, gb = jax.lax.fori_loop(
        0, rounds // unroll, body, carry)

    @pl.when(o == n_chunks - 1)
    def _fin():
        # append the MSB-aligned partial tail word (cnt <= 31 bits),
        # then flush everything still in the window
        off = jnp.broadcast_to((wp - (gb << PLOG2))[None],
                               (PWINDOW, 8, 128))
        hit = jnp.broadcast_to((cnt > 0)[None], (PWINDOW, 8, 128))
        fwin = jnp.where((w32_iota == off) & hit,
                         a0.astype(jnp.int32), win)
        _flush_rotate(fwin, gb, wp)
        nbits_ref[0] = tot

    a0s[:] = a0
    a1s[:] = a1
    cnts[:] = cnt
    wps[:] = wp
    tots[:] = tot
    wins[:] = win
    gbs[:] = gb


@partial(jax.jit, static_argnames=("max_len", "interpret", "step_major"))
def pack_blocks_dense(codes: jnp.ndarray, lens: jnp.ndarray | None = None,
                      max_len: int = MAX_CODE_LEN,
                      interpret: bool = False,
                      step_major: bool = False):
    """Dense-output form of pack_blocks_pallas (bit-identical contract,
    tested): (R, n) codes/lens or packed step-major cl -> (words (R, W)
    u32 zero-padded, bits (R,) u32) with NO bubble stream and NO XLA
    scatter."""
    # Constant-drift guards (ADVICE r3): the kernel's window-capacity
    # argument needs <= PGRP emitted words per sync (one sync per
    # unrolled iteration; one word per round), and the fori_loop's
    # floor-divided trip count silently DROPS tail rounds unless the
    # unroll divides the rounds-per-chunk.
    assert PACK_UNROLL <= PGRP, \
        f"PACK_UNROLL={PACK_UNROLL} > PGRP={PGRP}: window can overflow"
    assert (CHUNK_STEPS // 2) % PACK_UNROLL == 0, \
        f"PACK_UNROLL={PACK_UNROLL} must divide {CHUNK_STEPS // 2} rounds"
    cl = _cl_packed(codes, lens)
    if step_major:
        n, R = cl.shape
    else:
        R, n = cl.shape
    W_exact = words_for_block(n, max_len)
    W = -(-W_exact // PGRP) * PGRP
    n_tiles = (R + LANES - 1) // LANES
    Rp = n_tiles * LANES
    n_pad = (n + CHUNK_STEPS - 1) // CHUNK_STEPS * CHUNK_STEPS
    if step_major:
        if Rp != R or n_pad != n:
            cl = jnp.pad(cl, ((0, n_pad - n), (0, Rp - R)))
        cl4 = cl.reshape(n_pad, n_tiles, 8, 128)
        in_spec = pl.BlockSpec((CHUNK_STEPS, 1, 8, 128),
                               lambda t, o: (o, t, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        if Rp != R:
            cl = jnp.pad(cl, ((0, Rp - R), (0, 0)))
        if n_pad != n:
            cl = jnp.pad(cl, ((0, 0), (0, n_pad - n)))
        cl4 = jnp.moveaxis(cl.reshape(n_tiles, 8, 128, n_pad), 3, 1)
        in_spec = pl.BlockSpec((1, CHUNK_STEPS, 8, 128),
                               lambda t, o: (t, o, 0, 0),
                               memory_space=pltpu.VMEM)
    n_chunks = n_pad // CHUNK_STEPS
    kernel = partial(_pack_dense_kernel, W=W, n_chunks=n_chunks,
                     step_major=step_major)
    out, nbits = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[in_spec],
        out_specs=(
            pl.BlockSpec((1, W, 8, 128), lambda t, o: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, W, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.uint32),           # a0
            pltpu.VMEM((8, 128), jnp.uint32),           # a1
            pltpu.VMEM((8, 128), jnp.int32),            # cnt
            pltpu.VMEM((8, 128), jnp.int32),            # wp
            pltpu.VMEM((8, 128), jnp.int32),            # tot
            pltpu.VMEM((PWINDOW, 8, 128), jnp.int32),   # window
            pltpu.VMEM((8, 128), jnp.int32),            # group base
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(3 * W * 8 * 128 * 4, 64 << 20), 120 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=int(Rp) * n_pad * 60,
            bytes_accessed=int(cl4.size) * 4 + int(Rp) * W * 4,
            transcendentals=0),
        interpret=interpret,
    )(cl4)
    words = jnp.moveaxis(out, 1, 3).reshape(Rp, W).astype(jnp.uint32)
    nbits_r = nbits.reshape(Rp).astype(jnp.uint32)
    Wc = words_for_block(n, max_len)
    return words[:R, :Wc], nbits_r[:R]


def _cl_packed(codes: jnp.ndarray, lens: jnp.ndarray | None):
    """Accept either separate (codes, lens) planes or the packed
    (len<<16 | code) u32 form (lens=None) that api.lookup_cl emits."""
    if lens is None:
        return codes.astype(jnp.uint32)
    return ((lens.astype(jnp.uint32) << 16) | codes.astype(jnp.uint32))


def _run_bubble_pack(cl: jnp.ndarray, interpret: bool,
                     step_major: bool = False):
    """Shared bubble-stream kernel driver -> (bwr (Rp, rounds) words,
    bvr valid, tail, nbits) host-order rows.

    cl: (R, n) packed (len<<16|code), or (n, R) when step_major=True
    (api.lookup_cl_t) — the step-major form feeds the kernel through
    its BlockSpec with NO moveaxis relayout of the operand."""
    if step_major:
        n, R = cl.shape
    else:
        R, n = cl.shape
    n_tiles = (R + LANES - 1) // LANES
    Rp = n_tiles * LANES
    n_pad = (n + CHUNK_STEPS - 1) // CHUNK_STEPS * CHUNK_STEPS
    if step_major:
        if Rp != R or n_pad != n:
            cl = jnp.pad(cl, ((0, n_pad - n), (0, Rp - R)))
        # (steps, tiles, 8, 128): pure reshape — the BlockSpec index map
        # does the (t, o) -> (o, t) swap, so no data movement happens
        cl4 = cl.reshape(n_pad, n_tiles, 8, 128)
        in_spec = pl.BlockSpec((CHUNK_STEPS, 1, 8, 128),
                               lambda t, o: (o, t, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        if Rp != R:
            cl = jnp.pad(cl, ((0, Rp - R), (0, 0)))
        if n_pad != n:
            cl = jnp.pad(cl, ((0, 0), (0, n_pad - n)))
        # (tiles, steps, 8, 128): step-major so each lane reads dense rows
        cl4 = jnp.moveaxis(cl.reshape(n_tiles, 8, 128, n_pad), 3, 1)
        in_spec = pl.BlockSpec((1, CHUNK_STEPS, 8, 128),
                               lambda t, o: (t, o, 0, 0),
                               memory_space=pltpu.VMEM)
    n_chunks = n_pad // CHUNK_STEPS
    n_rounds = n_pad // 2
    kernel = partial(_pack_kernel, out_chunk=CHUNK_STEPS,
                     n_chunks=n_chunks, step_major=step_major)
    bw, bv, tail, nbits = pl.pallas_call(
        kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[in_spec],
        out_specs=(
            pl.BlockSpec((1, CHUNK_STEPS // 2, 8, 128),
                         lambda t, o: (t, o, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK_STEPS // 2, 8, 128),
                         lambda t, o: (t, o, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, n_rounds, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, n_rounds, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.uint32),
            pltpu.VMEM((8, 128), jnp.uint32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(Rp) * n_pad * 30,
            bytes_accessed=int(cl4.size) * 8,
            transcendentals=0),
        interpret=interpret,
    )(cl4)
    bwr = jnp.moveaxis(bw, 1, 3).reshape(Rp, n_rounds)
    bvr = jnp.moveaxis(bv, 1, 3).reshape(Rp, n_rounds)
    tail_r = tail.reshape(Rp)
    nbits_r = nbits.reshape(Rp).astype(jnp.uint32)
    return bwr, bvr, tail_r, nbits_r, Rp


@partial(jax.jit, static_argnames=("max_len", "interpret", "step_major"))
def pack_blocks_pallas(codes: jnp.ndarray, lens: jnp.ndarray | None = None,
                       max_len: int = MAX_CODE_LEN,
                       interpret: bool = False,
                       step_major: bool = False):
    """codes/lens: (R, n) per-symbol codes and lengths (0-len = masked),
    or the packed (len<<16 | code) u32 plane with lens=None — (n, R)
    step-major from api.lookup_cl_t when step_major=True.

    Returns (words (R, W) uint32, bits (R,) uint32) — same contract as
    encode_blocks/encode_blocks_merge given precomputed codes+lens.
    """
    n, R = codes.shape if step_major else codes.shape[::-1]
    W = words_for_block(n, max_len)
    bwr, bvr, tail_r, nbits_r, Rp = _run_bubble_pack(
        _cl_packed(codes, lens), interpret, step_major)
    # XLA compaction: bubble rows -> dense per-unit word streams.
    # Invalid slots are sent OUT OF BOUNDS (dropped by mode="drop") so
    # the remaining indices are provably unique — unique_indices lets
    # XLA:TPU vectorize the scatter instead of serializing updates.
    pos = jnp.cumsum(bvr, axis=1) - 1
    unit_idx = jnp.arange(Rp)[:, None]
    dump = jnp.int32(W + 1)
    words = jnp.zeros((Rp, W + 1), jnp.uint32)
    words = words.at[unit_idx,
                     jnp.where(bvr > 0, pos, dump)].set(
        bwr, mode="drop", unique_indices=True)
    # append the tail partial word where bits remain
    nwords = (nbits_r >> 5).astype(jnp.int32)
    has_tail = (nbits_r & 31) > 0
    words = words.at[jnp.arange(Rp),
                     jnp.where(has_tail, nwords, dump)].set(
        tail_r, mode="drop", unique_indices=True)
    return words[:R, :W], nbits_r[:R]


@partial(jax.jit, static_argnames=("max_len", "interpret", "step_major"))
def pack_blocks_to_payload(codes: jnp.ndarray,
                           lens: jnp.ndarray | None = None,
                           max_len: int = MAX_CODE_LEN,
                           interpret: bool = False,
                           step_major: bool = False):
    """Fused pack + aligned-payload compaction: bubble stream -> dense
    4-byte-aligned payload in ONE scatter, with the per-unit word
    offsets computed on device (exclusive cumsum of ceil(bits/32)).

    Replaces pack_blocks_pallas + device_compact_words for the aligned
    (markov) layout: skips materializing the per-unit (R, W) word
    matrix AND the host round-trip for offsets. Returns
    (payload (R_pad*W,) uint32, bits (R,) uint32); payload positions at
    offsets[r]..offsets[r]+ceil(bits[r]/32) hold unit r's stream,
    positions past offsets[-1] are zero — byte-identical to the
    two-step path (tested)."""
    n, R = codes.shape if step_major else codes.shape[::-1]
    W = words_for_block(n, max_len)
    bwr, bvr, tail_r, nbits_r, Rp = _run_bubble_pack(
        _cl_packed(codes, lens), interpret, step_major)
    word_lens = ((nbits_r + 31) >> 5).astype(jnp.int32)
    offsets = jnp.cumsum(word_lens) - word_lens          # exclusive
    total_pad = Rp * W
    pos = jnp.cumsum(bvr, axis=1) - 1
    gidx = offsets[:, None] + pos
    # invalid slots go OUT OF BOUNDS (dropped) -> remaining indices are
    # unique, letting XLA:TPU vectorize the scatter
    gidx = jnp.where(bvr > 0, gidx, total_pad + 1)
    payload = jnp.zeros((total_pad + 1,), jnp.uint32)
    payload = payload.at[gidx.reshape(-1)].set(
        bwr.reshape(-1), mode="drop", unique_indices=True)
    nwords = (nbits_r >> 5).astype(jnp.int32)
    has_tail = (nbits_r & 31) > 0
    tpos = jnp.where(has_tail, offsets + nwords, total_pad + 1)
    payload = payload.at[tpos].set(tail_r, mode="drop",
                                   unique_indices=True)
    return payload[:total_pad], nbits_r[:R]


def pack_tile_reference(codes_tile: jnp.ndarray, lens_tile: jnp.ndarray):
    """Pure-jnp mirror of the kernel rounds for ONE (n, 8, 128) tile
    (step-major). Returns (bubble words (rounds,8,128), valid, tail,
    nbits) — the correctness oracle for the Mosaic kernel math."""
    n = codes_tile.shape[0]

    def body(carry, i):
        a0, a1, cnt, tot = carry
        a0, a1, cnt, word, valid = _pack_round(
            a0, a1, cnt,
            (codes_tile[2 * i], codes_tile[2 * i + 1]),
            (lens_tile[2 * i], lens_tile[2 * i + 1]))
        tot = tot + lens_tile[2 * i] + lens_tile[2 * i + 1]
        return (a0, a1, cnt, tot), (word, valid)

    carry = (jnp.zeros((8, 128), jnp.uint32), jnp.zeros((8, 128), jnp.uint32),
             jnp.zeros((8, 128), jnp.int32), jnp.zeros((8, 128), jnp.int32))
    (a0, a1, cnt, tot), (words, valids) = jax.lax.scan(
        body, carry, jnp.arange(n // 2))
    return words, valids, a0, tot


def compact_bubbles(bwr, bvr, tail_r, nbits_r, W: int):
    """XLA compaction of bubble rows -> (R, W) dense word streams."""
    Rp = bwr.shape[0]
    pos = jnp.cumsum(bvr, axis=1) - 1
    unit_idx = jnp.arange(Rp)[:, None]
    dump = jnp.int32(W + 1)                    # OOB -> unique indices
    words = jnp.zeros((Rp, W + 1), jnp.uint32)
    words = words.at[unit_idx,
                     jnp.where(bvr > 0, pos, dump)].set(
        bwr, mode="drop", unique_indices=True)
    nwords = (nbits_r >> 5).astype(jnp.int32)
    has_tail = (nbits_r & 31) > 0
    words = words.at[jnp.arange(Rp),
                     jnp.where(has_tail, nwords, dump)].set(
        tail_r, mode="drop", unique_indices=True)
    return words[:, :W]


# ---------------------------------------------------------------------------
# Fused lookup+pack megakernel (round 4).
#
# The split pipeline writes the 4 B/sym packed cl plane to HBM (lookup)
# and re-reads it (pack) — ~8 B/sym of HBM traffic plus one dispatch.
# This kernel reads the raw 4 B/sym step-major symbol stream and runs
# the lookup_pallas fetch (one-hot + VMEM-resident plane-stack MXU
# contraction, data-independent steps that the scheduler pipelines)
# DIRECTLY into the dense pack rounds (serial per-lane bit chain): the
# cl plane never exists, and the pack's cheap serial VPU work overlaps
# the lookup's MXU fetches. Bit-identical to lookup_cl_sm_* followed by
# pack_blocks_dense (tested).

def _fused_kernel(ft_ref, nv_ref, sym_ref, out_ref, nbits_ref,
                  a0s, a1s, cnts, wps, tots, wins, gbs, ctxs,
                  *, W: int, n_chunks: int, unroll: int = PACK_UNROLL,
                  variant: str = "i8"):
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        a0s[:] = jnp.zeros((8, 128), jnp.uint32)
        a1s[:] = jnp.zeros((8, 128), jnp.uint32)
        cnts[:] = jnp.zeros((8, 128), jnp.int32)
        wps[:] = jnp.zeros((8, 128), jnp.int32)
        tots[:] = jnp.zeros((8, 128), jnp.int32)
        wins[:] = jnp.zeros((PWINDOW, 8, 128), jnp.int32)
        gbs[:] = jnp.zeros((8, 128), jnp.int32)
        ctxs[:] = jnp.zeros((8, 128), jnp.int32)
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    ft = ft_ref[:]                  # (256, 768|316) int8 | bf16
    nv = nv_ref[0]                          # (8, 128) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (15, 8, 128), 0) + 1
    dn = (((0,), (0,)), ((), ()))
    bf_variants = ("bf16", "rankbf")
    oh_dt = jnp.bfloat16 if variant in bf_variants else jnp.int8
    acc_dt = jnp.float32 if variant in bf_variants else jnp.int32
    boundary_ctx = ctxs[:]
    w32_iota = jax.lax.broadcasted_iota(jnp.int32, (PWINDOW, 8, 128), 0)

    def _flush_rotate(win, gb, wp):
        # shared machinery with _pack_dense_kernel: the fused kernel's
        # contract is word/bit identity with the dense packer
        return _window_flush_rotate(out_ref, win, gb, wp, W)

    def _lookup_one(oh, cur, jg):
        """One (code, len) fetch; returns (code u32, len i32, cur sel)."""
        x = jax.lax.dot_general(ft, oh, dimension_numbers=dn,
                                preferred_element_type=acc_dt)
        curw = jnp.broadcast_to(cur[None], (256, 8, 128))
        sel = curw == iota
        if variant in ("rank", "rankbf"):
            # rank-table resolve (round 5) — identical math to
            # lookup_pallas's rank variants: one 256-deep rank pick,
            # len from 14 rank-vs-cum compares, code = fcb[len]+rank-256
            if variant == "rankbf":
                rankv = jnp.sum(jnp.where(sel, x[0:256], 0.0),
                                axis=0).astype(jnp.int32)
                pr = x[256:316].astype(jnp.int32)
            else:
                rankv = jnp.sum(jnp.where(sel, x[0:256], 0),
                                axis=0) + 128
                pr = x[256:316] + 128
            cum = pr[0:14] | (pr[15:29] << 8)
            rw = jnp.broadcast_to(rankv[None], cum.shape)
            length = 1 + jnp.sum((rw >= cum).astype(jnp.int32), axis=0)
            fcb_rows = pr[30:45] | (pr[45:60] << 8)
            lw = jnp.broadcast_to(length[None], fcb_rows.shape)
            fcb = jnp.sum(jnp.where(liota == lw, fcb_rows, 0), axis=0)
            valid = jg < nv
            code = jnp.where(valid, fcb + rankv - 256,
                             0).astype(jnp.uint32)
            ln = jnp.where(valid, length, 0)
            return code, ln, sel
        if variant == "bf16":
            y0 = jnp.sum(jnp.where(sel, x[0:256], 0.0),
                         axis=0).astype(jnp.int32)
            y1 = jnp.sum(jnp.where(sel, x[256:512], 0.0),
                         axis=0).astype(jnp.int32)
            y2 = jnp.sum(jnp.where(sel, x[512:768], 0.0),
                         axis=0).astype(jnp.int32)
        else:
            y0 = jnp.sum(jnp.where(sel, x[0:256], 0), axis=0) + 128
            y1 = jnp.sum(jnp.where(sel, x[256:512], 0), axis=0) + 128
            y2 = jnp.sum(jnp.where(sel, x[512:768], 0), axis=0) + 128
        valid = jg < nv
        code = jnp.where(valid, y0 | (y1 << 8), 0).astype(jnp.uint32)
        ln = jnp.where(valid, y2, 0)
        return code, ln, sel

    def body(i, carry):
        a0, a1, cnt, wp, tot, win, gb = carry
        win, gb = _flush_rotate(win, gb, wp)
        sel_prev = None
        for r in range(unroll):
            j0 = 2 * (i * unroll + r)
            j1 = j0 + 1
            cur0 = sym_ref[j0, 0]
            cur1 = sym_ref[j1, 0]
            if r == 0:
                prev = sym_ref[jnp.maximum(2 * i * unroll - 1, 0), 0]
                ctx = jnp.where(i == 0, boundary_ctx, prev)
                ctxw = jnp.broadcast_to(ctx[None], (256, 8, 128))
                oh0 = (ctxw == iota).astype(oh_dt)
            else:
                oh0 = sel_prev.astype(oh_dt)
            c0, l0, sel0 = _lookup_one(oh0, cur0, o * CHUNK_STEPS + j0)
            c1, l1, sel1 = _lookup_one(sel0.astype(oh_dt), cur1,
                                       o * CHUNK_STEPS + j1)
            sel_prev = sel1
            a0, a1, cnt, word, valid = _pack_round(
                a0, a1, cnt, (c0, c1), (l0, l1))
            off = jnp.broadcast_to((wp - (gb << PLOG2))[None],
                                   (PWINDOW, 8, 128))
            hit = jnp.broadcast_to((valid > 0)[None], (PWINDOW, 8, 128))
            win = jnp.where((w32_iota == off) & hit,
                            word.astype(jnp.int32), win)
            wp = wp + valid
            tot = tot + l0 + l1
        return a0, a1, cnt, wp, tot, win, gb

    carry = (a0s[:], a1s[:], cnts[:], wps[:], tots[:], wins[:], gbs[:])
    a0, a1, cnt, wp, tot, win, gb = jax.lax.fori_loop(
        0, (CHUNK_STEPS // 2) // unroll, body, carry)

    @pl.when(o == n_chunks - 1)
    def _fin():
        off = jnp.broadcast_to((wp - (gb << PLOG2))[None],
                               (PWINDOW, 8, 128))
        hit = jnp.broadcast_to((cnt > 0)[None], (PWINDOW, 8, 128))
        fwin = jnp.where((w32_iota == off) & hit,
                         a0.astype(jnp.int32), win)
        _flush_rotate(fwin, gb, wp)
        nbits_ref[0] = tot

    a0s[:] = a0
    a1s[:] = a1
    cnts[:] = cnt
    wps[:] = wp
    tots[:] = tot
    wins[:] = win
    gbs[:] = gb
    ctxs[:] = sym_ref[CHUNK_STEPS - 1, 0]


@partial(jax.jit, static_argnames=("max_len", "interpret", "variant"))
def pack_blocks_fused_sm(ut: jnp.ndarray, n_valid: jnp.ndarray, tables,
                         max_len: int = MAX_CODE_LEN,
                         interpret: bool = False,
                         variant: str = "i8"):
    """Fused lookup+pack: (n, B) step-major u8/i32 units + canonical
    tables -> (words (B, W) u32 zero-padded, bits (B,) u32) — the same
    contract as lookup_cl_sm_* + pack_blocks_dense, with no cl plane."""
    from .lookup_pallas import (build_cl_planes, build_cl_planes_bf16,
                                build_cl_planes_rank,
                                build_cl_planes_rankbf)
    assert PACK_UNROLL <= PGRP
    assert (CHUNK_STEPS // 2) % PACK_UNROLL == 0
    ut = ut.astype(jnp.int32)
    n, B = ut.shape
    W_exact = words_for_block(n, max_len)
    W = -(-W_exact // PGRP) * PGRP
    n_tiles = (B + LANES - 1) // LANES
    Rp = n_tiles * LANES
    n_pad = -(-n // CHUNK_STEPS) * CHUNK_STEPS
    if n_pad != n or Rp != B:
        ut = jnp.pad(ut, ((0, n_pad - n), (0, Rp - B)))
    nv = n_valid.astype(jnp.int32)
    if Rp != B:
        nv = jnp.concatenate([nv, jnp.zeros((Rp - B,), jnp.int32)])
    sym4 = ut.reshape(n_pad, n_tiles, 8, 128)
    nv4 = nv.reshape(n_tiles, 8, 128)
    ft = {"bf16": build_cl_planes_bf16,
          "rank": build_cl_planes_rank,
          "rankbf": build_cl_planes_rankbf}.get(
        variant, build_cl_planes)(tables)
    n_chunks = n_pad // CHUNK_STEPS
    out, nbits = pl.pallas_call(
        partial(_fused_kernel, W=W, n_chunks=n_chunks, variant=variant),
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec(tuple(ft.shape), lambda t, o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_STEPS, 1, 8, 128),
                         lambda t, o: (o, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W, 8, 128), lambda t, o: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda t, o: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, W, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.uint32),           # a0
            pltpu.VMEM((8, 128), jnp.uint32),           # a1
            pltpu.VMEM((8, 128), jnp.int32),            # cnt
            pltpu.VMEM((8, 128), jnp.int32),            # wp
            pltpu.VMEM((8, 128), jnp.int32),            # tot
            pltpu.VMEM((PWINDOW, 8, 128), jnp.int32),   # window
            pltpu.VMEM((8, 128), jnp.int32),            # group base
            pltpu.VMEM((8, 128), jnp.int32),            # boundary ctx
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                max(3 * W * 8 * 128 * 4, 64 << 20), 120 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(Rp) * n_pad * 768 * 256,
            bytes_accessed=int(Rp) * n_pad * 4 + int(Rp) * W * 4,
            transcendentals=0),
        interpret=interpret,
    )(ft, nv4, sym4)
    words = jnp.moveaxis(out, 1, 3).reshape(Rp, W).astype(jnp.uint32)
    nbits_r = nbits.reshape(Rp).astype(jnp.uint32)
    return words[:B, :W_exact], nbits_r[:B]
