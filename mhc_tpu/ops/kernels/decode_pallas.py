"""Pallas TPU block-parallel Huffman decode kernel.

Why this shape: Huffman decode is bit-serial per stream, so all TPU
parallelism must come from decoding many independent unit streams in
vector lanes. The XLA scan decoder pays ~1us of dispatch per op per
symbol step; this kernel runs the whole symbol loop inside one Mosaic
program, so the per-step cost is actual VPU work only.

Hardware constraints that shaped the design (probed on v5e, see
SURVEY.md env notes):
  * `tpu.dynamic_gather` only shuffles within 8 sublanes -> per-lane
    table lookups use a 32-chunk pass: chunk c broadcasts rows 8c..8c+7
    of the fetch table, a sublane gather picks ctx&7, a mask selects
    lanes with ctx>>3 == c.
  * No per-lane gather from deep buffers -> stream word refills use an
    iota-compare + minor-axis reduce over the unit's VMEM-resident
    stream (words laid out (8, 128, W) so the reduce is lane-minor).
  * Per-lane variable shifts ARE vectorized -> the 96-bit bit-buffer
    (b0,b1,b2) consumes codes branchlessly; one masked 32-bit refill
    every 2 symbols keeps every lane >= 15 valid bits (worst case 15
    bits/symbol vs 16 refilled bits/symbol, 96-bit headroom).

Fetch table layout (per context, 79 int32 columns):
  cols 0..14   packed pairs: low u16 = lim[l] for l = 1..14 (col 14: 0),
               high i16 = base[l]-first_code[l] for l = 1..15
  cols 15..78  sorted_syms packed 4 bytes/word (MSB-first)

Order-0 streams use context 0 everywhere; the chunk pass collapses to
loop-invariant broadcasts that Mosaic hoists out of the symbol loop.
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

LANES = 1024          # units decoded per grid tile (8 sublanes x 128 lanes)
OUT_CHUNK = 512       # symbols per output DMA chunk (multiple of 4)

# Grouped refill (round 3): the round-2 kernel re-scanned the whole
# W-deep stream buffer with an iota-compare masked sum on EVERY refill
# (~1.5*W elem-ops per symbol — at W=1664 that was ~half of decode
# time). The v2 refill keeps a per-lane 2*GRP-word lookahead window in
# VMEM scratch, refetched from the stream buffer once per GRP
# iterations (a lane consumes at most one word per iteration, so the
# window always covers the next GRP reads), and serves each refill word
# from the window with a cheap two-level select.
#
# GRP trades window-pick depth (2*GRP-deep masked sum PER REFILL)
# against window_fill frequency (W/GRP slab selects per sync).
# Import-time env knob MHC_DECODE_GRP for on-chip A/B (a smaller group
# shrinks the per-refill pick; measured round 4 — see RESULTS.md).
import os as _os
GRP = int(_os.environ.get("MHC_DECODE_GRP", "32"))
# GRP must divide every padded stream width W (a 128-multiple), so the
# legal range is 8..128; larger values would leave _window_fill's tail
# groups unmapped and decode garbage (round-4 review).
assert GRP & (GRP - 1) == 0 and 8 <= GRP <= 128, GRP
LOG2GRP = GRP.bit_length() - 1
WINDOW = 2 * GRP      # per-lane lookahead (current + next group)

# Symbols decoded per fori_loop iteration. The Mosaic loop costs ~6.5 us
# PER ITERATION in fixed overhead on this toolchain (bench/loop_calib.py)
# while chained vector ops inside the body are ~2 ns each — so the
# symbol loop is unrolled and the win is ~linear in UNROLL until the
# body's wide ops dominate. Must be a multiple of 4 (packed output
# words) and divide out_chunk.
UNROLL = 8

# v5e has 128 MB of VMEM/core but XLA's default *scoped* budget for a
# custom call is 16 MB — round 1's bench died on exactly that check
# (BENCH_r01: "18.50M ... limit 16.00M"). We account for every buffer the
# kernel keeps resident and raise the per-kernel limit to match, capping
# well under the physical size so XLA keeps room for its own buffers.
VMEM_BUDGET = 96 << 20


def vmem_bytes(W: int, out_chunk: int = OUT_CHUNK,
               fetch_impl: str = "chunk", n_tiles: int = 1,
               n_out: int = 4096, lanes: int = 128) -> int:
    """Scoped-VMEM bytes the kernel needs for a padded stream width W
    (128-multiple). Mosaic double-buffers grid-indexed operands/outputs,
    and XLA may additionally place the kernel's FULL output buffer in
    VMEM (observed as an S(1) stack allocation at bench scale — this is
    what the 16 MB default scoped limit tripped on in round 1).
    `lanes` is the minor lane width (128 * lane-tile multiple)."""
    words = 2 * 8 * lanes * W * 4
    out_blocks = 2 * (out_chunk // 4) * 8 * lanes * 4
    out_full = n_tiles * 8 * lanes * max(n_out, out_chunk)
    ft = 2 * 256 * 79 * 4
    slab = 2 * 32 * 8 * 64 * lanes * 4 if fetch_impl == "slab" else 0
    slab += 2 * 79 * 8 * lanes * 4          # order-0 aux stack operand
    window = 8 * lanes * WINDOW * 4 + 8 * lanes * 8 * 4   # group refill
    scratch = 7 * 8 * lanes * 4
    return (words + out_blocks + out_full + ft + slab + window + scratch
            + (2 << 20))


def build_fetch_table(lim, base, first_code, sorted_syms) -> jnp.ndarray:
    """Pack canonical decode tables into the (256, 96) kernel layout."""
    lim = jnp.asarray(lim, jnp.int32)
    base = jnp.asarray(base, jnp.int32)
    first = jnp.asarray(first_code, jnp.int32)
    syms = jnp.asarray(sorted_syms, jnp.int32).reshape(256, 64, 4)
    symw = ((syms[..., 0] << 24) | (syms[..., 1] << 16)
            | (syms[..., 2] << 8) | syms[..., 3])
    ft = jnp.zeros((256, 79), jnp.int32)
    bf = base[:, 1:16] - first[:, 1:16]                  # l = 1..15
    lim_part = jnp.concatenate(
        [lim[:, 1:15], jnp.zeros((256, 1), jnp.int32)], axis=1)
    ft = ft.at[:, 0:15].set((bf << 16) | (lim_part & 0xFFFF))
    ft = ft.at[:, 15:79].set(symw)
    return ft


_PAIR_COLS = list(range(0, 15))     # lim | bf<<16, l = 1..15
_SYM_COLS = list(range(15, 79))


def _fetch_all(ft, ctx, markov: bool, sparse: bool = False):
    """Chunked sublane-gather fetch of the ctx row of the fetch table.

    ft: (256, 96) int32 (value or ref-load); ctx: (8, 128) int32.
    One wide (8, 96*128) gather + one select per 8-context chunk: the
    chunk's (8, 96) sub-table broadcasts across lanes as (8, 96, 128) ->
    (8, 12288) with each value a contiguous 128-lane slab, so the whole
    row fetch is ~6 ops per chunk instead of ~6 per value per chunk.

    sparse: branch around chunks no lane needs this step (one any-reduce
    + lax.cond per chunk). Contexts cluster hard on text-like data
    (ASCII spans ~4 of the 32 chunks), so most of the 32-chunk pass is
    skipped; on uniform data every chunk hits and the reduces are pure
    overhead — the caller picks via fetch_impl.
    """
    sub = ctx & 7
    hi = ctx >> 3
    L = ctx.shape[-1]
    n_chunks = 32 if markov else 1
    NV = 79
    idx_wide = jnp.broadcast_to(sub[:, None, :], (8, NV, L)).reshape(
        8, NV * L)
    # Mosaic crashes on broadcast+reshape of BOOL masks; broadcast the
    # int context and compare in the wide shape instead
    hi_wide = jnp.broadcast_to(hi[:, None, :], (8, NV, L)).reshape(
        8, NV * L)
    acc = jnp.zeros((8, NV * L), jnp.int32)
    for c in range(n_chunks):
        def taken(a, c=c):
            ftc = ft[c * 8:(c + 1) * 8, :]          # (8, 79)
            tab = jnp.broadcast_to(ftc[:, :, None], (8, NV, L)).reshape(
                8, NV * L)
            g = jnp.take_along_axis(tab, idx_wide, axis=0)
            return jnp.where(hi_wide == c, g, a) if markov else g
        if sparse and markov:
            acc = jax.lax.cond(jnp.any(hi == c), taken, lambda a: a, acc)
        else:
            acc = taken(acc)
    np_ = len(_PAIR_COLS)
    # lane-minor (8, NV*L) layout: the value axis lives inside the lane
    # dim, so the resolve stages use the legacy per-value select chain
    # (vax=1); the mxu fetches return (NV, 8, L) stacks whose resolve
    # runs as wide vreg ops (vax=0) — the TPU fast path
    return acc[:, :np_ * L], acc[:, np_ * L:], 1


def _prep_fetch(ft, markov: bool, fetch_impl: str, lanes: int,
                ftsym=None):
    """Precompute every loop-INVARIANT fetch/resolve operand ONCE per
    kernel invocation: Mosaic does not reliably hoist invariant jaxpr
    ops out of fori_loop bodies, so iotas / bit-plane extractions /
    order-0 stacks built inside _decode_one were being re-materialized
    EVERY symbol (round-3 finding: the order-0 floor carried ~2 us/sym
    of invariant rebuild)."""
    L = lanes
    prep = {"ft": ft, "markov": markov, "fetch_impl": fetch_impl,
            "ftsym": ftsym}
    if not markov:
        # ftsym here is the PRE-BROADCAST (79, 8, L) context-0 stack,
        # computed in XLA and passed as a kernel operand: building the
        # broadcast in-kernel at the top level crashes the remote
        # Mosaic compiler (HTTP 500) on this libtpu
        acc = ftsym
        prep["o0"] = (acc[:len(_PAIR_COLS)], acc[len(_PAIR_COLS):])
    elif fetch_impl in ("mxu", "mxu2", "mxu3", "mxu4"):
        prep["iota_c"] = jax.lax.broadcasted_iota(
            jnp.int32, (256, 8, L), 0)
        if fetch_impl in ("mxu3", "mxu4"):
            prep["planes_cat"] = jnp.concatenate(
                [((ft >> (8 * k)) & 255).astype(jnp.bfloat16)
                 for k in range(4)], axis=1)     # (256, 4*79)
        else:
            prep["planes"] = [((ft >> (8 * k)) & 255).astype(jnp.bfloat16)
                              for k in range(4)]
    elif fetch_impl in ("mxu5", "mxu6"):
        prep["iota_c"] = jax.lax.broadcasted_iota(
            jnp.int32, (256, 8, L), 0)
        # int8 planes, biased by -128 so 0..255 fits int8; the one-hot
        # contraction yields v-128 exactly (int32 accumulation)
        prep["planes_i8"] = jnp.concatenate(
            [(((ft >> (8 * k)) & 255) - 128).astype(jnp.int8)
             for k in range(4)], axis=1)         # (256, 4*79)
    # resolve iotas for the wide (vax=0) path
    NP, NS = len(_PAIR_COLS), len(_SYM_COLS)
    prep["liota"] = jax.lax.broadcasted_iota(
        jnp.int32, (NP, 8, L), 0) + 1
    prep["qiota"] = jax.lax.broadcasted_iota(jnp.int32, (NS, 8, L), 0)
    return prep


def _fetch_all_mxu2(prep, ctx):
    """Whole-row fetch as four exact 8-bit bf16 one-hot matmuls.

    Contracts the 256-context axis with the (8, 128) lane layout
    PRESERVED: oh (256, 8, 128) is one vreg-row per context, so
    dot_general(plane (256, 79), oh) is a plain (79,256)@(256,1024) MXU
    pass with no (8,128)->(1024,) relayout per step. Plane values are
    0..255 (exact in bf16) and each one-hot column has a single 1, so
    the f32 accumulation is exact; the four shifted planes reassemble
    the int32 row bit pattern. (A prior 16-bit-half f32 variant decoded
    correctly in the jnp mirror but MISdecoded on the real chip: MXU
    f32 matmuls run as bf16 passes, which are not exact above 2^8 —
    hence 8-bit planes.)"""
    oh = (ctx[None, :, :] == prep["iota_c"]).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    acc = None
    for k, plane in enumerate(prep["planes"]):
        xk = jax.lax.dot_general(plane, oh, dimension_numbers=dn,
                                 preferred_element_type=jnp.float32)
        # f32 -> int32 (Mosaic has no f32->u32 cast); the k=3 shift wraps
        # modularly in int32, which reproduces the original bit pattern
        v = xk.astype(jnp.int32) << (8 * k)
        acc = v if acc is None else acc | v
    np_ = len(_PAIR_COLS)
    return acc[:np_], acc[np_:], 0      # stacked (NV, 8, L), value axis 0


def _fetch_all_mxu3(prep, ctx):
    """mxu2 with the four 8-bit planes STACKED into one (256, 316)
    operand so the whole row fetch is a single MXU dispatch per symbol
    instead of four. Plane math identical to mxu2 (8-bit planes exact
    in bf16; k=3 shift wraps modularly in int32)."""
    oh = (ctx[None, :, :] == prep["iota_c"]).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    x = jax.lax.dot_general(prep["planes_cat"], oh, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
    acc = None
    for k in range(4):
        v = x[k * 79:(k + 1) * 79].astype(jnp.int32) << (8 * k)
        acc = v if acc is None else acc | v
    np_ = len(_PAIR_COLS)
    return acc[:np_], acc[np_:], 0      # stacked (NV, 8, L), value axis 0


def _fetch_all_mxu5(prep, ctx):
    """mxu3 on the v5e int8 MXU path (2x bf16 rate): biased int8 planes
    with int32 accumulation — exact, and the recombine needs no
    f32->int casts."""
    oh = (ctx[None, :, :] == prep["iota_c"]).astype(jnp.int8)
    dn = (((0,), (0,)), ((), ()))
    x = jax.lax.dot_general(prep["planes_i8"], oh, dimension_numbers=dn,
                            preferred_element_type=jnp.int32) + 128
    acc = None
    for k in range(4):
        v = x[k * 79:(k + 1) * 79] << (8 * k)
        acc = v if acc is None else acc | v
    np_ = len(_PAIR_COLS)
    return acc[:np_], acc[np_:], 0


def _fetch_resolve_mxu4(prep, ctx, win):
    """Stacked bf16 one-hot fetch + DIRECT f32 resolve (round 3).

    mxu2/mxu3 reconstruct all 79 int32 row values from the four 8-bit
    planes (~870 vreg-cycles/symbol of casts+shifts+ors) before the
    resolve uses ~4 of them. Here the resolve reads the f32 plane rows
    directly: lim/bf are 16-bit values rebuilt as p0 + 256*p1 (exact in
    f32 < 2^24), and the symbol BYTE is one plane row — plane k holds
    byte position 3-k of each packed symw word, so no 32-bit word is
    ever reassembled. Bit-exact vs the int path (single-match masked
    sums; byte planes 0..255)."""
    oh = (ctx[None, :, :] == prep["iota_c"]).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    x = jax.lax.dot_general(prep["planes_cat"], oh, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
    NV = 79
    lim_f = x[0:14] + x[NV:NV + 14] * 256.0        # (14, 8, L), u16 exact
    win_f = win.astype(jnp.float32)
    length = 1 + jnp.sum(
        (jnp.broadcast_to(win_f[None], lim_f.shape) >= lim_f)
        .astype(jnp.int32), axis=0)
    bf_rows = x[2 * NV:2 * NV + 15] + x[3 * NV:3 * NV + 15] * 256.0
    lw = jnp.broadcast_to(length[None], bf_rows.shape)
    bf = jnp.sum(jnp.where(prep["liota"] == lw, bf_rows, 0.0),
                 axis=0).astype(jnp.int32)
    bf = jnp.where(bf >= 32768, bf - 65536, bf)    # sign-extend u16
    code = win >> jnp.clip(MAX_CODE_LEN - length, 0, 31).astype(jnp.int32)
    idx = jnp.clip(bf + code, 0, 255)
    q = idx >> 2
    qw = jnp.broadcast_to(q[None], prep["qiota"].shape)
    qmask = prep["qiota"] == qw
    # select the byte PLANE first (3 wheres on the (64, 8, L) slabs),
    # then ONE 64-deep masked sum — round 4 summed all four planes and
    # byte-selected after (4 sum trees; ~25% more resolve vreg-ops)
    b_pos = idx & 3                                # byte pos -> plane 3-b
    bw = jnp.broadcast_to(b_pos[None], qmask.shape)
    plane = x[3 * NV + 15:4 * NV]                  # b_pos == 0
    plane = jnp.where(bw == 1, x[2 * NV + 15:3 * NV], plane)
    plane = jnp.where(bw == 2, x[1 * NV + 15:2 * NV], plane)
    plane = jnp.where(bw == 3, x[0 * NV + 15:1 * NV], plane)
    s = jnp.sum(jnp.where(qmask, plane, 0.0), axis=0)
    return length, s.astype(jnp.int32)


def _fetch_resolve_mxu6(prep, ctx, win):
    """mxu4's direct plane resolve on the v5e int8 MXU path (round 3):
    int8-domain one-hot compare (packed vregs), int8 stacked-plane
    matmul with exact int32 accumulation (one-hot columns have a single
    1, so each output IS the biased plane byte), and an all-integer
    resolve — no f32 math and no full 79-column recombine. Bit-exact vs
    mxu2/mxu4 (single-match masked sums; byte planes 0..255)."""
    # int32 compare + int8 cast (the proven mxu5 one-hot form — this
    # Mosaic target supports neither int8 iota nor sub-32-bit compares)
    oh = (ctx[None, :, :] == prep["iota_c"]).astype(jnp.int8)
    dn = (((0,), (0,)), ((), ()))
    x = jax.lax.dot_general(prep["planes_i8"], oh, dimension_numbers=dn,
                            preferred_element_type=jnp.int32) + 128
    NV = 79
    lim = x[0:14] | (x[NV:NV + 14] << 8)           # (14, 8, L), u16
    winw = jnp.broadcast_to(win[None], lim.shape)
    length = 1 + jnp.sum((winw >= lim).astype(jnp.int32), axis=0)
    bf_rows = x[2 * NV:2 * NV + 15] | (x[3 * NV:3 * NV + 15] << 8)
    lw = jnp.broadcast_to(length[None], bf_rows.shape)
    bf = jnp.sum(jnp.where(prep["liota"] == lw, bf_rows, 0), axis=0)
    bf = jnp.where(bf >= 32768, bf - 65536, bf)    # sign-extend u16
    code = win >> jnp.clip(MAX_CODE_LEN - length, 0, 31).astype(jnp.int32)
    idx = jnp.clip(bf + code, 0, 255)
    q = idx >> 2
    qw = jnp.broadcast_to(q[None], prep["qiota"].shape)
    qmask = prep["qiota"] == qw
    # plane-select first, one masked sum after (see mxu4)
    b_pos = idx & 3                                # byte pos -> plane 3-b
    bw = jnp.broadcast_to(b_pos[None], qmask.shape)
    plane = x[3 * NV + 15:4 * NV]                  # b_pos == 0
    plane = jnp.where(bw == 1, x[2 * NV + 15:3 * NV], plane)
    plane = jnp.where(bw == 2, x[1 * NV + 15:2 * NV], plane)
    plane = jnp.where(bw == 3, x[0 * NV + 15:1 * NV], plane)
    s = jnp.sum(jnp.where(qmask, plane, 0), axis=0)
    return length, s


def _fetch_all_slab(ft, ftsym_wide, ctx, markov: bool):
    """Slab variant: symw columns come pre-broadcast as (32, 8, 64*128)
    so the symbol loop does only gather+select per chunk (the in-kernel
    broadcast construction of the 64 symw slabs dominates _fetch_all).
    Pairs (15 cols) still use the in-kernel broadcast — cheap."""
    sub = ctx & 7
    hi = ctx >> 3
    L = ctx.shape[-1]
    n_chunks = 32 if markov else 1
    NP = len(_PAIR_COLS)
    idx_p = jnp.broadcast_to(sub[:, None, :], (8, NP, L)).reshape(
        8, NP * L)
    hi_p = jnp.broadcast_to(hi[:, None, :], (8, NP, L)).reshape(
        8, NP * L)
    NS = 64
    idx_s = jnp.broadcast_to(sub[:, None, :], (8, NS, L)).reshape(
        8, NS * L)
    hi_s = jnp.broadcast_to(hi[:, None, :], (8, NS, L)).reshape(
        8, NS * L)
    accp = jnp.zeros((8, NP * L), jnp.int32)
    accs = jnp.zeros((8, NS * L), jnp.int32)
    for c in range(n_chunks):
        ftc = ft[c * 8:(c + 1) * 8, :NP]
        tabp = jnp.broadcast_to(ftc[:, :, None], (8, NP, L)).reshape(
            8, NP * L)
        gp = jnp.take_along_axis(tabp, idx_p, axis=0)
        gs = jnp.take_along_axis(ftsym_wide[c], idx_s, axis=0)
        if markov:
            accp = jnp.where(hi_p == c, gp, accp)
            accs = jnp.where(hi_s == c, gs, accs)
        else:
            accp, accs = gp, gs
    return accp, accs, 1


def build_sym_slabs(ft: jnp.ndarray, lanes: int = 128) -> jnp.ndarray:
    """(256, 79) fetch table -> (32, 8, 64*lanes) pre-broadcast symw slabs."""
    symw = ft[:, 15:79].reshape(32, 8, 64)
    return jnp.broadcast_to(symw[:, :, :, None],
                            (32, 8, 64, lanes)).reshape(32, 8, 64 * lanes)


def _resolve_wide(prep, pairs, symws, win, ctx):
    """Resolve (length, sym-word, idx) from (NV, 8, L) value stacks with
    WIDE vreg ops: one broadcast-compare + tree-reduce per stage instead
    of a chain of NV tiny (8, L) ops (each tiny op costs ~30-60 cycles
    of loop-body overhead on Mosaic — measured round 3; the wide form
    runs at ~1 cycle/vreg). Masked sums are bit-exact: exactly one
    value matches per lane (length in [1,15]; q = idx>>2 in [0,64))."""
    lim = pairs[:14] & 0xFFFF                       # (14, 8, L)
    winw = jnp.broadcast_to(win[None], lim.shape)
    length = 1 + jnp.sum((winw >= lim).astype(jnp.int32), axis=0)
    lw = jnp.broadcast_to(length[None], pairs.shape)
    packed_bf = jnp.sum(jnp.where(prep["liota"] == lw, pairs, 0), axis=0)
    bf = packed_bf >> 16                            # arithmetic: sign ok
    code = win >> jnp.clip(MAX_CODE_LEN - length, 0, 31).astype(jnp.int32)
    idx = jnp.clip(bf + code, 0, 255)
    q = idx >> 2
    qw = jnp.broadcast_to(q[None], symws.shape)
    symw = jnp.sum(jnp.where(prep["qiota"] == qw, symws, 0), axis=0)
    return length, idx, symw


def _resolve_lanes(pairs_w, symws_w, win, ctx):
    """Legacy resolve for the lane-minor (8, NV*L) fetch layout
    (chunk/sparse/slab variants): per-value select chain."""
    L = ctx.shape[-1]
    NP = pairs_w.shape[-1] // L
    pairs = [pairs_w[:, v * L:(v + 1) * L] for v in range(NP)]
    symws = [symws_w[:, v * L:(v + 1) * L]
             for v in range(symws_w.shape[-1] // L)]
    length = jnp.ones(ctx.shape, jnp.int32)
    for lv in pairs[:14]:                       # lim[l], l = 1..14
        length += (win >= (lv & 0xFFFF)).astype(jnp.int32)
    code = win >> jnp.clip(MAX_CODE_LEN - length, 0, 31).astype(jnp.int32)
    packed_bf = jnp.zeros(ctx.shape, jnp.int32)
    for l, bv in enumerate(pairs, start=1):     # bf in high 16 bits
        packed_bf = jnp.where(length == l, bv, packed_bf)
    bf = packed_bf >> 16                        # arithmetic: sign ok
    idx = jnp.clip(bf + code, 0, 255)
    q = idx >> 2
    symw = jnp.zeros(ctx.shape, jnp.int32)
    for qq, sv in enumerate(symws):
        symw = jnp.where(q == qq, sv, symw)
    return length, idx, symw


def _decode_one(prep, b0, b1, b2, cnt, ctx):
    markov = prep["markov"]
    fetch_impl = prep["fetch_impl"]
    if fetch_impl == "null":
        # DIAGNOSTIC ONLY (bench/decode_matrix.py): fixed 8-bit symbols,
        # no fetch/resolve — isolates the loop+refill+store floor
        sym = ((b0 >> jnp.uint32(24)) & 255).astype(jnp.int32)
        b0 = (b0 << jnp.uint32(8)) | (b1 >> jnp.uint32(24))
        b1 = (b1 << jnp.uint32(8)) | (b2 >> jnp.uint32(24))
        b2 = b2 << jnp.uint32(8)
        return b0, b1, b2, cnt - 8, sym
    if markov and fetch_impl in ("mxu4", "mxu6"):
        win = (b0 >> jnp.uint32(32 - MAX_CODE_LEN)).astype(jnp.int32)
        if fetch_impl == "mxu6":
            length, sym = _fetch_resolve_mxu6(prep, ctx, win)
        else:
            length, sym = _fetch_resolve_mxu4(prep, ctx, win)
        ls = length.astype(jnp.uint32)
        rs = (32 - length).astype(jnp.uint32)      # length in [1,15]
        b0 = (b0 << ls) | (b1 >> rs)
        b1 = (b1 << ls) | (b2 >> rs)
        b2 = b2 << ls
        return b0, b1, b2, cnt - length, sym
    if not markov:
        pairs, symws = prep["o0"]
        vax = 0
    elif fetch_impl == "slab":
        pairs, symws, vax = _fetch_all_slab(prep["ft"], prep["ftsym"],
                                            ctx, markov)
    elif fetch_impl == "mxu3":
        pairs, symws, vax = _fetch_all_mxu3(prep, ctx)
    elif fetch_impl == "mxu5":
        pairs, symws, vax = _fetch_all_mxu5(prep, ctx)
    elif fetch_impl in ("mxu", "mxu2"):
        pairs, symws, vax = _fetch_all_mxu2(prep, ctx)
    else:
        pairs, symws, vax = _fetch_all(prep["ft"], ctx, markov,
                                       sparse=fetch_impl == "sparse")
    win = (b0 >> jnp.uint32(32 - MAX_CODE_LEN)).astype(jnp.int32)
    if vax == 0:
        length, idx, symw = _resolve_wide(prep, pairs, symws, win, ctx)
    else:
        length, idx, symw = _resolve_lanes(pairs, symws, win, ctx)
    shift = (8 * (3 - (idx & 3))).astype(jnp.uint32)
    sym = (symw.astype(jnp.uint32) >> shift).astype(jnp.int32) & 255
    # consume `length` bits
    ls = length.astype(jnp.uint32)
    rs = (32 - length).astype(jnp.uint32)          # length in [1,15]
    b0 = (b0 << ls) | (b1 >> rs)
    b1 = (b1 << ls) | (b2 >> rs)
    b2 = b2 << ls
    cnt = cnt - length
    return b0, b1, b2, cnt, sym


def _insert32(word, b0, b1, b2, cnt, wp):
    """Insert `word` (32 bits) at bit offset cnt of the 96-bit buffer
    when cnt <= 64; advance wp by one word when taken."""
    need = cnt <= 64
    bs = [b0, b1, b2]
    for i in range(3):
        rel = cnt - 32 * i
        right = word >> jnp.clip(rel, 0, 31).astype(jnp.uint32)
        left = word << jnp.clip(-rel, 0, 31).astype(jnp.uint32)
        piece = jnp.where(rel >= 0,
                          jnp.where(rel <= 31, right, 0),
                          jnp.where(rel >= -31, left, 0))
        bs[i] = bs[i] | jnp.where(need, piece, jnp.uint32(0))
    cnt = jnp.where(need, cnt + 32, cnt)
    wp = jnp.where(need, wp + 1, wp)
    return bs[0], bs[1], bs[2], cnt, wp


def _refill(allw, w_iota, b0, b1, b2, cnt, wp):
    """Legacy O(W) refill: masked sum over the (W, 8, L) stream stack.
    The word-MAJOR layout makes this a chain of vreg selects + a tree
    reduce over axis 0 — no cross-lane reduction."""
    sel = w_iota == jnp.broadcast_to(wp[None], w_iota.shape)
    # Mosaic can't reduce unsigned ints; i32 view is bit-exact (one
    # nonzero addend per lane, two's complement)
    allw_i = allw.astype(jnp.int32)
    word = jnp.sum(jnp.where(sel, allw_i, jnp.int32(0)),
                   axis=0).astype(jnp.uint32)
    return _insert32(word, b0, b1, b2, cnt, wp)


def _window_fill(allw_i, wp, lanes: int, W: int):
    """Compute the (WINDOW, 8, lanes) lookahead window for per-lane word
    pointer wp: slots 0..GRP-1 hold the GRP-aligned group containing wp,
    slots GRP..2*GRP-1 the next group. Groups past the end of the stream
    buffer stay ZERO (g0+1 is deliberately NOT clamped), which makes the
    window-served word bit-identical to the scan refill's masked sum for
    every wp — including lanes already past their stream end."""
    g0 = wp >> LOG2GRP
    g0w = jnp.broadcast_to(g0[None], (GRP, 8, lanes))
    acc0 = jnp.zeros((GRP, 8, lanes), jnp.int32)
    acc1 = jnp.zeros((GRP, 8, lanes), jnp.int32)
    for g in range(W // GRP):
        slab = allw_i[g * GRP:(g + 1) * GRP]
        acc0 = jnp.where(g0w == g, slab, acc0)
        acc1 = jnp.where(g0w == (g - 1), slab, acc1)   # g == g0 + 1
    return jnp.concatenate([acc0, acc1], axis=0), g0


def _refill_window(win, gb, w64_iota, b0, b1, b2, cnt, wp):
    """Serve the refill word from the VMEM lookahead window: one
    WINDOW-deep vreg-major masked sum instead of the W-deep stream scan
    (a lane consumes at most one word per refill, so a window synced
    every GRP consumed words always covers the next read)."""
    o = wp - (gb << LOG2GRP)
    ow = jnp.broadcast_to(o[None], w64_iota.shape)
    word = jnp.sum(jnp.where(w64_iota == ow, win, jnp.int32(0)),
                   axis=0).astype(jnp.uint32)
    return _insert32(word, b0, b1, b2, cnt, wp)


def _decode_kernel(ft_ref, words_ref, out_ref,
                   b0s, b1s, b2s, cnts, wps, ctxs,
                   wins=None, gbs=None,
                   *, W: int, out_chunk: int, markov: bool,
                   fetch_impl: str, refill: str = "group",
                   unroll: int = UNROLL, ftsym_ref=None,
                   chains: int = 1):
    # slab variant passes the pre-broadcast symw slabs as a second
    # table operand (bound via functools.partial on the ref position)
    o = pl.program_id(1)

    lanes = cnts.shape[-1]
    # Software pipelining (round 4): the per-lane symbol chain makes
    # every vector step data-dependent on the previous one, so the MXU
    # fetch and the VPU resolve SERIALIZE. Splitting the lane axis into
    # `chains` independent slices and interleaving their steps gives the
    # scheduler independent work to overlap (chain B's one-hot/resolve
    # runs under chain A's matmul). Math per lane is unchanged —
    # bit-exact vs chains=1 (tested).
    Q = chains
    if Q > 1 and (lanes % (128 * Q) != 0
                  or refill not in ("group", "scan")
                  or (markov and fetch_impl not in ("mxu4", "mxu6"))):
        Q = 1
    Lc = lanes // Q

    @pl.when(o == 0)
    def _init():
        b0s[:] = words_ref[0, 0]
        b1s[:] = words_ref[0, 1]
        b2s[:] = words_ref[0, 2]
        cnts[:] = jnp.full((8, lanes), 96, jnp.int32)
        wps[:] = jnp.full((8, lanes), 3, jnp.int32)
        ctxs[:] = jnp.zeros((8, lanes), jnp.int32)

    allw = words_ref[0]                      # (W, 8, lanes) uint32
    ft = ft_ref[:]
    ftsym = ftsym_ref[:] if ftsym_ref is not None else None
    if ftsym is not None and Q > 1:
        ftsyms = [ftsym[..., q * Lc:(q + 1) * Lc] for q in range(Q)]
    else:
        ftsyms = [ftsym] * Q
    prep = _prep_fetch(ft, markov, fetch_impl, Lc, ftsyms[0])
    preps = [prep if q == 0 or ftsyms[q] is ftsyms[0]
             else dict(prep, ftsym=ftsyms[q]) for q in range(Q)]
    if Q > 1 and not markov:
        for q in range(1, Q):
            acc = ftsyms[q]
            preps[q] = dict(prep, ftsym=acc,
                            o0=(acc[:len(_PAIR_COLS)],
                                acc[len(_PAIR_COLS):]))
    if refill == "group":
        allw_i = allw.astype(jnp.int32)
        w64_iota = jax.lax.broadcasted_iota(
            jnp.int32, (WINDOW, 8, Lc), 0)
    else:
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 8, Lc), 0)

    # UNROLL symbols per fori_loop iteration: the Mosaic loop carries a
    # ~6.5 us FIXED cost per iteration on this toolchain (bench/
    # loop_calib.py: a 4-op body and a 512-op body cost 6.55 vs 7.57 us)
    # — per-symbol math is nearly free next to it, so the win is almost
    # exactly /unroll. The window must be re-synced before more than GRP
    # words can be consumed: unroll/2 refills per iteration -> sync
    # every GRP/(unroll/2) iterations.
    U = unroll
    sync_every = max(GRP // (U // 2), 1)

    def _sl(q):
        return slice(q * Lc, (q + 1) * Lc)

    def iter_body(i, carry):
        states = [list(s) for s in carry]    # Q x [b0,b1,b2,cnt,wp,ctx]
        if refill == "group":
            @pl.when(i % sync_every == 0)
            def _sync():
                for q in range(Q):
                    win, g0 = _window_fill(
                        allw_i[:, :, _sl(q)], states[q][4], Lc, W)
                    wins[:, :, _sl(q)] = win
                    gbs[:, _sl(q)] = g0
        syms = [[] for _ in range(Q)]
        for _ in range(U // 2):
            for q in range(Q):
                b0, b1, b2, cnt, wp, ctx = states[q]
                if refill == "group":
                    b0, b1, b2, cnt, wp = _refill_window(
                        wins[:, :, _sl(q)], gbs[:, _sl(q)], w64_iota,
                        b0, b1, b2, cnt, wp)
                elif refill == "none":
                    pass    # DIAGNOSTIC: no refill (garbage output)
                else:
                    b0, b1, b2, cnt, wp = _refill(
                        allw[:, :, _sl(q)], w_iota, b0, b1, b2, cnt, wp)
                states[q][:5] = b0, b1, b2, cnt, wp
            for _ in range(2):
                # interleave the chains' serial steps: q's fetch matmul
                # is independent of q-1's resolve -> units overlap
                for q in range(Q):
                    b0, b1, b2, cnt, wp, ctx = states[q]
                    b0, b1, b2, cnt, sym = _decode_one(
                        preps[q], b0, b1, b2, cnt, ctx)
                    if markov:
                        ctx = sym
                    syms[q].append(sym)
                    states[q] = [b0, b1, b2, cnt, wp, ctx]
        # U % 4 == 0: every iteration stores exactly U/4 packed words —
        # no conditional store, no pack carry
        for j in range(U // 4):
            pks = []
            for q in range(Q):
                pk = jnp.zeros((8, Lc), jnp.uint32)
                for b in range(4):
                    pk = pk | (syms[q][4 * j + b].astype(jnp.uint32)
                               << jnp.uint32(8 * (3 - b)))
                pks.append(pk)
            out_ref[0, i * (U // 4) + j] = (
                pks[0] if Q == 1 else jnp.concatenate(pks, axis=1))
        return tuple(tuple(s) for s in states)

    b0f = b0s[:].astype(jnp.uint32)
    b1f = b1s[:].astype(jnp.uint32)
    b2f = b2s[:].astype(jnp.uint32)
    carry = tuple(
        (b0f[:, _sl(q)], b1f[:, _sl(q)], b2f[:, _sl(q)],
         cnts[:, _sl(q)], wps[:, _sl(q)], ctxs[:, _sl(q)])
        for q in range(Q))
    carry = jax.lax.fori_loop(0, out_chunk // U, iter_body, carry)

    def _cat(k):
        parts = [carry[q][k] for q in range(Q)]
        return parts[0] if Q == 1 else jnp.concatenate(parts, axis=1)

    b0s[:] = _cat(0)
    b1s[:] = _cat(1)
    b2s[:] = _cat(2)
    cnts[:] = _cat(3)
    wps[:] = _cat(4)
    ctxs[:] = _cat(5)


@partial(jax.jit, static_argnames=("n_out", "markov", "interpret",
                                   "out_chunk", "fetch_impl",
                                   "lane_tiles", "refill", "raw_out",
                                   "unroll", "chains"))
def decode_blocks_pallas(words: jnp.ndarray, lim, base, first_code,
                         sorted_syms, n_out: int, markov: bool = True,
                         interpret: bool = False,
                         out_chunk: int | None = None,
                         fetch_impl: str = "chunk",
                         lane_tiles: int | None = None,
                         refill: str = "group",
                         raw_out: bool = False,
                         unroll: int | None = None,
                         chains: int = 1) -> jnp.ndarray:
    """Decode R unit streams of n_out symbols each.

    words: (R, W) uint32 bit-packed streams (padded; W from
    words_for_block(n_out)). Returns (R, n_out) uint8 (positions past a
    unit's true length contain garbage — caller trims by orig length).
    """
    R, W_in = words.shape
    ochunk = out_chunk or OUT_CHUNK
    from ... import config as _cfg0
    U = unroll or _cfg0.unroll()
    # a lane may consume U/2 window words per iteration and the window
    # re-syncs at most once per iteration — cap U so it can't overrun
    # the 2*GRP lookahead (round-4 review: GRP=8 + MHC_UNROLL=32 would
    # silently read past the window)
    U = min(U, ochunk, 2 * GRP)
    if ochunk % U or U % 4:
        U = 4                    # ochunk % 4 == 0 always divides
    assert ochunk % 4 == 0 and U % 4 == 0 and ochunk % U == 0
    assert n_out % ochunk == 0 or n_out <= ochunk, (n_out, ochunk)
    n_sub = max(n_out, ochunk)
    W = (max(W_in, 3) + 127) // 128 * 128   # lane-aligned stream buffer

    # Lane tiling: pack up to 4 classic 1024-unit tiles into the lane
    # minor so each serial symbol step decodes 2048-4096 streams — the
    # fetch matmuls get wider (better MXU util) and the per-step Mosaic
    # loop overhead amortizes. Pick the widest multiple that the unit
    # count needs and the VMEM budget allows.
    # lane_tiles is a CAP, not a forced value: the idle-lane and VMEM
    # checks below may still pick a smaller multiple. Callers should
    # resolve the env knob via mhc_tpu.config and pass it explicitly —
    # the fallback here freezes at first trace per static-arg combo.
    from ... import config as _cfg
    lt_cap = lane_tiles or _cfg.lane_tiles_cap()
    lt = 1
    for cand in (8, 4, 2, 1):
        if cand > lt_cap:
            continue
        n_super_c = -(-R // (LANES * cand))
        if cand > 1 and R <= LANES * (cand // 2) * n_super_c:
            continue  # would only add idle padded lanes
        if vmem_bytes(W, ochunk, fetch_impl, n_super_c, n_out,
                      lanes=128 * cand) <= VMEM_BUDGET:
            lt = cand
            break
    L = 128 * lt
    tile_units = LANES * lt
    n_tiles = (R + tile_units - 1) // tile_units
    Rp = n_tiles * tile_units
    est = vmem_bytes(W, ochunk, fetch_impl, n_tiles, n_out, lanes=L)
    if est > VMEM_BUDGET:
        raise ValueError(
            f"decode_blocks_pallas: stream width W={W} x {n_tiles} "
            f"tiles needs {est >> 20} MB scoped VMEM (> "
            f"{VMEM_BUDGET >> 20} MB budget); use the scan decoder, a "
            "smaller chunk, or a smaller decode unit")
    # floor 64 MB: Mosaic's own matmul/relayout scratch (the mxu fetch
    # variant) is not in the estimate — observed 48.3 MB at W=1280
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=min(max(est + (est >> 1), 64 << 20), 120 << 20))
    # The kernel silently degrades chains -> 1 when its preconditions
    # fail; surface that here where the full config is known, so an A/B
    # sweep can't record a chains=2 label for a chains=1 run (ADVICE r4)
    if chains > 1 and ((128 * lt) % (128 * chains) != 0
                       or refill not in ("group", "scan")
                       or (markov and fetch_impl not in ("mxu4", "mxu6"))):
        import warnings
        warnings.warn(
            f"mhc: MHC_DECODE_CHAINS={chains} ignored (lanes={128 * lt}, "
            f"refill={refill}, fetch_impl={fetch_impl} do not support "
            "chained lane slices); running chains=1",
            RuntimeWarning, stacklevel=2)
    ft = build_fetch_table(lim, base, first_code, sorted_syms)

    if Rp != R or W != W_in:
        wpad = jnp.zeros((Rp, W), jnp.uint32)
        words = wpad.at[:R, :W_in].set(words)
    # word-MAJOR stream layout (t, W, 8, L): refill/window ops become
    # vreg selects + tree reduces over axis 0 instead of cross-lane
    # minor-axis reductions (~1.1 us each, bench/loop_calib.py "wide")
    words4 = jnp.transpose(words.reshape(n_tiles, 8, L, W), (0, 3, 1, 2))

    grid = (n_tiles, n_sub // ochunk)
    scratch = [
        pltpu.VMEM((8, L), jnp.uint32),  # b0
        pltpu.VMEM((8, L), jnp.uint32),  # b1
        pltpu.VMEM((8, L), jnp.uint32),  # b2
        pltpu.VMEM((8, L), jnp.int32),   # cnt
        pltpu.VMEM((8, L), jnp.int32),   # wptr
        pltpu.VMEM((8, L), jnp.int32),   # ctx
    ]
    if refill == "group":
        scratch += [
            pltpu.VMEM((WINDOW, 8, L), jnp.int32),  # lookahead window
            pltpu.VMEM((8, L), jnp.int32),          # window group base
        ]
    cost = pl.CostEstimate(
        flops=int(Rp) * n_sub * 400,
        bytes_accessed=int(words4.size) * 4 + int(Rp) * n_sub,
        transcendentals=0)
    out_spec = pl.BlockSpec((1, ochunk // 4, 8, L),
                            lambda t, o: (t, o, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(
        (n_tiles, n_sub // 4, 8, L), jnp.uint32)
    ft_spec = pl.BlockSpec((256, 79), lambda t, o: (0, 0),
                           memory_space=pltpu.VMEM)
    words_spec = pl.BlockSpec((1, W, 8, L), lambda t, o: (t, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    if fetch_impl == "slab" or not markov:
        if fetch_impl == "slab" and markov:
            aux = build_sym_slabs(ft, lanes=L)
            aux_spec = pl.BlockSpec((32, 8, 64 * L),
                                    lambda t, o: (0, 0, 0),
                                    memory_space=pltpu.VMEM)
        else:
            # order-0: pre-broadcast context-0 row stack as an operand
            # (in-kernel top-level broadcasts crash this Mosaic)
            aux = jnp.broadcast_to(ft[0][:, None, None], (79, 8, L))
            aux_spec = pl.BlockSpec((79, 8, L), lambda t, o: (0, 0, 0),
                                    memory_space=pltpu.VMEM)

        def kernel_aux(ft_ref, aux_ref, words_ref, out_ref, *scr):
            return _decode_kernel(ft_ref, words_ref, out_ref, *scr,
                                  W=W, out_chunk=ochunk, markov=markov,
                                  fetch_impl=fetch_impl, refill=refill,
                                  unroll=U, ftsym_ref=aux_ref,
                                  chains=chains)

        out = pl.pallas_call(
            kernel_aux,
            grid=grid,
            in_specs=[ft_spec, aux_spec, words_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=compiler_params,
            interpret=interpret,
        )(ft, aux, words4)
    else:
        out = pl.pallas_call(
            partial(_decode_kernel, W=W, out_chunk=ochunk, markov=markov,
                    fetch_impl=fetch_impl, refill=refill, unroll=U,
                    chains=chains),
            grid=grid,
            in_specs=[ft_spec, words_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            cost_estimate=cost,
            compiler_params=compiler_params,
            interpret=interpret,
        )(ft, words4)

    if raw_out:
        return out   # (tiles, n_sub/4, 8, L) u32 — timing/diagnostics
    # unpack (tiles, n_sub/4, 8, L) u32 -> (R, n_out) u8
    b0 = (out >> 24) & 255
    b1 = (out >> 16) & 255
    b2 = (out >> 8) & 255
    b3 = out & 255
    syms = jnp.stack([b0, b1, b2, b3], axis=2)       # (t, n4, 4, 8, L)
    syms = syms.reshape(n_tiles, n_sub, 8, L)
    syms = jnp.moveaxis(syms, 1, -1)                 # (t, 8, L, n_sub)
    syms = syms.reshape(Rp, n_sub)[:R, :n_out]
    return syms.astype(jnp.uint8)


def decode_tile_reference(words_tile: jnp.ndarray, ft: jnp.ndarray,
                          n_out: int, markov: bool,
                          fetch_impl: str = "chunk") -> jnp.ndarray:
    if fetch_impl == "slab" and markov:
        ftsym = build_sym_slabs(ft)
    elif not markov:
        ftsym = jnp.broadcast_to(
            jnp.asarray(ft)[0][:, None, None], (79, 8, 128))
    else:
        ftsym = None
    """Pure-jnp mirror of the kernel's symbol loop for ONE (8,128,W) tile.

    Runs compiled on any backend — the correctness oracle for the Pallas
    kernel math (same _refill/_decode_one functions, no Mosaic). Returns
    (8, 128, n_out) int32 symbols."""
    allw = jnp.moveaxis(jnp.asarray(words_tile, jnp.uint32), 2, 0)
    W = allw.shape[0]                       # (W, 8, 128) word-major
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (W, 8, 128), 0)
    prep = _prep_fetch(jnp.asarray(ft), markov, fetch_impl, 128, ftsym)

    def iter_body(carry, i):
        b0, b1, b2, cnt, wp, ctx = carry
        b0, b1, b2, cnt, wp = _refill(allw, w_iota, b0, b1, b2, cnt, wp)
        syms = []
        for _ in range(2):
            b0, b1, b2, cnt, sym = _decode_one(prep, b0, b1, b2,
                                               cnt, ctx)
            if markov:
                ctx = sym
            syms.append(sym)
        return (b0, b1, b2, cnt, wp, ctx), jnp.stack(syms)

    carry = (allw[0], allw[1], allw[2],
             jnp.full((8, 128), 96, jnp.int32),
             jnp.full((8, 128), 3, jnp.int32),
             jnp.zeros((8, 128), jnp.int32))
    _, out = jax.lax.scan(iter_body, carry, jnp.arange((n_out + 1) // 2))
    out = out.reshape(-1, 8, 128)[:n_out]           # (n_out, 8, 128)
    return jnp.moveaxis(out, 0, -1)
