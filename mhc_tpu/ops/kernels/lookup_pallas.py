"""Pallas TPU bulk (prev, cur) -> (len<<16 | code) lookup kernel.

Capability parity: reference emit pass draws `table[prev].code[cur]`
per symbol (SURVEY.md §3.1 HOT LOOP 2; mount empty, §0). The XLA flat
gather over the 64K-entry packed table prices at ~6.6 ns/symbol on v5e
(~0.22 s of the 32 MB encode — the largest single encode stage after
round 3 removed the scatter). This kernel keeps the table VMEM-resident
and fetches whole context rows on the int8 MXU instead:

  * the (256, 256) u32 cl table is split into THREE byte planes
    (code_lo, code_hi, len) and stacked as one (256, 768) int8 operand
    (bias -128; one-hot products are exact in int8),
  * per (8, 128) vreg-group of symbols, one int8-domain one-hot over
    `prev` (packed int8 vregs — the 256-deep build is the floor, same
    finding as the v4 histogram kernel) and ONE MXU contraction fetch
    all three plane rows,
  * `cur` is resolved with three 256-deep masked sums sharing a single
    compare mask.

Unlike decode, there is no serial dependency across lanes — the prev
chain is just the shifted symbol stream — so the kernel streams
step-major symbol blocks exactly like the pack kernel and carries only
a per-lane ctx register across grid chunks (context resets per unit are
free: each lane IS one unit).

Output is bit-identical to api.lookup_cl_t (tested): step-major
(n, R) packed (len<<16 | code), zero at masked positions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 1024
CHUNK_STEPS = 256
# steps are data-independent (ctx loaded from sym_ref) — unrolling only
# amortizes the ~6.5 us/iter fori tax, so deeper is better until VMEM
UNROLL = 8


def build_cl_planes(tables) -> jnp.ndarray:
    """(256, 256) codes/lengths -> (256, 768) biased int8 plane stack."""
    codes = jnp.asarray(tables["codes"], jnp.int32)
    lens = jnp.asarray(tables["lengths"], jnp.int32)
    cl = (lens << 16) | codes
    return jnp.concatenate(
        [((cl >> (8 * k)) & 255) - 128 for k in range(3)],
        axis=1).astype(jnp.int8)


def build_cl_planes_bf16(tables) -> jnp.ndarray:
    """(256, 256) codes/lengths -> (256, 768) bf16 plane stack (byte
    values 0..255 — exact in bf16; one-hot columns have a single 1 so
    the f32 accumulation is exact)."""
    codes = jnp.asarray(tables["codes"], jnp.int32)
    lens = jnp.asarray(tables["lengths"], jnp.int32)
    cl = (lens << 16) | codes
    return jnp.concatenate(
        [(cl >> (8 * k)) & 255 for k in range(3)],
        axis=1).astype(jnp.bfloat16)


def build_cl_planes_w3(tables) -> jnp.ndarray:
    """(256, 256) codes/lengths -> (768, 256) bf16 WEIGHTED plane stack
    for the w3 variant: rows [0:256) hold byte plane 0 indexed by ctx,
    [256:512) plane 1, [512:768) plane 2. The moving operand stacks
    [oh, 256*oh, 65536*oh] on the contraction axis, so the MXU output
    IS the full packed cl value: p0 + 256*p1 + 65536*p2 <= 2^19 — every
    product and the 3-addend sum are f32-exact (operand bytes <= 255
    are bf16-exact; the weights are powers of two)."""
    codes = jnp.asarray(tables["codes"], jnp.int32)
    lens = jnp.asarray(tables["lengths"], jnp.int32)
    cl = (lens << 16) | codes
    return jnp.concatenate(
        [(cl >> (8 * k)) & 255 for k in range(3)],
        axis=0).astype(jnp.bfloat16)          # (768, 256)


def _rank_pair_cols(tables):
    """(cum, fcb) pair columns for the rank-table variants.

    cum[ctx][l] (l = 1..15) = #symbols with 1 <= length <= l = base[l+1]
    (cum[15] = nsym via base[15] + bl_count[15]); fcb[ctx][l] =
    first_code[l] - cum[l-1] + 256 = first_code[l] - base[l] + 256, so
    the kernel's code = fcb[len] + rank - 256 equals the canonical
    first_code[len] + rank_within. fcb range [256, 33023] fits u16."""
    base = jnp.asarray(tables["base"], jnp.int32)          # (256, 16)
    fc = jnp.asarray(tables["first_code"], jnp.int32)
    lens = jnp.asarray(tables["lengths"], jnp.int32)
    nsym = (lens > 0).astype(jnp.int32).sum(axis=-1)
    cum = jnp.concatenate([base[:, 2:16], nsym[:, None]], axis=1)
    fcb = fc[:, 1:16] - base[:, 1:16] + 256
    return cum, fcb


def _rank_plane(tables):
    """(256, 256) canonical rank bytes: rank = base[len] + code -
    first_code[len] (the index in the sorted-by-(length, symbol) order);
    0 for absent symbols (never drawn by valid data)."""
    lens = jnp.asarray(tables["lengths"], jnp.int32)
    codes = jnp.asarray(tables["codes"], jnp.int32)
    base = jnp.asarray(tables["base"], jnp.int32)
    fc = jnp.asarray(tables["first_code"], jnp.int32)
    lcl = jnp.clip(lens, 0, 15)
    rank = (jnp.take_along_axis(base, lcl, axis=-1) + codes
            - jnp.take_along_axis(fc, lcl, axis=-1))
    return jnp.where(lens > 0, rank, 0)


def build_cl_planes_rank(tables) -> jnp.ndarray:
    """(256, 316) biased int8 RANK-table stack (round 5): cols 0..255 =
    canonical rank[ctx][cur] (1 byte), cols 256..315 = (cum, fcb) pair
    planes [cum_lo, cum_hi, fcb_lo, fcb_hi] x 15 lengths. The kernel
    recomputes len from 14 rank-vs-cum compares and code = fcb[len] +
    rank - 256, so the fetch contracts 316 rows instead of the direct
    table's 768 (2.4x fewer MXU MACs) and the 256-deep cur pick touches
    ONE plane instead of three."""
    cum, fcb = _rank_pair_cols(tables)
    rank = _rank_plane(tables)
    ft = jnp.concatenate(
        [rank, cum & 255, cum >> 8, fcb & 255, fcb >> 8], axis=1)
    return (ft - 128).astype(jnp.int8)


def build_cl_planes_rankbf(tables) -> jnp.ndarray:
    """bf16 build of the rank-table stack (byte values 0..255 exact)."""
    cum, fcb = _rank_pair_cols(tables)
    rank = _rank_plane(tables)
    ft = jnp.concatenate(
        [rank, cum & 255, cum >> 8, fcb & 255, fcb >> 8], axis=1)
    return ft.astype(jnp.bfloat16)


def _lookup_kernel(ft_ref, nv_ref, sym_ref, out_ref, ctxs,
                   *, n_chunks: int, unroll: int = UNROLL,
                   variant: str = "i8"):
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _init():
        ctxs[:] = jnp.zeros((8, 128), jnp.int32)

    ft = ft_ref[:]                  # (256, 768|316) int8 or bf16
    nv = nv_ref[0]                                    # (8, 128) int32
    # int32 iota/compare only: this Mosaic target supports neither
    # int8 iota nor sub-32-bit comparisons (probed on-chip)
    iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)
    liota = jax.lax.broadcasted_iota(jnp.int32, (15, 8, 128), 0) + 1
    dn = (((0,), (0,)), ((), ()))
    boundary_ctx = ctxs[:]      # last symbol of the previous chunk
    bf_variants = ("bf16", "w3", "rankbf")
    oh_dt = jnp.bfloat16 if variant in bf_variants else jnp.int8
    acc_dt = jnp.float32 if variant in bf_variants else jnp.int32
    bias = 0 if variant in bf_variants else 128

    def body(i, _):
        # The context is just the PREVIOUS symbol, already resident in
        # sym_ref — loading it (instead of threading it through the loop
        # carry, round-3 form) leaves every unrolled step data-
        # independent, so the scheduler overlaps step r+1's one-hot/
        # matmul with step r's resolve (round-4 pipelining). The cur
        # select mask of step r IS step r+1's context one-hot, so each
        # step builds ONE 256-deep compare, not two.
        sel_prev = None
        for r in range(unroll):
            j = i * unroll + r
            cur = sym_ref[j, 0]                       # (8, 128) int32
            if r == 0:
                prev = sym_ref[jnp.maximum(i * unroll - 1, 0), 0]
                ctx = jnp.where(i == 0, boundary_ctx, prev)
                ctxw = jnp.broadcast_to(ctx[None], (256, 8, 128))
                oh = (ctxw == iota).astype(oh_dt)
            else:
                oh = sel_prev.astype(oh_dt)
            if variant == "w3":
                # weighted stacked one-hot: the contraction itself
                # assembles cl = p0 + 256*p1 + 65536*p2 (f32-exact, see
                # build_cl_planes_w3) -> ONE 256-deep pick instead of 3
                ohw = jnp.concatenate(
                    [oh, oh * jnp.bfloat16(256.0),
                     oh * jnp.bfloat16(65536.0)], axis=0)
                x = jax.lax.dot_general(
                    ft, ohw, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)  # (256, 8, 128)
            else:
                x = jax.lax.dot_general(
                    ft, oh, dimension_numbers=dn,
                    preferred_element_type=acc_dt)       # (768, 8, 128)
            curw = jnp.broadcast_to(cur[None], (256, 8, 128))
            sel = curw == iota
            sel_prev = sel
            if variant in ("rank", "rankbf"):
                # rank-table resolve (round 5): ONE 256-deep pick (the
                # rank byte), then len from 14 rank-vs-cum compares and
                # code = fcb[len] + rank - 256 — see build_cl_planes_rank
                if variant == "rankbf":
                    rankv = jnp.sum(jnp.where(sel, x[0:256], 0.0),
                                    axis=0).astype(jnp.int32)
                    pr = x[256:316].astype(jnp.int32)   # (60, 8, 128)
                else:
                    rankv = jnp.sum(jnp.where(sel, x[0:256], 0),
                                    axis=0) + bias
                    pr = x[256:316] + bias
                cum = pr[0:14] | (pr[15:29] << 8)       # l = 1..14
                rw = jnp.broadcast_to(rankv[None], cum.shape)
                length = 1 + jnp.sum((rw >= cum).astype(jnp.int32),
                                     axis=0)
                fcb_rows = pr[30:45] | (pr[45:60] << 8)  # l = 1..15
                lw = jnp.broadcast_to(length[None], fcb_rows.shape)
                fcb = jnp.sum(jnp.where(liota == lw, fcb_rows, 0),
                              axis=0)
                cl = (length << 16) | (fcb + rankv - 256)
            elif variant == "w3":
                cl = jnp.sum(jnp.where(sel, x, 0.0),
                             axis=0).astype(jnp.int32)
            elif variant == "bf16":
                y0 = jnp.sum(jnp.where(sel, x[0:256], 0.0),
                             axis=0).astype(jnp.int32)
                y1 = jnp.sum(jnp.where(sel, x[256:512], 0.0),
                             axis=0).astype(jnp.int32)
                y2 = jnp.sum(jnp.where(sel, x[512:768], 0.0),
                             axis=0).astype(jnp.int32)
                cl = y0 | (y1 << 8) | (y2 << 16)
            else:
                y0 = jnp.sum(jnp.where(sel, x[0:256], 0), axis=0) + bias
                y1 = jnp.sum(jnp.where(sel, x[256:512], 0), axis=0) + bias
                y2 = jnp.sum(jnp.where(sel, x[512:768], 0), axis=0) + bias
                cl = y0 | (y1 << 8) | (y2 << 16)
            jg = o * CHUNK_STEPS + j
            out_ref[j, 0] = jnp.where(jg < nv, cl, 0)
        return 0

    jax.lax.fori_loop(0, CHUNK_STEPS // unroll, body, 0)
    ctxs[:] = sym_ref[CHUNK_STEPS - 1, 0]


@partial(jax.jit, static_argnames=("interpret", "variant"))
def lookup_cl_t_pallas(units: jnp.ndarray, n_valid: jnp.ndarray,
                       tables, interpret: bool = False,
                       variant: str = "i8") -> jnp.ndarray:
    """Drop-in for api.lookup_cl_t: (B, n) u8 units -> step-major
    (n, B) packed (len<<16 | code) u32, zeros at masked positions."""
    return lookup_cl_sm_pallas(units.astype(jnp.int32).T, n_valid,
                               tables, interpret=interpret,
                               variant=variant)


@partial(jax.jit, static_argnames=("interpret", "unroll", "variant"))
def lookup_cl_sm_pallas(ut: jnp.ndarray, n_valid: jnp.ndarray,
                        tables, interpret: bool = False,
                        unroll: int | None = None,
                        variant: str = "i8") -> jnp.ndarray:
    """Step-major entry: (n, B) u8/i32 units (already transposed, e.g.
    staged step-major from the host) -> (n, B) packed cl u32."""
    ut = ut.astype(jnp.int32)
    n, B = ut.shape
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
          "w3": build_cl_planes_w3,
          "rank": build_cl_planes_rank,
          "rankbf": build_cl_planes_rankbf}.get(
        variant, build_cl_planes)(tables)
    n_chunks = n_pad // CHUNK_STEPS
    out = pl.pallas_call(
        partial(_lookup_kernel, n_chunks=n_chunks,
                unroll=unroll or UNROLL, variant=variant),
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
        out_specs=pl.BlockSpec((CHUNK_STEPS, 1, 8, 128),
                               lambda t, o: (o, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_tiles, 8, 128),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(Rp) * n_pad * int(ft.shape[-1]) * 256,
            bytes_accessed=int(Rp) * n_pad * 8,
            transcendentals=0),
        interpret=interpret,
    )(ft, nv4, sym4)
    return out.reshape(n_pad, Rp)[:n, :B].astype(jnp.uint32)
