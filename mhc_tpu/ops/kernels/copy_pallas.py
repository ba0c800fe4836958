"""Pallas TPU ragged row copy (DMA) kernels.

Capability parity: the reference streams its bitstream to/from a file
byte-serially (SURVEY.md §2 L0; mount empty, §0). The TPU container
instead stores a dense payload of byte-aligned unit streams, and the
codec needs two ragged relayouts around it:

  expand:  payload (T,) u32  + unit word offsets -> (R, W) u32 rows
  compact: (R, W) u32 rows   + unit word offsets -> payload (T,) u32

XLA's gather/scatter lowerings price these at ~6-20 ns PER WORD on v5e
(bench/stages.py round 3: 0.13-0.15 s for ~7M words at 32 MB — ~25% of
each direction's total). But both are CONTIGUOUS row copies at
word-aligned offsets, which is exactly what the DMA engines do at HBM
rate: these kernels issue one async copy per unit row with the offsets
scalar-prefetched into SMEM.

Both source and destination refs live in ANY (HBM) memory space — VMEM
refs cannot be sliced into single rows (Mosaic requires sublane-tiled
(8k, 128m) slices; probed on v5e), while HBM refs are untiled, so a
row-granular HBM->HBM DMA has no alignment constraint at all.

Correctness contracts (tested against the gather versions bit-for-bit):
  * expand zero-masks words past a unit's true length (same as
    device_expand_words_u32).
  * compact serializes the per-unit copies in ascending unit order so
    each unit's fixed-W garbage tail is overwritten by its successors
    (same overwrite argument as device_compact_words_slices), then
    zero-masks positions past the true total.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UB = 32          # units copied per grid step


def _expand_kernel(offs_ref, pay_ref, out_ref, sems, *, W: int):
    # out_ref is the FLAT (Rp*W,) row buffer: 2D refs carry (8, 128)
    # tiling even in HBM and cannot be sliced row-wise (probed on v5e);
    # 1D refs slice at any element offset
    r0 = pl.program_id(0) * UB
    # reads never conflict: start all UB copies, then drain
    for u in range(UB):
        pltpu.make_async_copy(
            pay_ref.at[pl.ds(offs_ref[r0 + u], W)],
            out_ref.at[pl.ds((r0 + u) * W, W)], sems.at[u]).start()
    for u in range(UB):
        pltpu.make_async_copy(
            pay_ref.at[pl.ds(offs_ref[r0 + u], W)],
            out_ref.at[pl.ds((r0 + u) * W, W)], sems.at[u]).wait()


@partial(jax.jit, static_argnames=("W", "interpret"))
def device_expand_words_dma(payload: jnp.ndarray,
                            word_offsets: jnp.ndarray,
                            word_lens: jnp.ndarray, W: int,
                            interpret: bool = False) -> jnp.ndarray:
    """DMA form of device_expand_words_u32 (bit-identical, tested):
    (T,) u32 payload -> (R, W) u32 zero-padded unit word streams."""
    R = word_lens.shape[0]
    Rp = -(-R // UB) * UB
    # slack so the last units' fixed-W reads stay in bounds; offsets are
    # clamped so even an all-empty tail reads inside the padded buffer
    paypad = jnp.concatenate([payload, jnp.zeros((W,), payload.dtype)])
    offs = jnp.clip(word_offsets[:R], 0, payload.shape[0])
    if Rp != R:
        offs = jnp.concatenate(
            [offs, jnp.zeros((Rp - R,), word_offsets.dtype)])
    offs = offs.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // UB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((UB,))],
    )
    rows = pl.pallas_call(
        partial(_expand_kernel, W=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp * W,), payload.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * int(Rp) * W * 4,
            transcendentals=0),
        interpret=interpret,
    )(offs, paypad).reshape(Rp, W)[:R]
    ok = jnp.arange(W)[None, :] < word_lens[:, None]
    return jnp.where(ok, rows, 0)


def _compact_kernel(offs_ref, words_ref, out_ref, sems, *, W: int):
    # words_ref is the FLAT (Rp*W,) row buffer (see _expand_kernel)
    r0 = pl.program_id(0) * UB
    # writes DO conflict (unit u's garbage tail overlaps its successors'
    # rows): strictly serialize so later units win, matching
    # device_compact_words_slices' ascending-order overwrite argument
    for u in range(UB):
        cp = pltpu.make_async_copy(
            words_ref.at[pl.ds((r0 + u) * W, W)],
            out_ref.at[pl.ds(offs_ref[r0 + u], W)], sems.at[u])
        cp.start()
        cp.wait()


@partial(jax.jit, static_argnames=("total_pad", "interpret"))
def device_compact_words_dma(words: jnp.ndarray,
                             word_offsets: jnp.ndarray,
                             total_pad: int,
                             interpret: bool = False) -> jnp.ndarray:
    """DMA form of device_compact_words (bit-identical, tested):
    (R, W) u32 rows + offsets (R+1,) -> (total_pad,) u32 dense payload,
    zero past word_offsets[-1]."""
    R, W = words.shape
    Rp = -(-R // UB) * UB
    total = word_offsets[-1]
    offs = word_offsets[:R].astype(jnp.int32)
    if Rp != R:
        # pad rows park at the true total: their zero rows land in the
        # [total, total+W) slack and are zero-masked below anyway
        offs = jnp.concatenate(
            [offs, jnp.broadcast_to(total.astype(jnp.int32), (Rp - R,))])
        words = jnp.concatenate(
            [words, jnp.zeros((Rp - R, W), words.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Rp // UB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((UB,))],
    )
    buf = pl.pallas_call(
        partial(_compact_kernel, W=W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total_pad + W,), words.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * int(Rp) * W * 4,
            transcendentals=0),
        interpret=interpret,
    )(offs, words.reshape(-1))
    j = jnp.arange(total_pad, dtype=jnp.int32)
    return jnp.where(j < total, buf[:total_pad], 0)
