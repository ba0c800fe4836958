"""Pallas TPU histogram kernel.

The XLA matmul histogram (ops/histogram.py) materializes the one-hot
operands to HBM — ~1000 bytes of traffic per input byte. This kernel
builds the one-hot matrices in VMEM (never touching HBM), runs the
256x256-contraction on the MXU, and accumulates int32-exact partials:
each grid step's f32 partial is bounded by the chunk size (< 2^24) so the
int32 running sum is exact for any input length.

Layout: the caller supplies flattened (prev, cur) streams padded with the
sentinel 256 — a one-hot row of a sentinel is all-zero, so padded and
masked positions contribute nothing (no mask operand needed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048   # order-0 kernel rows per grid step
# markov kernel: symbols per grid step. Each step builds two (256, MCHUNK)
# bf16 one-hots in VMEM (2 x 8 MB at 16384) and runs one MXU contraction;
# larger chunks amortize the ~6.5 us/step Mosaic loop tax
# (bench/loop_calib.py). f32 partial <= MCHUNK << 2^24 — int32-exact.
MCHUNK = 16384


def _hist_kernel(prev_ref, cur_ref, out_ref, *, variant: str = "v3"):
    # round-3 rewrite (v3): the round-2 (CHUNK, 1)-block,
    # axis-0-contraction version crashed the remote Mosaic compiler
    # (HTTP 500; CLAUDE.md traps). This form sticks to patterns the
    # decode kernels already prove on this toolchain: (8, K) lane-major
    # operands, sublane broadcast + iota compare for the one-hots, a
    # minor-axes merge reshape (decode_pallas._fetch_all), and an int8
    # 2D matmul with int32 accumulation (decode mxu5) — one-hot
    # products are exact in int8, and the v5e int8 MXU path runs at 2x
    # the bf16 rate with no f32->int cast on the hot output.
    #
    # Round-4 variants (bench/hist_probe.py picks the default):
    #   v3   int8 one-hots, minor-merge reshape, int8 MXU (round 3)
    #   v4b  bf16 one-hots (2-way packed cast vs int8's 4-way), bf16
    #        MXU with exact f32 accumulation (one-hot operands are 0/1,
    #        partials <= MCHUNK << 2^24)
    #   v5   int8 one-hots, multi-dim (8,K) contraction — no reshape
    #        (the (256,8,K)->(256,8K) merge interleaves sublanes into
    #        lanes: a relayout, suspected v3 overhead)
    #   v6   bf16 one-hots, multi-dim contraction
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    p = prev_ref[0]                                   # (8, MCHUNK//8)
    c = cur_ref[0]
    K = MCHUNK // 8
    # One-hot build stays in the INT32 domain: this Mosaic target
    # implements neither int8 iota nor sub-32-bit comparisons (both
    # probed on-chip: "Only 16- and 32-bit Iota supported", "Target
    # does not support this comparison"), so the 256-deep compare+cast
    # is the kernel's floor.
    iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, K), 0)
    dt = jnp.bfloat16 if variant in ("v4b", "v6") else jnp.int8
    acc = jnp.float32 if dt == jnp.bfloat16 else jnp.int32
    a = (jnp.broadcast_to(p[None], (256, 8, K)) == iota).astype(dt)
    b = (jnp.broadcast_to(c[None], (256, 8, K)) == iota).astype(dt)
    if variant in ("v5", "v6"):
        partial_counts = jax.lax.dot_general(
            a, b, dimension_numbers=(((1, 2), (1, 2)), ((), ())),
            preferred_element_type=acc)
    else:
        partial_counts = jax.lax.dot_general(
            a.reshape(256, 8 * K), b.reshape(256, 8 * K),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc)
    out_ref[:] += partial_counts.astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret", "variant"))
def histogram_pairs_pallas(prev: jnp.ndarray, cur: jnp.ndarray,
                           interpret: bool = False,
                           variant: str = "v3") -> jnp.ndarray:
    """256x256 [prev, cur] counts. prev/cur: (N,) int32 with sentinel 256
    marking padded/masked positions. Returns (256, 256) int32."""
    N = prev.shape[0]
    pad = (-N) % MCHUNK
    if pad:
        prev = jnp.concatenate([prev, jnp.full((pad,), 256, jnp.int32)])
        cur = jnp.concatenate([cur, jnp.full((pad,), 256, jnp.int32)])
    n_chunks = prev.shape[0] // MCHUNK
    prev2 = prev.reshape(n_chunks, 8, MCHUNK // 8)
    cur2 = cur.reshape(n_chunks, 8, MCHUNK // 8)

    return pl.pallas_call(
        partial(_hist_kernel, variant=variant),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, MCHUNK // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, MCHUNK // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(prev2.size) * 256 * 256,
            bytes_accessed=int(prev2.size) * 8 + 256 * 256 * 4,
            transcendentals=0),
        interpret=interpret,
    )(prev2, cur2)


def markov_hist_pallas(data: jnp.ndarray, n_valid: jnp.ndarray,
                       init_ctx: int = 0,
                       interpret: bool = False,
                       variant: str = "v3") -> jnp.ndarray:
    """(B, n) block batch -> (256, 256) [prev, cur] counts, context reset
    per block, positions past n_valid masked via the sentinel."""
    data = data.astype(jnp.int32)
    B, n = data.shape
    prev = jnp.concatenate(
        [jnp.full((B, 1), init_ctx, jnp.int32), data[:, :-1]], axis=1)
    valid = jnp.arange(n)[None, :] < n_valid[:, None]
    cur = jnp.where(valid, data, 256)
    return histogram_pairs_pallas(prev.reshape(-1), cur.reshape(-1),
                                  interpret=interpret, variant=variant)


def _hist0_kernel(cur_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    c = cur_ref[0]                                    # (CHUNK, 1)
    sym = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 256), 1)
    b = (c == sym).astype(jnp.int32)
    # major-axis split (CHUNK, 256) -> (CHUNK//8, 8, 256) is
    # layout-preserving; the axis-0 reduce lands on the (8, 256) output
    # tile directly — no MXU, no (1, 256) sub-tile write
    out_ref[:] += jnp.sum(b.reshape(CHUNK // 8, 8, 256), axis=0)


def order0_hist_pallas(data: jnp.ndarray, n_valid: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(256,) byte counts via a direct 256-bin VPU-reduce kernel (the
    round-1 version computed the full 256x256 pair histogram and summed
    it — 256x the needed FLOPs)."""
    data = data.astype(jnp.int32)
    B, n = data.shape
    valid = jnp.arange(n)[None, :] < n_valid[:, None]
    cur = jnp.where(valid, data, 256).reshape(-1)
    N = cur.shape[0]
    pad = (-N) % CHUNK
    if pad:
        cur = jnp.concatenate([cur, jnp.full((pad,), 256, jnp.int32)])
    n_chunks = cur.shape[0] // CHUNK
    cur2 = cur.reshape(n_chunks, CHUNK, 1)
    out = pl.pallas_call(
        _hist0_kernel,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((1, CHUNK, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 256), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=int(cur2.size) * 256,
            bytes_accessed=int(cur2.size) * 4 + 8 * 256 * 4,
            transcendentals=0),
        interpret=interpret,
    )(cur2)
    return out.sum(axis=0)
