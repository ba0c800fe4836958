"""Context-conditioned byte histograms.

Capability parity: reference hot loop 1 — `counts[prev][cur]++` over the
input, single thread (SURVEY.md §3.1; mount empty, §0). TPU-native
redesign: the 256x256 joint histogram IS a matmul — with A = onehot(prev)
and Bm = onehot(cur) (N x 256 each), counts = A^T @ Bm, which runs on the
MXU at full systolic throughput instead of doing 10^8 serialized
scatter-adds. Chunked accumulation (chunk <= 2^17 rows) keeps every f32
partial count an exact integer before the int32 reduction.

Block semantics: the Markov context resets to `init_ctx` at every block
start, matching the block-parallel encoder (`bitpack.py`), so histograms
computed here correspond exactly to the code streams emitted later.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_CHUNK = 1 << 17  # rows per matmul chunk; per-cell partial <= 2^17 << 2^24


def markov_pairs(data: jnp.ndarray, n_valid: jnp.ndarray, init_ctx: int = 0):
    """(prev, cur, valid) flattened over a (B, n) block batch."""
    data = data.astype(jnp.int32)
    B, n = data.shape
    prev = jnp.concatenate(
        [jnp.full((B, 1), init_ctx, jnp.int32), data[:, :-1]], axis=1)
    valid = jnp.arange(n)[None, :] < n_valid[:, None]
    return prev.reshape(-1), data.reshape(-1), valid.reshape(-1)


@partial(jax.jit, static_argnames=("method",))
def histogram_markov(data: jnp.ndarray, n_valid: jnp.ndarray,
                     init_ctx: int = 0, method: str = "matmul") -> jnp.ndarray:
    """256x256 [prev, cur] counts over a (B, n) block batch. int32.

    method: 'pallas' (VMEM-resident one-hot MXU kernel, TPU),
            'matmul' (chunked XLA one-hot matmul, any backend),
            'scatter' (XLA scatter-add; fast on CPU only).
    All three produce identical counts (tested)."""
    if method == "pallas":
        # v4b kernel (bf16 one-hots in VMEM + bf16 MXU, exact f32
        # accumulation): 42.7 ms real vs v3 int8's 57.6 and the XLA
        # matmul's 75.2 at 32 MB on v5e (bench/hist_probe.py round-4
        # amortized timing) — the bf16 cast packs 2-way vs int8's
        # 4-way shuffle. Counts asserted identical on-chip
        # (test_tpu_chip.py::test_markov_pallas_hist_exact).
        from .kernels import histogram_pallas
        from .. import config as _cfg
        return histogram_pallas.markov_hist_pallas(
            data, n_valid, init_ctx, variant=_cfg.hist_variant())
    prev, cur, valid = markov_pairs(data, n_valid, init_ctx)
    if method == "scatter":
        upd = valid.astype(jnp.int32)
        return jnp.zeros((256, 256), jnp.int32).at[prev, cur].add(upd)
    return _matmul_hist(prev, cur, valid)


def _matmul_hist(prev, cur, valid):
    N = prev.shape[0]
    C = min(_CHUNK, max(N, 1))
    pad = (-N) % C
    if pad:
        prev = jnp.concatenate([prev, jnp.zeros((pad,), jnp.int32)])
        cur = jnp.concatenate([cur, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    prev = prev.reshape(-1, C)
    cur = cur.reshape(-1, C)
    valid = valid.reshape(-1, C)

    # int8 one-hots halve the MXU/HBM cost of the contraction vs bf16
    # (v5e int8 path); partials accumulate in int32 — exact at any chunk
    # size. CPU keeps bf16/f32 (its int8 matmul path is slow).
    i8 = jax.default_backend() == "tpu"
    dt = jnp.int8 if i8 else jnp.bfloat16

    def chunk_step(acc, args):
        p, c, v = args
        a = jax.nn.one_hot(p, 256, dtype=dt) * v[:, None].astype(dt)
        bm = jax.nn.one_hot(c, 256, dtype=dt)
        partial_counts = jax.lax.dot_general(
            a, bm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if i8 else jnp.float32)
        return acc + partial_counts.astype(jnp.int32), None

    acc0 = jnp.zeros((256, 256), jnp.int32)
    acc, _ = jax.lax.scan(chunk_step, acc0, (prev, cur, valid))
    return acc


@partial(jax.jit, static_argnames=("method",))
def histogram_order0(data: jnp.ndarray, n_valid: jnp.ndarray,
                     method: str = "matmul") -> jnp.ndarray:
    """(256,) byte counts over a (B, n) block batch. int32."""
    if method == "pallas":
        from .kernels import histogram_pallas
        return histogram_pallas.order0_hist_pallas(data, n_valid)
    flat = data.astype(jnp.int32).reshape(-1)
    B, n = data.shape
    valid = (jnp.arange(n)[None, :] < n_valid[:, None]).reshape(-1)
    if method == "scatter":
        return jnp.zeros((256,), jnp.int32).at[flat].add(valid.astype(jnp.int32))
    N = flat.shape[0]
    C = min(_CHUNK, max(N, 1))
    pad = (-N) % C
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    flat = flat.reshape(-1, C)
    valid = valid.reshape(-1, C)

    def chunk_step(acc, args):
        c, v = args
        oh = jax.nn.one_hot(c, 256, dtype=jnp.float32) * v[:, None]
        return acc + jnp.sum(oh, axis=0).astype(jnp.int32), None

    acc, _ = jax.lax.scan(chunk_step, jnp.zeros((256,), jnp.int32),
                          (flat, valid))
    return acc
