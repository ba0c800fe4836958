"""Pallas decode kernel math tests.

The compiled kernel only runs on a real TPU; these tests validate the
EXACT kernel arithmetic through `decode_tile_reference` — a pure-jnp
driver over the same _refill/_decode_one functions the Mosaic kernel
calls — plus one tiny interpret-mode run of the full pallas_call
plumbing (grid, scratch, output packing)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhc_tpu.ops import bitpack, canonical, histogram, huffman
from mhc_tpu.ops.kernels import decode_pallas as dp


def _tables(blocks, nv, markov):
    if markov:
        cm = histogram.histogram_markov(jnp.array(blocks), jnp.array(nv),
                                        method="scatter")
    else:
        cm = histogram.histogram_order0(jnp.array(blocks), jnp.array(nv),
                                        method="scatter")
    lx = huffman.code_lengths(jnp.array(huffman.rescale_counts(np.array(cm))))
    t = canonical.canonical_codes(lx)
    if not markov:
        t = {k: jnp.broadcast_to(v, (256,) + v.shape) for k, v in t.items()}
    return t


def _encode_tile(blocks, nv, t):
    w, _ = bitpack.encode_blocks_merge(jnp.array(blocks), jnp.array(nv),
                                       t["codes"], t["lengths"])
    R = blocks.shape[0]
    W = (max(w.shape[1], 3) + 127) // 128 * 128
    wpad = np.zeros((R, W), np.uint32)
    wpad[:, :w.shape[1]] = np.array(w)
    return wpad.reshape(8, 128, W)


@pytest.mark.parametrize("markov", [True, False])
@pytest.mark.parametrize("n", [256, 1024])
def test_kernel_math_roundtrip(markov, n):
    rng = np.random.default_rng(n + markov)
    R = 1024
    payload = rng.integers(0, 256, R * n, dtype=np.uint8)
    payload[payload < 150] %= 31  # skew
    blocks = payload.reshape(R, n)
    nv = np.full(R, n, np.int32)
    t = _tables(blocks, nv, markov)
    tile = _encode_tile(blocks, nv, t)
    ft = dp.build_fetch_table(t["lim"], t["base"], t["first_code"],
                              t["sorted_syms"])
    out = np.array(jax.jit(
        dp.decode_tile_reference, static_argnames=("n_out", "markov"))(
        jnp.array(tile), ft, n_out=n, markov=markov))
    assert (out == blocks.reshape(8, 128, n)).all()


def test_fetch_table_contents():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 500, (256, 256)).astype(np.int32)
    lx = huffman.code_lengths(jnp.array(huffman.rescale_counts(counts)))
    t = canonical.canonical_codes(lx)
    ft = np.array(dp.build_fetch_table(
        t["lim"], t["base"], t["first_code"], t["sorted_syms"]))
    lim = np.array(t["lim"]).astype(np.int64)
    base = np.array(t["base"])
    first = np.array(t["first_code"])
    ss = np.array(t["sorted_syms"])
    for c in (0, 17, 255):
        for l in range(1, 15):
            assert (ft[c, l - 1] & 0xFFFF) == (lim[c, l] & 0xFFFF)
        for l in range(1, 16):
            assert (ft[c, l - 1] >> 16) == base[c, l] - first[c, l]
        for q in range(64):
            w = ft[c, 15 + q]
            for k in range(4):
                assert ((w >> (8 * (3 - k))) & 255) == ss[c, 4 * q + k]


def test_pallas_plumbing_interpret():
    """Tiny order-0 run through the real pallas_call (interpret mode)."""
    rng = np.random.default_rng(5)
    n, R = 16, 1024
    blocks = rng.integers(97, 110, (R, n), dtype=np.uint8)
    nv = np.full(R, n, np.int32)
    t = _tables(blocks, nv, False)
    w, _ = bitpack.encode_blocks_merge(jnp.array(blocks), jnp.array(nv),
                                       t["codes"], t["lengths"])
    out = np.array(dp.decode_blocks_pallas(
        w, t["lim"], t["base"], t["first_code"], t["sorted_syms"],
        n_out=n, markov=False, interpret=True, out_chunk=16))
    assert (out[:R, :n] == blocks).all()


@pytest.mark.parametrize("markov", [True, False])
def test_pallas_plumbing_lane_tiled_interpret(markov):
    """R=2048 picks lane-tile 2 (8x256 lanes) — full pallas_call
    plumbing in interpret mode, markov ctx threading across the wide
    lane minor."""
    rng = np.random.default_rng(7)
    n, R = 16, 2048
    blocks = rng.integers(60, 90, (R, n), dtype=np.uint8)
    nv = np.full(R, n, np.int32)
    t = _tables(blocks, nv, markov)
    w, _ = bitpack.encode_blocks_merge(jnp.array(blocks), jnp.array(nv),
                                       t["codes"], t["lengths"])
    out = np.array(dp.decode_blocks_pallas(
        w, t["lim"], t["base"], t["first_code"], t["sorted_syms"],
        n_out=n, markov=markov, interpret=True, out_chunk=16))
    assert (out[:R, :n] == blocks).all()


@pytest.mark.parametrize("markov", [True, False])
def test_pallas_chains_bit_identical(markov):
    """chains=2 (interleaved lane-slice software pipelining) must decode
    byte-identically to chains=1 through the full pallas_call plumbing
    (interpret mode; the math per lane is unchanged by construction)."""
    rng = np.random.default_rng(11)
    n, R = 32, 2048
    blocks = rng.integers(40, 120, (R, n), dtype=np.uint8)
    nv = np.full(R, n, np.int32)
    t = _tables(blocks, nv, markov)
    w, _ = bitpack.encode_blocks_merge(jnp.array(blocks), jnp.array(nv),
                                       t["codes"], t["lengths"])
    kw = dict(n_out=n, markov=markov, interpret=True, out_chunk=16,
              fetch_impl="mxu4" if markov else "chunk")
    ref = np.array(dp.decode_blocks_pallas(
        w, t["lim"], t["base"], t["first_code"], t["sorted_syms"], **kw))
    got = np.array(dp.decode_blocks_pallas(
        w, t["lim"], t["base"], t["first_code"], t["sorted_syms"],
        chains=2, **kw))
    assert (got == ref).all()
    assert (ref[:R, :n] == blocks).all()


@pytest.mark.parametrize("fetch_impl", ["sparse", "mxu", "mxu2", "mxu3",
                                        "mxu4", "mxu5", "mxu6", "slab"])
def test_kernel_math_fetch_impls(fetch_impl):
    """Every fetch variant decodes bit-identically (pure-jnp mirror)."""
    rng = np.random.default_rng(99)
    R, n = 1024, 256
    payload = rng.integers(0, 256, R * n, dtype=np.uint8)
    payload[payload < 200] %= 17  # text-like clustering
    blocks = payload.reshape(R, n)
    nv = np.full(R, n, np.int32)
    t = _tables(blocks, nv, True)
    tile = _encode_tile(blocks, nv, t)
    ft = dp.build_fetch_table(t["lim"], t["base"], t["first_code"],
                              t["sorted_syms"])
    out = np.array(jax.jit(
        dp.decode_tile_reference,
        static_argnames=("n_out", "markov", "fetch_impl"))(
        jnp.array(tile), ft, n_out=n, markov=True,
        fetch_impl=fetch_impl))
    assert (out == blocks.reshape(8, 128, n)).all()
