"""Per-op breakdown of the encode pack path at bench shapes.

    python bench/encode_micro.py [MB]

The round-2 stage table times "pack (incl lookup)" as one number; this
splits it into the XLA gather lookup, the step-major transposes, the
Mosaic pack kernel itself, and the bubble-compaction cumsum+scatter —
the instrument for the speed-of-light table (VERDICT r2 item 3). One
JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def timed(fn, reps=3):
    # block_until_ready returns EARLY for warm Mosaic dispatches through
    # the relay — force a host scalar that depends on every jax leaf
    import jax
    import jax.numpy as jnp

    def run():
        out = fn()
        for leaf in jax.tree_util.tree_leaves(out):
            if isinstance(leaf, jax.Array) and leaf.size:
                int(jnp.sum(leaf.reshape(-1)[:: max(leaf.size // 4096, 1)]
                            .astype(jnp.int32)))
        return out

    run()   # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import api, engine
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops.kernels import encode_pallas
    from mhc_tpu.ops import bitpack

    n_bytes = n_mb << 20
    data = bench_mod.make_corpus(n_bytes)
    model = get_model("markov")
    st = engine.stage(data, mode="markov", chunk_units=None)
    counts = engine.histogram(st)
    lengths = model.lengths_from_counts(counts)
    tables = model.tables_from_lengths(lengths)
    jax.block_until_ready(tables["lim"])
    ud, nvd = st.units[0], st.n_valid[0]
    R, n = ud.shape
    chunk_bytes = R * n
    res = {"mb": n_mb, "chunk_units": R, "du": n,
           "platform": jax.default_backend()}

    def report(name, s):
        res[name] = {"s": round(s, 5),
                     "GBps": round(chunk_bytes / s / 1e9, 3)}
        print(f"[enc-micro] {name}: {s:.5f}s "
              f"({chunk_bytes / s / 1e9:.3f} GB/s of input)", flush=True)

    # 1. lookup variants (direct impl calls — the env knob freezes at
    # first trace inside the jitted dispatch)
    from mhc_tpu.ops import bitpack as bp
    packed_t = ((tables["lengths"].astype(jnp.uint32) << 16)
                | tables["codes"].astype(jnp.uint32))
    data_i = ud.astype(jnp.int32)
    prev_i = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), data_i[:, :-1]], axis=1)
    report("lookup_flat_gather", timed(jax.jit(
        lambda: bp._flat_gather(packed_t, prev_i, data_i))))
    report("lookup_bilinear_bf16", timed(jax.jit(
        lambda: bp._bilinear_lookup(packed_t, prev_i, data_i))))
    report("lookup_bilinear_int8", timed(jax.jit(
        lambda: bp._bilinear_lookup_i8(packed_t, prev_i, data_i))))
    report("lookup_cl_default", timed(
        lambda: api.lookup_cl(ud, nvd, tables)))
    report("lookup_cl_t", timed(
        lambda: api.lookup_cl_t(ud, nvd, tables)))

    @jax.jit
    def transpose_i32(u):
        return u.astype(jnp.int32).T

    report("units_i32_transpose", timed(lambda: transpose_i32(ud)))

    # gather on PRE-transposed (step-major) input: isolates the device
    # transpose from the gather itself (round-4: if the transpose is the
    # bulk of lookup_cl_t, stage the units step-major from the host)
    ut_pre = jax.block_until_ready(transpose_i32(ud))

    @jax.jit
    def lookup_sm(ut):
        prev = jnp.concatenate(
            [jnp.zeros((1, R), jnp.int32), ut[:-1]], axis=0)
        cl = bp._gather_packed(tables["codes"], tables["lengths"],
                               prev, ut)
        valid = jnp.arange(n)[:, None] < nvd[None, :]
        return jnp.where(valid, cl, jnp.uint32(0))

    report("lookup_cl_t_pre_transposed", timed(lambda: lookup_sm(ut_pre)))

    from mhc_tpu.ops.kernels import lookup_pallas
    report("lookup_cl_t_pallas", timed(
        lambda: lookup_pallas.lookup_cl_t_pallas(ud, nvd, tables)))
    codes_l, lens_l = api.lookup_codes(ud, nvd, tables)
    jax.block_until_ready(codes_l)

    # 2. step-major transpose of the operands (as in pack_blocks_pallas)
    LANES = encode_pallas.LANES
    CH = encode_pallas.CHUNK_STEPS
    n_tiles = (R + LANES - 1) // LANES
    Rp = n_tiles * LANES
    n_pad = (n + CH - 1) // CH * CH

    @jax.jit
    def transpose_ops(codes, lens):
        c = codes.astype(jnp.uint32).reshape(n_tiles, 8, 128, n_pad)
        l = lens.astype(jnp.int32).reshape(n_tiles, 8, 128, n_pad)
        return jnp.moveaxis(c, 3, 1), jnp.moveaxis(l, 3, 1)

    report("operand_transpose", timed(
        lambda: transpose_ops(codes_l, lens_l)))

    # 3. full pack kernel call (includes 1+2 internally)
    report("pack_full", timed(
        lambda: encode_pallas.pack_blocks_pallas(codes_l, lens_l)))

    # 4. fused pack-to-payload (bench default path)
    report("pack_to_payload", timed(
        lambda: encode_pallas.pack_blocks_to_payload(codes_l, lens_l)))

    # 5. bubble compaction alone (cumsum + scatter at bubble shapes)
    n_rounds = n_pad // 2
    W = bitpack.words_for_block(n)
    key = jax.random.PRNGKey(0)
    bwr = jax.random.randint(
        key, (Rp, n_rounds), 0, 1 << 30, jnp.int32).astype(jnp.uint32)
    bvr = jax.random.randint(key, (Rp, n_rounds), 0, 2, jnp.int32)
    tail_r = jnp.zeros((Rp,), jnp.uint32)
    nbits_r = (jnp.sum(bvr, axis=1) * 32).astype(jnp.uint32)
    report("bubble_compact", timed(
        lambda: encode_pallas.compact_bubbles(bwr, bvr, tail_r,
                                              nbits_r, W)))

    # 6. whole-chunk encode via engine for scale
    report("engine_encode_all_chunks", timed(
        lambda: engine.encode(st), reps=2))
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
