"""Probe the VPU-domain cost of the one-hot / pick building blocks that
dominate every MXU-fetch kernel (hist, lookup, decode fetch):

  * one-hot build: int32 iota-compare + int8 cast (current) vs bf16
    compare vs 16x16 bit-factorized int8 product,
  * 256-deep masked-sum pick: int32 vs int8 vs f32 domain,
  * in-kernel (256,W)x(256,1024) int8 MXU matmul rate with the one-hot
    build chained (the decode/lookup fetch core),

each as a Pallas fori_loop kernel timed per iteration (loop fixed cost
~6.5 us is measured by the null variant and subtracted mentally; see
bench/loop_calib.py). Run:  python bench/vpu_probe.py [ITERS]

One JSON line. Failed compiles print cleanly (the AOT helper returns
HTTP 500 without wedging the relay — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    res = {"iters": ITERS, "platform": jax.default_backend()}

    def timed(name, kern, extra_in=(), extra_specs=(), n_loops=ITERS):
        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
                * (1 + len(extra_in)),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 << 20),
            )
            x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) & 255
            t0 = time.perf_counter()
            s = int(jnp.sum(f(x, *extra_in)))
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                s = int(jnp.sum(f(x, *extra_in)))
                best = min(best, time.perf_counter() - t0)
            us_it = best / n_loops * 1e6
            res[name] = {"s": round(best, 5),
                         "us_per_iter": round(us_it, 3), "chk": s}
            print(f"[vpu] {name}: {us_it:.3f} us/iter "
                  f"(compile {comp:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"[vpu] {name} FAILED: {str(e)[:200]}", flush=True)

    # every kernel: carry (8,128) int32 ctx in [0,256); each iteration
    # derives the next ctx from the iteration's result so nothing elides.

    def null_kern(x_ref, o_ref):
        def body(i, c):
            return (c + 1) & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("null_loop", null_kern)

    # --- one-hot builds -------------------------------------------------
    def onehot_i32_i8(x_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)

        def body(i, c):
            oh = (jnp.broadcast_to(c[None], (256, 8, 128)) == iota) \
                .astype(jnp.int8)
            # consume: 256-deep sum in int32 of the int8 plane
            s = jnp.sum(oh.astype(jnp.int32) * iota, axis=0)
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("onehot_i32cmp_i8cast_plus_pick", onehot_i32_i8)

    def onehot_bf16(x_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)
        iota_bf = iota.astype(jnp.bfloat16)
        iota_f = iota.astype(jnp.float32)

        def body(i, c):
            cb = c.astype(jnp.bfloat16)
            oh = (jnp.broadcast_to(cb[None], (256, 8, 128)) == iota_bf) \
                .astype(jnp.bfloat16)
            s = jnp.sum(oh * iota_bf, axis=0,
                        dtype=jnp.float32).astype(jnp.int32)
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("onehot_bf16cmp_plus_pick_bf16", onehot_bf16)

    def onehot_fact_i8(x_ref, o_ref):
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, 8, 128), 0)

        def body(i, c):
            hi = (jnp.broadcast_to((c >> 4)[None], (16, 8, 128)) == iota16) \
                .astype(jnp.int8)
            lo = (jnp.broadcast_to((c & 15)[None], (16, 8, 128)) == iota16) \
                .astype(jnp.int8)
            # (256,8,128) int8 one-hot as outer product in the int8 domain
            oh = (jnp.broadcast_to(hi[:, None], (16, 16, 8, 128))
                  * jnp.broadcast_to(lo[None], (16, 16, 8, 128))) \
                .reshape(256, 8, 128)
            iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)
            s = jnp.sum(oh.astype(jnp.int32) * iota, axis=0)
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("onehot_16x16_i8mul_plus_pick", onehot_fact_i8)

    # --- 256-deep picks -------------------------------------------------
    rngtab = jnp.arange(256 * 8, dtype=jnp.int32).reshape(256, 8)[:, :,
                                                                  None]
    tab_i32 = jnp.broadcast_to(rngtab & 255, (256, 8, 128)).astype(
        jnp.int32)

    def pick_i32(x_ref, t_ref, o_ref):
        t = t_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)

        def body(i, c):
            sel = jnp.broadcast_to(c[None], (256, 8, 128)) == iota
            s = jnp.sum(jnp.where(sel, t, 0), axis=0)
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("pick256_i32", pick_i32, extra_in=(tab_i32,))

    def pick_i8(x_ref, t_ref, o_ref):
        t = t_ref[:]                     # (256, 8, 128) int8
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)

        def body(i, c):
            sel = (jnp.broadcast_to(c[None], (256, 8, 128)) == iota) \
                .astype(jnp.int8)
            s = jnp.sum((sel * t).astype(jnp.int32), axis=0)
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("pick256_i8mul_i32sum", pick_i8,
          extra_in=(tab_i32.astype(jnp.int8),))

    def pick_i8_i8sum(x_ref, t_ref, o_ref):
        t = t_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)

        def body(i, c):
            sel = (jnp.broadcast_to(c[None], (256, 8, 128)) == iota) \
                .astype(jnp.int8)
            s8 = jnp.sum(sel * t, axis=0, dtype=jnp.int8)   # <=1 nonzero
            return s8.astype(jnp.int32) & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("pick256_i8mul_i8sum", pick_i8_i8sum,
          extra_in=(tab_i32.astype(jnp.int8),))

    def pick_f32(x_ref, t_ref, o_ref):
        t = t_ref[:]
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)

        def body(i, c):
            sel = jnp.broadcast_to(c[None], (256, 8, 128)) == iota
            s = jnp.sum(jnp.where(sel, t, 0.0), axis=0).astype(jnp.int32)
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    timed("pick256_f32", pick_f32, extra_in=(tab_i32.astype(jnp.float32),))

    # --- fetch core: one-hot + int8 MXU matmul + pick -------------------
    rng = jnp.arange(256 * 316, dtype=jnp.int32).reshape(256, 316)
    planes_i8 = ((rng & 255) - 128).astype(jnp.int8)

    def fetch_i8(x_ref, p_ref, o_ref):
        p = p_ref[:]                     # (256, 316) int8
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)
        dn = (((0,), (0,)), ((), ()))

        def body(i, c):
            oh = (jnp.broadcast_to(c[None], (256, 8, 128)) == iota) \
                .astype(jnp.int8)
            x = jax.lax.dot_general(p, oh, dimension_numbers=dn,
                                    preferred_element_type=jnp.int32)
            s = jnp.sum(x[:16], axis=0) + 128 * 16
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS // 4, body, x_ref[:])

    timed("fetch316_i8_matmul", fetch_i8, extra_in=(planes_i8,),
          n_loops=ITERS // 4)

    def fetch_bf16(x_ref, p_ref, o_ref):
        p = p_ref[:]                     # (256, 316) bf16
        iota = jax.lax.broadcasted_iota(jnp.int32, (256, 8, 128), 0)
        dn = (((0,), (0,)), ((), ()))

        def body(i, c):
            oh = (jnp.broadcast_to(c[None], (256, 8, 128)) == iota) \
                .astype(jnp.bfloat16)
            x = jax.lax.dot_general(p, oh, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
            s = jnp.sum(x[:16], axis=0).astype(jnp.int32)
            return s & 255
        o_ref[:] = jax.lax.fori_loop(0, ITERS // 4, body, x_ref[:])

    timed("fetch316_bf16_matmul", fetch_bf16,
          extra_in=((rng & 255).astype(jnp.bfloat16),),
          n_loops=ITERS // 4)

    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
