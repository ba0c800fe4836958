"""Calibrate Mosaic fori_loop cost: fixed per-iteration overhead vs
per-op cost, on the real chip.

    python bench/loop_calib.py

Runs a minimal Pallas kernel whose body is a chain of N dependent
(8, 128) uint32 ops, for several N, plus variants with a VMEM scratch
round-trip, a pl.when store, and a wide (8, 128, 64) masked-sum — the
building blocks of the decode loop. Fits time = a + b*N per iteration.
One JSON line.
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

    ITERS = 4096
    res = {"iters": ITERS, "platform": jax.default_backend()}

    def make(n_ops: int, variant: str = "chain"):
        def kern(x_ref, o_ref, scr):
            x = x_ref[:]
            if variant == "wide":
                big = jnp.broadcast_to(x[:, :, None], (8, 128, 64))
                iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 64), 2)

            def body(i, c):
                if variant == "chain":
                    for k in range(n_ops):
                        c = (c + jnp.uint32(k + 1)) ^ (c >> jnp.uint32(1))
                elif variant == "scratch":
                    for k in range(n_ops):
                        scr[:] = c
                        c = scr[:] + jnp.uint32(k + 1)
                elif variant == "store":
                    for k in range(n_ops):
                        c = (c + jnp.uint32(k + 1)) ^ (c >> jnp.uint32(1))

                    @pl.when((i & 1) == 1)
                    def _():
                        o_ref[:] = c
                elif variant == "wide":
                    for k in range(n_ops):
                        sel = iota == jnp.broadcast_to(
                            (c[:, :, None] & 63), (8, 128, 64))
                        c = c + jnp.sum(
                            jnp.where(sel, big, jnp.uint32(0)).astype(
                                jnp.int32), axis=2).astype(jnp.uint32)
                return c

            c = jax.lax.fori_loop(0, ITERS, body, x)
            o_ref[:] = c

        return kern

    x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)

    def timed(name, n_ops, variant):
        kern = make(n_ops, variant)
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.uint32)],
        )
        t0 = time.perf_counter()
        s = int(jnp.sum(f(x).astype(jnp.int32)))
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s = int(jnp.sum(f(x).astype(jnp.int32)))
            best = min(best, time.perf_counter() - t0)
        ns_it = best / ITERS * 1e9
        res[name] = {"s": round(best, 5), "ns_per_iter": round(ns_it, 1)}
        print(f"[calib] {name}: {best:.5f}s = {ns_it:.0f} ns/iter "
              f"(compile {comp:.1f}s)", flush=True)

    timed("chain_4", 4, "chain")
    timed("chain_32", 32, "chain")
    timed("chain_128", 128, "chain")
    timed("chain_512", 512, "chain")
    timed("scratch_8", 8, "scratch")
    timed("store_32", 32, "store")
    timed("wide_1", 1, "wide")
    timed("wide_4", 4, "wide")
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
