"""Small Mosaic capability probes, run LAST in a chain (a failed remote
compile can wedge the relay):

  1. int8 x int8 -> int32 dot_general inside a Pallas kernel (would
     double the decode fetch matmul rate vs bf16).
  2. the rewritten markov histogram kernel (histogram_pallas v2) vs the
     XLA matmul hist — correctness + timing at 16 MB scale.

One JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    res = {"platform": jax.default_backend()}

    # --- probe 1: in-kernel int8 matmul ------------------------------
    def i8_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    try:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(-128, 127, (256, 256), np.int8))
        b = jnp.asarray(rng.integers(-128, 127, (256, 256), np.int8))
        out = pl.pallas_call(
            i8_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 256), jnp.int32),
        )(a, b)
        ref = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
        res["i8_matmul"] = bool((np.asarray(out) == ref).all())
    except Exception as e:  # noqa: BLE001
        res["i8_matmul"] = f"{type(e).__name__}: {e}"[:200]
    print(f"[probe] i8_matmul: {res['i8_matmul']}", flush=True)

    # --- probe 2: markov hist kernel v2 ------------------------------
    try:
        import bench as bench_mod
        from mhc_tpu.ops import histogram
        from mhc_tpu.ops.kernels import histogram_pallas
        data = np.frombuffer(bench_mod.make_corpus(16 << 20),
                             np.uint8).reshape(-1, 8192)
        nv = np.full((data.shape[0],), 8192, np.int32)
        d = jnp.asarray(data)
        nvd = jnp.asarray(nv)
        ref = histogram.histogram_markov(d, nvd, method="matmul")
        t0 = time.perf_counter()
        int(jnp.sum(histogram.histogram_markov(d, nvd, method="matmul")))
        res["hist_matmul_s"] = round(time.perf_counter() - t0, 4)
        out = histogram_pallas.markov_hist_pallas(d, nvd)
        ok = bool(jnp.array_equal(out, ref))
        t0 = time.perf_counter()
        int(jnp.sum(histogram_pallas.markov_hist_pallas(d, nvd)))
        res["hist_pallas_s"] = round(time.perf_counter() - t0, 4)
        res["hist_pallas_ok"] = ok
    except Exception as e:  # noqa: BLE001
        res["hist_pallas_ok"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
