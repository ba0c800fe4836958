"""Markov-histogram kernel variant shootout on the real chip.

    python bench/hist_probe.py [MB]

Measures v3 (round-3 default), v4b (bf16 one-hots), v5 (no-reshape
multi-dim contraction), v6 (bf16 + multi-dim) + the XLA matmul, each
with exactness asserted against the matmul counts. Reports both the
raw single-dispatch time and the relay-floor-corrected marginal via a
2x-chained run (round-4 methodology: every single dispatch carries a
~26 ms host-fetch floor). One JSON line.
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
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import engine
    from mhc_tpu.ops import histogram
    from mhc_tpu.ops.kernels import histogram_pallas

    data = bench_mod.make_corpus(n_mb << 20)
    st = engine.stage(data, mode="markov", chunk_units=None)
    ud, nvd = st.units[0], st.n_valid[0]
    res = {"mb": n_mb, "platform": jax.default_backend()}

    ref = np.asarray(histogram.histogram_markov(ud, nvd, method="matmul"))

    def timed(name, fn1, fn2):
        try:
            a = np.asarray(fn1())
            ok = bool((a == ref).all())
            ts = []
            for f in (fn1, fn2):
                int(jnp.sum(f()))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(jnp.sum(f()))
                    best = min(best, time.perf_counter() - t0)
                ts.append(best)
            marg = ts[1] - ts[0]
            res[name] = {"t1_s": round(ts[0], 4),
                         "marginal_s": round(marg, 4), "exact": ok,
                         "GBps": round((n_mb << 20) / max(marg, 1e-9)
                                       / 1e9, 3)}
            print(f"[hist] {name}: t1 {ts[0] * 1e3:.1f} ms, marginal "
                  f"{marg * 1e3:.1f} ms, exact={ok}", flush=True)
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
            print(f"[hist] {name} FAILED: {str(e)[:160]}", flush=True)

    def make(variant):
        def one():
            return histogram_pallas.markov_hist_pallas(
                ud, nvd, variant=variant)

        def two():
            a = histogram_pallas.markov_hist_pallas(ud, nvd,
                                                    variant=variant)
            # data-dependent second pass (can't CSE): shift input by the
            # parity of the first result — parity of total count is
            # fixed, so counts stay comparable but XLA can't dedupe
            b = histogram_pallas.markov_hist_pallas(
                ud + (a[0, 0] % 2).astype(jnp.uint8), nvd,
                variant=variant)
            return a + b
        return one, two

    for v in ("v3", "v4b", "v5", "v6"):
        timed(v, *make(v))

    def m1():
        return histogram.histogram_markov(ud, nvd, method="matmul")

    def m2():
        a = histogram.histogram_markov(ud, nvd, method="matmul")
        b = histogram.histogram_markov(
            ud + (a[0, 0] % 2).astype(jnp.uint8), nvd, method="matmul")
        return a + b

    timed("xla_matmul", m1, m2)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
