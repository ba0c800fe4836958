"""Amortized (relay-floor-corrected) lookup stage measurement.

Round-4 finding: EVERY single-dispatch timing through the axon relay has
a ~26 ms floor (host-scalar fetch round-trip) — `concat_only`,
`mask_only`, and a zero-arg (constant-folded) gather all "measured"
exactly 26 ms. This probe chains K DATA-DEPENDENT applications of each
op inside one jit and reports (t_K - t_1) / (K - 1): the true marginal
cost per application, with dispatch+fetch overhead subtracted.

    python bench/lookup_fuse_probe.py [MB]

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

K = 9


def main() -> int:
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import engine
    from mhc_tpu.models.entropy import get_model

    data = bench_mod.make_corpus(n_mb << 20)
    model = get_model("markov")
    st = engine.stage(data, mode="markov", chunk_units=None)
    counts = engine.histogram(st)
    tables = model.tables_from_lengths(model.lengths_from_counts(counts))
    jax.block_until_ready(tables["lim"])
    ud, nvd = st.units[0], st.n_valid[0]
    utd = st.units_sm[0] if st.units_sm else None
    R, n = ud.shape
    chunk_bytes = R * n
    res = {"mb": n_mb, "k": K, "platform": jax.default_backend()}
    packed_t = ((tables["lengths"].astype(jnp.uint32) << 16)
                | tables["codes"].astype(jnp.uint32))
    flat_t = jax.block_until_ready(packed_t.reshape(-1))

    def bench_pair(name, make, src):
        """make(k) -> jitted fn applying the op k times (data-chained)."""
        f1, fk = make(1), make(K)
        try:
            for f in (f1, fk):
                int(jnp.sum(f(src).reshape(-1)[::65537].astype(jnp.int32)))
            ts = []
            for f in (f1, fk):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(jnp.sum(f(src).reshape(-1)[::65537]
                                .astype(jnp.int32)))
                    best = min(best, time.perf_counter() - t0)
                ts.append(best)
            per = (ts[1] - ts[0]) / (K - 1)
            res[name] = {"t1_s": round(ts[0], 5), "tk_s": round(ts[1], 5),
                         "marginal_s": round(per, 5),
                         "GBps": round(chunk_bytes / max(per, 1e-9) / 1e9,
                                       3)}
            print(f"[fuse2] {name}: marginal {per * 1e3:.2f} ms "
                  f"({chunk_bytes / max(per, 1e-9) / 1e9:.3f} GB/s), "
                  f"t1 {ts[0] * 1e3:.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
            print(f"[fuse2] {name} FAILED: {str(e)[:160]}", flush=True)

    def make_gather(k):
        @jax.jit
        def f(ut):
            idx = ut.astype(jnp.int32) * 257
            out = None
            for _ in range(k):
                out = jnp.take(flat_t, idx & 65535)
                idx = idx + out.astype(jnp.int32)   # data-dependent chain
            return out
        return f

    def make_mask(k):
        @jax.jit
        def f(ut):
            x = ut.astype(jnp.uint32)
            valid = jnp.arange(x.shape[0])[:, None] < nvd[None, :]
            for _ in range(k):
                x = jnp.where(valid, x + jnp.uint32(1), jnp.uint32(0))
            return x
        return f

    def make_shift(k):
        @jax.jit
        def f(ut):
            x = ut.astype(jnp.int32)
            for _ in range(k):
                x = jnp.concatenate(
                    [jnp.zeros((1, x.shape[1]), jnp.int32), x[:-1]],
                    axis=0) + 1
            return x
        return f

    def make_full(k):
        @jax.jit
        def f(ut):
            x = ut.astype(jnp.int32)
            out = None
            for _ in range(k):
                prev = jnp.concatenate(
                    [jnp.zeros((1, x.shape[1]), jnp.int32), x[:-1]],
                    axis=0)
                out = jnp.take(flat_t, prev * 256 + (x & 255))
                valid = jnp.arange(x.shape[0])[:, None] < nvd[None, :]
                out = jnp.where(valid, out, jnp.uint32(0))
                x = x + out.astype(jnp.int32)
            return out
        return f

    src_sm = utd if utd is not None else jnp.asarray(
        np.ascontiguousarray(np.asarray(ud).T))
    src_um = ud
    bench_pair("gather_sm", make_gather, src_sm)
    bench_pair("gather_um", make_gather, src_um)
    bench_pair("mask_sm", make_mask, src_sm)
    bench_pair("shift_sm", make_shift, src_sm)
    bench_pair("full_lookup_sm", make_full, src_sm)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
