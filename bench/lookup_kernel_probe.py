"""Amortized (relay-floor-corrected) Pallas lookup-kernel shootout.

    python bench/lookup_kernel_probe.py [MB]

Chains K data-dependent kernel invocations in one jit and reports the
marginal cost per invocation (round-4 methodology — single-dispatch
timings carry a ~26 ms relay floor). Sweeps UNROLL and compares the
XLA gather form. One JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

K = 5


def main() -> int:
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import api, engine
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops.kernels import lookup_pallas

    data = bench_mod.make_corpus(n_mb << 20)
    model = get_model("markov")
    st = engine.stage(data, mode="markov", chunk_units=None)
    counts = engine.histogram(st)
    tables = model.tables_from_lengths(model.lengths_from_counts(counts))
    jax.block_until_ready(tables["lim"])
    ud, nvd = st.units[0], st.n_valid[0]
    ut = st.units_sm[0] if st.units_sm else jnp.asarray(
        np.ascontiguousarray(np.asarray(ud).T))
    R, n = ud.shape
    chunk_bytes = R * n
    res = {"mb": n_mb, "k": K, "platform": jax.default_backend()}

    def bench_pair(name, apply):
        def make(k):
            @jax.jit
            def f(u):
                out = None
                for _ in range(k):
                    out = apply(u)
                    # next input derives from the output: data-dependent
                    u = ((out.astype(jnp.int32) + u.astype(jnp.int32))
                         & 255).astype(jnp.uint8)
                return out
            return f
        try:
            f1, fk = make(1), make(K)
            for f in (f1, fk):
                int(jnp.sum(f(ut).reshape(-1)[::65537].astype(jnp.int32)))
            ts = []
            for f in (f1, fk):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(jnp.sum(f(ut).reshape(-1)[::65537]
                                .astype(jnp.int32)))
                    best = min(best, time.perf_counter() - t0)
                ts.append(best)
            marg = (ts[1] - ts[0]) / (K - 1)
            res[name] = {"t1_s": round(ts[0], 5),
                         "marginal_s": round(marg, 5),
                         "GBps": round(chunk_bytes / max(marg, 1e-9)
                                       / 1e9, 3)}
            print(f"[lkp] {name}: marginal {marg * 1e3:.1f} ms "
                  f"({chunk_bytes / max(marg, 1e-9) / 1e9:.3f} GB/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
            print(f"[lkp] {name} FAILED: {str(e)[:160]}", flush=True)

    for u in (4, 8, 16):
        bench_pair(f"pallas_u{u}", lambda x, u=u:
                   lookup_pallas.lookup_cl_sm_pallas(x, nvd, tables,
                                                     unroll=u))
    for u in (4, 8):
        bench_pair(f"pallas_bf16_u{u}", lambda x, u=u:
                   lookup_pallas.lookup_cl_sm_pallas(x, nvd, tables,
                                                     unroll=u,
                                                     variant="bf16"))
    for u in (4, 8):
        bench_pair(f"pallas_w3_u{u}", lambda x, u=u:
                   lookup_pallas.lookup_cl_sm_pallas(x, nvd, tables,
                                                     unroll=u,
                                                     variant="w3"))
    for u in (4, 8, 16):
        bench_pair(f"pallas_rank_u{u}", lambda x, u=u:
                   lookup_pallas.lookup_cl_sm_pallas(x, nvd, tables,
                                                     unroll=u,
                                                     variant="rank"))
    for u in (8, 16):
        bench_pair(f"pallas_rankbf_u{u}", lambda x, u=u:
                   lookup_pallas.lookup_cl_sm_pallas(x, nvd, tables,
                                                     unroll=u,
                                                     variant="rankbf"))
    for v in ("rank", "rankbf"):
        a0 = np.asarray(lookup_pallas.lookup_cl_sm_pallas(ut, nvd,
                                                          tables))
        cv = np.asarray(lookup_pallas.lookup_cl_sm_pallas(
            ut, nvd, tables, variant=v))
        res[f"{v}_exact"] = bool((a0 == cv).all())
        print(f"[lkp] {v} exact: {res[f'{v}_exact']}", flush=True)
    c = np.asarray(lookup_pallas.lookup_cl_sm_pallas(ut, nvd, tables,
                                                     variant="w3"))
    a0 = np.asarray(lookup_pallas.lookup_cl_sm_pallas(ut, nvd, tables))
    res["w3_exact"] = bool((a0 == c).all())
    print(f"[lkp] w3 exact: {res['w3_exact']}", flush=True)
    # exactness: bf16 variant vs int8 on real data
    a = np.asarray(lookup_pallas.lookup_cl_sm_pallas(ut, nvd, tables))
    b = np.asarray(lookup_pallas.lookup_cl_sm_pallas(ut, nvd, tables,
                                                     variant="bf16"))
    res["bf16_exact"] = bool((a == b).all())
    print(f"[lkp] bf16 exact: {res['bf16_exact']}", flush=True)
    bench_pair("xla_gather_sm", lambda x:
               api.lookup_cl_sm(x, nvd, tables))
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
