"""Decode-kernel variant matrix on the real chip.

    python bench/decode_matrix.py [MB]

Times decode_blocks_pallas across (fetch_impl, refill, markov,
out_chunk, raw_out) variants on identical device-resident words, to
locate the per-iteration cost floor (round-3 finding: mxu2 vs mxu3 vs
chunk and scan vs group all land within ~10% — something fixed
dominates). raw_out=True skips the XLA output unpack so kernel time is
isolated from the transpose. One JSON line at the end.
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
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import api, engine
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops import bitpack
    from mhc_tpu.ops.kernels import decode_pallas

    n_bytes = n_mb << 20
    cache = f"/tmp/mhc_words_{n_mb}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        words_h, lengths, du = z["words"], z["lengths"], int(z["du"])
        print(f"[matrix] loaded cached words {words_h.shape}", flush=True)
    else:
        data = bench_mod.make_corpus(n_bytes)
        st = engine.stage(data, mode="markov")
        du = st.decode_unit
        enc = engine.encode(st)
        lengths = enc.lengths
        W_worst = bitpack.words_for_block(du)
        max_wl = int(enc.byte_lens.max()) // 4
        W = min(W_worst, max(-(-(max_wl + 1) // 128) * 128, 128))
        C = enc.chunk
        chunks = []
        for k, payload_d in enumerate(enc.payload):
            lo = k * C
            hi = min(lo + C, enc.n_units)
            wl = api._pad_rows(
                (enc.byte_lens[lo:hi] // 4).astype(np.int32), C)
            offsets = np.zeros(C + 1, np.int32)
            np.cumsum(wl, out=offsets[1:])
            chunks.append(np.asarray(bitpack.device_expand_words_u32(
                payload_d, jnp.asarray(offsets), jnp.asarray(wl), W)))
        words_h = np.concatenate(chunks, axis=0)
        np.savez(cache, words=words_h, lengths=lengths, du=du)
        print(f"[matrix] built+cached words {words_h.shape}", flush=True)

    model = get_model("markov")
    tables = model.tables_from_lengths(jnp.asarray(lengths, jnp.int32))
    words_d = jax.device_put(words_h)
    jax.block_until_ready(words_d)
    R, W = words_h.shape
    res = {"mb": n_mb, "W": W, "du": du, "R": R,
           "platform": jax.default_backend()}
    iters = R * du / 2  # total kernel iterations (2 sym each)

    def timed(name, **kw):
        try:
            def run():
                out = decode_pallas.decode_blocks_pallas(
                    words_d, tables["lim"], tables["base"],
                    tables["first_code"], tables["sorted_syms"],
                    n_out=du, **kw)
                # host-fetch a scalar that depends on every output chunk:
                # block_until_ready alone was observed returning early
                # for warm Mosaic dispatches through the axon relay
                return int(jnp.sum(out[..., ::257].astype(jnp.int32)))
            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            lt = kw.get("lane_tiles") or 1
            us_iter = best / (iters / (lt if R >= 1024 * lt else 1)) * 1e6
            res[name] = {"warm_s": round(best, 4),
                         "GBps": round(n_bytes / best / 1e9, 4),
                         "us_per_iter_x_tiles": round(
                             best * 1e6 / (R * du / 2 / 1024), 3)}
            print(f"[matrix] {name}: {best:.4f}s "
                  f"({n_bytes / best / 1e9:.3f} GB/s) compile {comp:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
            print(f"[matrix] {name} FAILED: {e}", flush=True)

    timed("null_none_raw", markov=True, fetch_impl="null",
          refill="none", raw_out=True)
    timed("null_group_raw", markov=True, fetch_impl="null",
          refill="group", raw_out=True)
    timed("order0_group_raw", markov=False, fetch_impl="mxu2",
          refill="group", raw_out=True)
    timed("mxu2_group_raw", markov=True, fetch_impl="mxu2",
          refill="group", raw_out=True)
    timed("mxu2_scan_raw", markov=True, fetch_impl="mxu2",
          refill="scan", raw_out=True)
    timed("mxu4_group_raw", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=True)
    timed("mxu4_group_full", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=False)
    timed("mxu4_group_raw_u16", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=True, unroll=16)
    timed("mxu5_group_raw", markov=True, fetch_impl="mxu5",
          refill="group", raw_out=True)
    timed("mxu5_group_raw_u16", markov=True, fetch_impl="mxu5",
          refill="group", raw_out=True, unroll=16)
    timed("mxu6_group_raw", markov=True, fetch_impl="mxu6",
          refill="group", raw_out=True)
    timed("mxu4_chains2_raw", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=True, chains=2)
    timed("mxu6_chains2_raw", markov=True, fetch_impl="mxu6",
          refill="group", raw_out=True, chains=2)
    timed("mxu4_chains4_raw", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=True, chains=4)
    timed("mxu6_chains2_full", markov=True, fetch_impl="mxu6",
          refill="group", raw_out=False, chains=2)
    timed("mxu4_oc1024_raw", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=True, out_chunk=1024)
    timed("mxu4_oc2048_raw", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=True, out_chunk=2048)
    timed("mxu4_u4_raw", markov=True, fetch_impl="mxu4",
          refill="group", raw_out=True, unroll=4)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
