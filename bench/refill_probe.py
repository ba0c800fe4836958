"""On-chip A/B of the decode kernel word-refill implementations.

    python bench/refill_probe.py [MB] [fetch_impl]

Encodes a real corpus with the engine, expands the payload to the
shipping stream shapes, then times decode_blocks_pallas with
refill=scan (round-2 O(W) stream re-scan) vs refill=group (round-3
windowed refill), asserting identical outputs. One JSON line.
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
    fetch = sys.argv[2] if len(sys.argv) > 2 else "mxu2"
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import api, engine
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops import bitpack
    from mhc_tpu.ops.kernels import decode_pallas

    n_bytes = n_mb << 20
    data = bench_mod.make_corpus(n_bytes)
    model = get_model("markov")
    st = engine.stage(data, mode="markov")
    du = st.decode_unit
    enc = engine.encode(st)
    counts = None
    lengths = enc.lengths
    tables = model.tables_from_lengths(lengths)
    W_worst = bitpack.words_for_block(du)
    max_wl = int(enc.byte_lens.max()) // 4
    W = min(W_worst, max(-(-(max_wl + 1) // 128) * 128, 128))
    C = enc.chunk
    words_chunks = []
    for k, payload_d in enumerate(enc.payload):
        lo = k * C
        hi = min(lo + C, enc.n_units)
        wl = api._pad_rows(
            (enc.byte_lens[lo:hi] // 4).astype(np.int32), C)
        offsets = np.zeros(C + 1, np.int32)
        np.cumsum(wl, out=offsets[1:])
        words_chunks.append(bitpack.device_expand_words_u32(
            payload_d, jnp.asarray(offsets), jnp.asarray(wl), W))
    jax.block_until_ready(words_chunks)
    res = {"mb": n_mb, "W": W, "du": du, "fetch": fetch,
           "platform": jax.default_backend()}
    outs = {}
    for refill in ("scan", "group"):
        def run():
            return [decode_pallas.decode_blocks_pallas(
                w, tables["lim"], tables["base"], tables["first_code"],
                tables["sorted_syms"], n_out=du, markov=True,
                fetch_impl=fetch, refill=refill) for w in words_chunks]
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        res[f"compile+run_{refill}_s"] = round(time.perf_counter() - t0, 3)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = run()
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        outs[refill] = o
        res[refill] = {"warm_s": round(best, 4),
                       "GBps": round(n_bytes / best / 1e9, 4)}
        print(f"[refill] {refill}: {best:.4f}s "
              f"({n_bytes / best / 1e9:.3f} GB/s)", flush=True)
    same = all(bool(jnp.array_equal(a, b))
               for a, b in zip(outs["scan"], outs["group"]))
    res["identical"] = same
    print(json.dumps(res), flush=True)
    return 0 if same else 1


if __name__ == "__main__":
    sys.exit(main())
