"""Decode-kernel lane-width scaling probe (round 5).

    python bench/decode_width_probe.py [MB]

Round-4 found per-step cost scales SUBLINEARLY with lane width, but the
whole round-4 matrix actually ran at 2048 lanes: at the bench stream
width (W=2304 words for the 32 MB mixed corpus) vmem_bytes rejects
lane_tiles=4. This probe patches the VMEM budget (compile failures are
clean on this Mosaic — round-4 finding) and measures the SAME corpus at
lane widths 1024..8192, plus smaller decode units (4096/2048) whose
narrower stream buffers let 8192-lane tiles fit. One JSON line.

Timing is single-dispatch with a forced host checksum; subtract the
~26 ms relay floor (RESULTS.md round 4) when comparing absolutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def build_words(n_mb: int, du: int):
    cache = f"/tmp/mhc_words_{n_mb}_du{du}.npz"
    if du == 8192:
        legacy = f"/tmp/mhc_words_{n_mb}.npz"
        if os.path.exists(legacy):
            cache = legacy
    if os.path.exists(cache):
        z = np.load(cache)
        return z["words"], z["lengths"]
    import bench as bench_mod
    import jax.numpy as jnp
    from mhc_tpu import api, engine
    from mhc_tpu.ops import bitpack

    data = bench_mod.make_corpus(n_mb << 20)
    st = engine.stage(data, mode="markov", decode_unit=du)
    enc = engine.encode(st)
    W_worst = bitpack.words_for_block(du)
    max_wl = int(enc.byte_lens.max()) // 4
    W = min(W_worst, max(-(-(max_wl + 1) // 128) * 128, 128))
    C = enc.chunk
    chunks = []
    for k, payload_d in enumerate(enc.payload):
        lo = k * C
        hi = min(lo + C, enc.n_units)
        wl = api._pad_rows((enc.byte_lens[lo:hi] // 4).astype(np.int32), C)
        offsets = np.zeros(C + 1, np.int32)
        np.cumsum(wl, out=offsets[1:])
        chunks.append(np.asarray(bitpack.device_expand_words_u32(
            payload_d, jnp.asarray(offsets), jnp.asarray(wl), W)))
    words = np.concatenate(chunks, axis=0)[: enc.n_units]
    np.savez(cache, words=words, lengths=enc.lengths, du=du)
    return words, enc.lengths


def main() -> int:
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import jax
    import jax.numpy as jnp
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops.kernels import decode_pallas

    decode_pallas.VMEM_BUDGET = 256 << 20      # probe past the gate
    n_bytes = n_mb << 20
    model = get_model("markov")
    res = {"mb": n_mb, "platform": jax.default_backend()}

    def timed(name, words_h, lengths, du, lt, **kw):
        tables = model.tables_from_lengths(jnp.asarray(lengths, jnp.int32))
        words_d = jax.device_put(words_h)
        jax.block_until_ready(words_d)
        try:
            def run():
                out = decode_pallas.decode_blocks_pallas(
                    words_d, tables["lim"], tables["base"],
                    tables["first_code"], tables["sorted_syms"],
                    n_out=du, markov=True, fetch_impl="mxu4",
                    refill="group", raw_out=True, lane_tiles=lt, **kw)
                return int(jnp.sum(out[..., ::257].astype(jnp.int32)))
            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            res[name] = {"warm_s": round(best, 4), "W": int(words_h.shape[1]),
                         "GBps": round(n_bytes / best / 1e9, 4),
                         "GBps_nofloor": round(
                             n_bytes / max(best - 0.026, 1e-6) / 1e9, 4)}
            print(f"[width] {name}: {best:.4f}s ({n_bytes / best / 1e9:.3f}"
                  f" GB/s; {n_bytes / max(best - 0.026, 1e-6) / 1e9:.3f} "
                  f"floor-corrected) compile {comp:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            res[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"[width] {name} FAILED: {str(e)[:200]}", flush=True)

    w8, l8 = build_words(n_mb, 8192)
    print(f"[width] du=8192 words {w8.shape}", flush=True)
    for lt in (1, 2, 4):
        timed(f"du8192_lt{lt}", w8, l8, 8192, lt)
    w4, l4 = build_words(n_mb, 4096)
    print(f"[width] du=4096 words {w4.shape}", flush=True)
    for lt in (2, 4, 8):
        timed(f"du4096_lt{lt}", w4, l4, 4096, lt)
    w2, l2 = build_words(n_mb, 2048)
    print(f"[width] du=2048 words {w2.shape}", flush=True)
    for lt in (4, 8):
        timed(f"du2048_lt{lt}", w2, l2, 2048, lt)
    print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
