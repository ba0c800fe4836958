"""TPU shakeout: compile-check and time every device path at bench scale.

Run on the real chip after any kernel change:
    python bench/tpu_shakeout.py [MB]

For each stage it reports cold (compile) and warm times, catching
per-stage failures so one broken kernel doesn't block the rest. Ends
with a JSON summary to guide default selection (hist method, decode
method, fetch_impl).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def timed(fn, sync=lambda r: r):
    t0 = time.perf_counter()
    r = fn()
    import jax
    jax.block_until_ready(sync(r))
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = fn()
    jax.block_until_ready(sync(r))
    warm = time.perf_counter() - t0
    return r, cold, warm


def main() -> int:
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import api
    from mhc_tpu.ops import bitpack, canonical, histogram, huffman

    results: dict = {"platform": jax.default_backend(),
                     "device": str(jax.devices()[0]), "mb": n_mb}

    data = bench_mod.make_corpus(n_mb << 20)
    du = 2048
    units, nv = api.blockify(data, du)
    units_d = jnp.asarray(units)
    nv_d = jnp.asarray(nv)
    R = units.shape[0]
    print(f"[shakeout] {n_mb}MB, {R} units of {du}B on "
          f"{results['device']}", flush=True)

    def stage(name, fn, sync=lambda r: r):
        try:
            r, cold, warm = timed(fn, sync)
            gbps = (n_mb << 20) / warm / 1e9
            results[name] = {"cold_s": round(cold, 3),
                             "warm_s": round(warm, 4),
                             "GBps": round(gbps, 3)}
            print(f"[shakeout] {name}: cold {cold:.1f}s warm {warm:.4f}s "
                  f"({gbps:.2f} GB/s)", flush=True)
            return r
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(f"[shakeout] {name} FAILED: {e}", flush=True)
            traceback.print_exc()
            return None

    # --- histograms ---
    h_mm = stage("hist_matmul",
                 lambda: histogram.histogram_markov(units_d, nv_d,
                                                    method="matmul"))
    h_pl = stage("hist_pallas",
                 lambda: histogram.histogram_markov(units_d, nv_d,
                                                    method="pallas"))
    if h_mm is not None and h_pl is not None:
        same = bool((np.asarray(h_mm) == np.asarray(h_pl)).all())
        results["hist_pallas_correct"] = same
        print(f"[shakeout] hist pallas == matmul: {same}", flush=True)
    counts = h_mm if h_mm is not None else h_pl

    # --- tables ---
    scaled = huffman.rescale_counts(np.asarray(counts))
    lens = stage("code_lengths",
                 lambda: huffman.code_lengths(jnp.asarray(scaled)))
    tabs = stage("canonical", lambda: canonical.canonical_codes(lens),
                 sync=lambda t: t["codes"])

    # --- encode pack ---
    enc = stage("encode_merge",
                lambda: bitpack.encode_blocks_merge(
                    units_d, nv_d, tabs["codes"], tabs["lengths"]),
                sync=lambda r: r[0])
    if enc is None:
        return 1
    words, bits = enc

    # --- decoders ---
    d_scan = stage("decode_scan",
                   lambda: bitpack.decode_blocks(
                       words, nv_d, tabs["lim"], tabs["base"],
                       tabs["first_code"], tabs["sorted_syms"],
                       n_out=du, markov=True))
    from mhc_tpu.ops.kernels import decode_pallas as dp
    wordsq = jnp.asarray(np.asarray(words))
    d_chunk = stage("decode_pallas_chunk",
                    lambda: dp.decode_blocks_pallas(
                        wordsq, tabs["lim"], tabs["base"],
                        tabs["first_code"], tabs["sorted_syms"],
                        n_out=du, markov=True, fetch_impl="chunk"))
    d_mxu = stage("decode_pallas_mxu",
                  lambda: dp.decode_blocks_pallas(
                      wordsq, tabs["lim"], tabs["base"],
                      tabs["first_code"], tabs["sorted_syms"],
                      n_out=du, markov=True, fetch_impl="mxu"))

    want = units
    for name, out in (("scan", d_scan), ("pallas_chunk", d_chunk),
                      ("pallas_mxu", d_mxu)):
        if out is None:
            continue
        got = np.asarray(out)
        mask = np.arange(du)[None, :] < nv[:, None]
        ok = bool((np.where(mask, got, 0) == np.where(mask, want, 0)).all())
        results[f"decode_{name}_correct"] = ok
        print(f"[shakeout] decode {name} correct: {ok}", flush=True)

    # --- end-to-end API ---
    try:
        t0 = time.perf_counter()
        blob = api.compress(data, mode="markov")
        enc_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = api.decompress(blob)
        dec_s = time.perf_counter() - t0
        assert out == data
        results["e2e"] = {"encode_s": round(enc_s, 3),
                          "decode_s": round(dec_s, 3),
                          "ratio": round(len(blob) / len(data), 5)}
        print(f"[shakeout] e2e: enc {enc_s:.2f}s dec {dec_s:.2f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        results["e2e"] = {"error": str(e)[:200]}

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
