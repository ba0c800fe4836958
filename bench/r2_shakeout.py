"""Round-2 single-session TPU shakeout: validate + time every new
variant (fused pack->payload, scan-slice expand/compact, lane-tiled
decode kernel) against the round-1 implementations, in ONE process so
one relay session covers everything.

    python bench/r2_shakeout.py [MB]
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

    from mhc_tpu import api, engine
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops import bitpack
    from mhc_tpu.ops.kernels import decode_pallas

    n_bytes = n_mb << 20
    data = bench_mod.make_corpus(n_bytes)
    model = get_model("markov")
    results: dict = {"mb": n_mb, "device": str(jax.devices()[0])}

    def t(name, fn, reps=2):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 4)
        print(f"[r2] {name}: {best:.4f}s ({n_bytes / best / 1e9:.3f} GB/s)",
              flush=True)

    st = engine.stage(data, mode="markov")
    print(f"[r2] staged {n_mb}MB du={st.decode_unit} chunk={st.chunk} "
          f"x{len(st.units)}", flush=True)

    # --- encode: fused (new default) vs two-step merge reference
    enc = engine.encode(st)                       # fused pallas payload
    enc_ref = engine.encode(st, pack_method="merge")
    assert (enc.bit_lens == enc_ref.bit_lens).all(), "bit_lens mismatch"
    p_new = engine.fetch_payload(enc)
    p_ref = engine.fetch_payload(enc_ref)
    assert p_new == p_ref, "fused payload differs from two-step"
    print("[r2] fused payload BIT-IDENTICAL to two-step", flush=True)
    t("ENCODE_fused", lambda: engine.encode(st))

    # --- expand variants
    C = enc.chunk
    W_worst = bitpack.words_for_block(st.decode_unit)
    max_wl = -(-int(enc.byte_lens.max()) // 4)
    W = min(W_worst, max(-(-(max_wl + 1) // 128) * 128, 128))
    results["W"] = W

    def run_expand(impl):
        outs = []
        for k, payload_d in enumerate(enc.payload):
            lo = k * C
            hi = min(lo + C, enc.n_units)
            wl = api._pad_rows(
                (enc.byte_lens[lo:hi] // 4).astype(np.int32), C)
            offsets = np.zeros(C + 1, np.int32)
            np.cumsum(wl, out=offsets[1:])
            outs.append(impl(payload_d, jnp.asarray(offsets),
                             jnp.asarray(wl), W))
        return outs

    wg = run_expand(bitpack.device_expand_words_u32)
    ws = run_expand(bitpack.device_expand_words_slices)
    assert all((np.asarray(a) == np.asarray(b)).all()
               for a, b in zip(wg, ws)), "expand mismatch"
    print("[r2] slice expand BIT-IDENTICAL to gather expand", flush=True)
    t("expand_gather", lambda: run_expand(bitpack.device_expand_words_u32))
    t("expand_slices",
      lambda: run_expand(bitpack.device_expand_words_slices))

    # --- decode kernel lane tiling
    tables = model.tables_from_lengths(jnp.asarray(enc.lengths, jnp.int32))
    words_chunks = run_expand(bitpack.device_expand_words_u32)
    jax.block_until_ready(words_chunks)

    def run_decode(lt, fetch="mxu2"):
        return [decode_pallas.decode_blocks_pallas(
            w, tables["lim"], tables["base"], tables["first_code"],
            tables["sorted_syms"], n_out=st.decode_unit, markov=True,
            fetch_impl=fetch, lane_tiles=lt) for w in words_chunks]

    d1 = run_decode(1)
    d2 = run_decode(2)
    assert all((np.asarray(a) == np.asarray(b)).all()
               for a, b in zip(d1, d2)), "lane-tiled decode mismatch"
    print("[r2] lane-tiled decode BIT-IDENTICAL to lt=1", flush=True)
    t("decode_mxu2_lt1", lambda: run_decode(1))
    t("decode_mxu2_lt2", lambda: run_decode(2))

    t("DECODE_total", lambda: engine.decode(enc))
    outs = engine.decode(enc)
    ok = engine.fetch_bytes(enc, outs) == data
    results["roundtrip_ok"] = bool(ok)
    print(f"[r2] roundtrip ok: {ok}", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
