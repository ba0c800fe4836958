"""Per-stage timing of the device-resident engine path at bench config.

    python bench/stages.py [MB] [mode]

Times every stage of engine.encode/decode (the bench headline path) at
the shipping chunk shapes, plus method variants, and prints one JSON
line. This is the committed evidence separating on-chip rate from
relay-link cost (VERDICT round 1, item 2).
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
    mode = sys.argv[2] if len(sys.argv) > 2 else "markov"
    import bench as bench_mod
    import jax
    import jax.numpy as jnp

    from mhc_tpu import api, engine
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops import bitpack

    n_bytes = n_mb << 20
    data = bench_mod.make_corpus(n_bytes)
    model = get_model(mode)
    st = engine.stage(data, mode=mode)
    du = st.decode_unit
    results: dict = {"platform": jax.default_backend(),
                     "device": str(jax.devices()[0]), "mb": n_mb,
                     "mode": mode, "decode_unit": du,
                     "chunk_units": st.chunk,
                     "n_chunks": len(st.units)}
    print(f"[stages] {n_mb}MB {mode}, du={du}, "
          f"{len(st.units)} chunks x {st.chunk} units", flush=True)

    @jax.jit
    def _sample_sum(arrs):
        tot = jnp.zeros((), jnp.int32)
        for x in arrs:
            tot += jnp.sum(x.reshape(-1)[:: max(x.size // 4096, 1)]
                           .astype(jnp.int32))
        return tot

    def _force(out):
        # block_until_ready returns early for warm Mosaic dispatches —
        # force ONE host scalar covering every jax leaf (per-leaf
        # fetches paid a ~26 ms relay round-trip EACH, round-4 finding;
        # every single-dispatch stage row still carries one such floor)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if isinstance(x, jax.Array) and x.size]
        if leaves:
            int(_sample_sum(leaves))

    def stage(name, fn, reps=2):
        try:
            _force(fn())  # compile
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _force(fn())
                best = min(best, time.perf_counter() - t0)
            gbps = n_bytes / best / 1e9
            results[name] = {"warm_s": round(best, 4),
                             "GBps": round(gbps, 3)}
            print(f"[stages] {name}: {best:.4f}s ({gbps:.2f} GB/s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(f"[stages] {name} FAILED: {e}", flush=True)

    hist_method = api._default_hist_method()

    def run_hist(method):
        out = None
        for ud, nvd in zip(st.units, st.n_valid):
            c = model.histogram(ud, nvd, method=method)
            out = c if out is None else out + c
        return out

    stage("hist_" + hist_method, lambda: run_hist(hist_method))
    if jax.default_backend() == "tpu" and hist_method != "matmul":
        stage("hist_matmul", lambda: run_hist("matmul"))

    counts = np.asarray(run_hist(hist_method)).astype(np.int64)

    def table_build():
        return model.lengths_from_counts(counts)

    t0 = time.perf_counter()
    lengths = table_build()
    results["table_build_host_s"] = round(time.perf_counter() - t0, 4)
    tables = model.tables_from_lengths(lengths)
    jax.block_until_ready(tables["lim"])

    def run_lookup():
        return [api.lookup_codes(ud, nvd, tables)
                for ud, nvd in zip(st.units, st.n_valid)]

    stage("lookup_codes", run_lookup)
    stage("lookup_cl_t_gather", lambda: [
        api.lookup_cl_t(ud, nvd, tables)
        for ud, nvd in zip(st.units, st.n_valid)])
    if jax.default_backend() == "tpu":
        from mhc_tpu.ops.kernels import lookup_pallas
        stage("lookup_cl_t_pallas", lambda: [
            lookup_pallas.lookup_cl_t_pallas(ud, nvd, tables)
            for ud, nvd in zip(st.units, st.n_valid)])

    def run_pack(method):
        outs = []
        for ud, nvd in zip(st.units, st.n_valid):
            if method in ("pallas", "dense"):
                from mhc_tpu.ops.kernels import encode_pallas
                cl = api.lookup_cl_t(ud, nvd, tables)
                pk = (encode_pallas.pack_blocks_dense
                      if method == "dense"
                      else encode_pallas.pack_blocks_pallas)
                outs.append(pk(cl, step_major=True))
            else:
                enc = (bitpack.encode_blocks_merge if method == "merge"
                       else bitpack.encode_blocks)
                outs.append(enc(ud, nvd, tables["codes"],
                                tables["lengths"]))
        return outs

    stage("pack_merge(incl lookup)", lambda: run_pack("merge"))
    if jax.default_backend() == "tpu":
        stage("pack_dense(incl lookup)", lambda: run_pack("dense"))
        stage("pack_pallas(incl lookup)", lambda: run_pack("pallas"))

    packed = run_pack(api._default_pack_method())
    jax.block_until_ready([p[0] for p in packed])

    def run_compact():
        outs = []
        for words, bits in packed:
            bits_h = np.asarray(bits).astype(np.int64)
            word_lens = (bits_h + 31) // 32
            offsets = np.zeros(len(word_lens) + 1, np.int32)
            np.cumsum(word_lens, out=offsets[1:])
            pad_w = max(-(-int(offsets[-1]) // (1 << 18)) << 18, 1 << 18)
            outs.append(api._compact_words(
                words, jnp.asarray(offsets), pad_w))
        return outs

    stage("compact_payload", run_compact)

    enc = engine.encode(st)
    stage("ENCODE_total", lambda: engine.encode(st))

    W_worst = bitpack.words_for_block(du)
    max_wl = int(enc.byte_lens.max()) // 4
    W = min(W_worst, max(-(-(max_wl + 1) // 128) * 128, 128))
    results["W_stream"] = W

    def run_expand():
        outs = []
        C = enc.chunk
        for k, payload_d in enumerate(enc.payload):
            lo = k * C
            hi = min(lo + C, enc.n_units)
            wl = api._pad_rows(
                (enc.byte_lens[lo:hi] // 4).astype(np.int32), C)
            offsets = np.zeros(C + 1, np.int32)
            np.cumsum(wl, out=offsets[1:])
            outs.append(api._expand_words_u32(
                payload_d, jnp.asarray(offsets), jnp.asarray(wl), W))
        return outs

    stage("expand_words", run_expand)
    words_chunks = run_expand()
    jax.block_until_ready(words_chunks)

    def run_decode(method, fetch_impl="chunk"):
        outs = []
        for words_d in words_chunks:
            if method == "pallas":
                from mhc_tpu.ops.kernels import decode_pallas
                outs.append(decode_pallas.decode_blocks_pallas(
                    words_d, tables["lim"], tables["base"],
                    tables["first_code"], tables["sorted_syms"],
                    n_out=du, markov=model.markov, fetch_impl=fetch_impl))
            else:
                nv = jnp.full((words_d.shape[0],), du, jnp.int32)
                outs.append(bitpack.decode_blocks(
                    words_d, nv, tables["lim"], tables["base"],
                    tables["first_code"], tables["sorted_syms"],
                    n_out=du, markov=model.markov))
        return outs

    if jax.default_backend() == "tpu":
        stage("decode_pallas_mxu4", lambda: run_decode("pallas", "mxu4"))
        stage("decode_pallas_mxu6", lambda: run_decode("pallas", "mxu6"))
        stage("decode_pallas_mxu2", lambda: run_decode("pallas", "mxu2"))
    stage("decode_scan", lambda: run_decode("scan"))

    stage("DECODE_total", lambda: engine.decode(enc))

    outs = engine.decode(enc)
    ok = engine.fetch_bytes(enc, outs) == data
    results["roundtrip_ok"] = bool(ok)
    print(f"[stages] roundtrip ok: {ok}", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
