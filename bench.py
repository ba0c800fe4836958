"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json:2, config :9): aggregate encode+decode
throughput of the Markov-Huffman codec on a 100 MB mixed text+binary
corpus with 64 KB blocks on one chip, with a bit-exact roundtrip and
compressed size <= the C++ reference oracle.

The headline is measured DEVICE-RESIDENT (mhc_tpu/engine.py): input
blocks, payload, and output in HBM, host traffic limited to the table
header + unit index — the apples-to-apples comparison against the C++
oracle, whose input/output are likewise RAM-resident. This dev
environment reaches the chip through a ~20-45 MB/s relay, so
end-to-end container wall time is link-bound, not chip-bound; the e2e
numbers are reported alongside (e2e_* fields) so both rates are on
record (VERDICT round 1, item 2).

vs_baseline: device-resident aggregate GB/s divided by the C++ oracle's
single-core aggregate GB/s on the identical corpus (the reference is
single-threaded and bit-serial — SURVEY.md §6; oracle measured fresh on
this machine).

Env knobs: MHC_BENCH_MB (default 100), MHC_BENCH_MODE (markov),
MHC_BENCH_REPS (2), MHC_BENCH_E2E=0 to skip the link-bound e2e pass.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def make_corpus(n_bytes: int, seed: int = 42) -> bytes:
    """Deterministic mixed corpus: structured binary + markov-ish text +
    incompressible noise, mirroring BASELINE.json:9 'mixed text+binary'."""
    rng = np.random.default_rng(seed)
    parts = []
    words = [b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy",
             b"dog", b"compression", b"entropy", b"huffman", b"markov",
             b"context", b"canonical", b"of", b"and", b"a", b"in", b"to"]
    while sum(map(len, parts)) < n_bytes:
        kind = rng.integers(0, 4)
        if kind == 0:  # text run
            chunk = bytearray()
            while len(chunk) < 1 << 16:
                chunk += words[rng.integers(len(words))]
                chunk += b" " if rng.random() < 0.85 else b".\n"
            parts.append(bytes(chunk))
        elif kind == 1:  # structured binary (counters)
            base = int(rng.integers(0, 1 << 24))
            parts.append(np.arange(base, base + (1 << 14), dtype="<u4").tobytes())
        elif kind == 2:  # repetitive
            parts.append(bytes(rng.integers(0, 256, 64, dtype=np.uint8)) * 1024)
        else:  # noise
            parts.append(rng.integers(0, 256, 1 << 16, dtype=np.uint8).tobytes())
    return b"".join(parts)[:n_bytes]


def oracle_baseline(corpus_path: str, mode: str) -> dict | None:
    exe = os.path.join(REPO, "oracle", "mh_oracle")
    if not os.path.exists(exe):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "oracle")],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(exe):
            return None
    mode_arg = "em" if mode == "markov" else "e0"
    r = subprocess.run([exe, "bench", mode_arg, corpus_path],
                       capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        return None
    return json.loads(r.stdout.strip())


def main() -> int:
    n_mb = int(os.environ.get("MHC_BENCH_MB", "100"))
    mode = os.environ.get("MHC_BENCH_MODE", "markov")
    reps = int(os.environ.get("MHC_BENCH_REPS", "2"))
    n_bytes = n_mb << 20

    corpus_path = f"/tmp/mhc_bench_corpus_{n_mb}mb.bin"
    if not (os.path.exists(corpus_path)
            and os.path.getsize(corpus_path) == n_bytes):
        data = make_corpus(n_bytes)
        with open(corpus_path, "wb") as f:
            f.write(data)
    else:
        data = open(corpus_path, "rb").read()

    import zlib

    from mhc_tpu import api, engine

    # --- device-resident codec rate (headline) -----------------------
    st = engine.stage(data, mode=mode)           # h2d staging, untimed
    enc = engine.encode(st)                      # warm-up compiles
    outs = engine.decode(enc)
    assert engine.fetch_bytes(enc, outs) == data, "roundtrip mismatch"
    blob = engine.assemble_container(enc, zlib.crc32(data) & 0xFFFFFFFF)
    del outs

    # block_until_ready can return EARLY for warm Mosaic dispatches on
    # the axon relay (CLAUDE.md traps) — force a host scalar that
    # depends on every timed device result
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _sample_sum(arrs):
        tot = jnp.zeros((), jnp.int32)
        for x in arrs:
            tot += jnp.sum(x.reshape(-1)[:: max(x.size // 4096, 1)]
                           .astype(jnp.int32))
        return tot

    def _force(arrs):
        # ONE host-scalar fetch covering every chunk array: the per-array
        # form paid a full relay round-trip (~26 ms measured round 4)
        # PER CHUNK — pure dispatch latency, not codec work (sub-ms on
        # directly-attached hardware). One fused fetch still forces
        # every timed device result.
        arrs = [x for x in arrs if isinstance(x, jax.Array) and x.size]
        if arrs:
            int(_sample_sum(arrs))

    enc_t, dec_t = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        enc = engine.encode(st)
        _force(enc.payload)
        enc_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        outs = engine.decode(enc)
        _force(outs)
        dec_t.append(time.perf_counter() - t0)
        del outs
    enc_s = min(enc_t)
    dec_s = min(dec_t)
    agg_gbps = 2 * n_bytes / (enc_s + dec_s) / 1e9

    # --- e2e container path (host bytes -> container -> host bytes;
    # link-bound on this dev relay) ------------------------------------
    e2e = {}
    if os.environ.get("MHC_BENCH_E2E", "1") != "0":
        api.decompress(api.compress(data, mode=mode))  # warm-up
        t0 = time.perf_counter()
        blob2 = api.compress(data, mode=mode)
        e2e_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = api.decompress(blob2)
        e2e_dec = time.perf_counter() - t0
        assert out == data, "e2e roundtrip mismatch"
        assert blob2 == blob, "engine/container mismatch"
        e2e = {
            "e2e_agg_GBps": round(2 * n_bytes / (e2e_enc + e2e_dec) / 1e9, 4),
            "e2e_encode_GBps": round(n_bytes / e2e_enc / 1e9, 4),
            "e2e_decode_GBps": round(n_bytes / e2e_dec / 1e9, 4),
        }

    base = oracle_baseline(corpus_path, mode)
    if base is not None:
        base_agg = 2 * n_bytes / (base["encode_s"] + base["decode_s"]) / 1e9
        vs = agg_gbps / base_agg
        ratio_vs_ref = len(blob) / base["compressed_bytes"]
    else:
        base_agg = None
        vs = None
        ratio_vs_ref = None

    print(json.dumps({
        "metric": f"device-resident encode+decode aggregate GB/s/chip "
                  f"({mode}, {n_mb}MB, 64KB blocks)",
        "value": round(agg_gbps, 4),
        "unit": "GB/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
        "encode_GBps": round(n_bytes / enc_s / 1e9, 4),
        "decode_GBps": round(n_bytes / dec_s / 1e9, 4),
        "ratio": round(len(blob) / n_bytes, 6),
        "ratio_vs_reference": round(ratio_vs_ref, 6) if ratio_vs_ref else None,
        "oracle_agg_GBps": round(base_agg, 4) if base_agg else None,
        **e2e,
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
