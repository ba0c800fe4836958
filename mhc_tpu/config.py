"""Central resolution of every performance env knob.

Round-2 review finding: defaults like MHC_FETCH_IMPL="mxu2" were
duplicated across api.py / engine.py / serve.py, so one drifting copy
could silently change the benched configuration. Every knob is resolved
HERE, once, by the drivers (api/engine/serve/pipeline) and passed down
as explicit static arguments — kernels never read os.environ at trace
time (ADVICE round 2: an env var read inside a jitted function freezes
at first trace).

Knob catalog (see CLAUDE.md):
  MHC_DECODE_METHOD  scan | pallas
  MHC_FETCH_IMPL     chunk | mxu | mxu2..mxu6 | sparse | slab
  MHC_REFILL         group | scan      (Pallas decode word refill)
  MHC_PACK_METHOD    dense | pallas | merge | scatter | fused
  MHC_LOOKUP         gather | mxu | pallas  (pallas = VMEM int8 MXU
                     row-fetch kernel, ops/kernels/lookup_pallas.py)
  MHC_HIST_METHOD    pallas | matmul | scatter
  MHC_HIST_VARIANT   v3 | v4b  (Pallas markov-hist kernel build)
  MHC_EXPAND_IMPL    slices | gather | blocks
  MHC_LANE_TILES     int cap on decode lane tiling (1/2/4)
  MHC_DECODE_CHAINS  interleaved lane-slice chains in the decode kernel
  MHC_DECODE_GRP     decode refill group words, 8..128 pow2 (IMPORT-time
                     knob in ops/kernels/decode_pallas.py — the only
                     exception to resolve-here; it sizes module consts)
  MHC_COMPACT_IMPL   slices | gather | blocks  (payload compaction)
  MHC_STAGE_SM       0 disables step-major host staging (api/engine)
  MHC_DEVICE_OFFSETS 0 disables device-side compaction offsets (engine)
  MHC_TABLE_BUILD    auto | host | device (engine.encode table build;
                     auto = on-chip below 8 MB to skip the counts-fetch
                     sync, host C++ builder above — read in engine.py /
                     models/entropy.py, bit-identical either way)
"""

from __future__ import annotations

import os

import jax


def _tpu() -> bool:
    return jax.default_backend() == "tpu"


def decode_method() -> str:
    return os.environ.get("MHC_DECODE_METHOD") or (
        "pallas" if _tpu() else "scan")


def fetch_impl() -> str:
    # mxu4: stacked bf16 one-hot fetch + direct f32 plane resolve —
    # fastest markov variant on v5e (bench/decode_matrix.py round 3:
    # 0.334 GB/s raw vs mxu2 0.292, mxu5 0.263, chunk ~0.08)
    return os.environ.get("MHC_FETCH_IMPL", "mxu4")


def refill_impl() -> str:
    # group: windowed refill — one O(W) stream pass per 64 symbols
    # instead of per 2 (round 3); scan is the round-2 legacy path
    return os.environ.get("MHC_REFILL", "group")


def pack_method() -> str:
    # dense | pallas | merge | scatter | fused.
    # fused (TPU default since round 5): lookup+pack in ONE Mosaic
    # program, no cl plane. It LOST by ~5% in round 4 against the
    # 768-row direct lookup; with the round-5 rank tables the fetch is
    # 2.4x lighter and fusion wins: 0.274 vs dense's 0.296 s per 32 MB
    # engine encode (chip-gated container-identical).
    # dense: in-kernel word-stream assembly (reverse group window) —
    # 2.1x the bubble+scatter pack on v5e, no compaction scatter.
    # pallas = bubble-stream legacy, merge/scatter = XLA packers.
    return os.environ.get("MHC_PACK_METHOD") or (
        "fused" if _tpu() else "merge")


def lookup_method() -> str:
    # pallas (VMEM-resident int8 MXU row-fetch kernel, round-4 default):
    # 95 ms vs the XLA flat gather's 145 ms MARGINAL per 16 MB on v5e
    # (bench/lookup_fuse_probe.py amortized methodology — the round-3
    # "gather at 0.49 GB/s" reading was the ~26 ms relay-floor artifact;
    # the true gather rate is 8.6 ns/lookup). Chip-gated bit-exact by
    # tests/test_tpu_chip.py::test_lookup_pallas_bit_exact.
    return os.environ.get("MHC_LOOKUP") or (
        "pallas" if _tpu() else "gather")


def lookup_variant() -> str:
    # Pallas lookup kernel table build:
    #   i8 / bf16 — direct (256, 768) cl plane stack, three 256-deep
    #     cur picks (round 4; i8 68.2 ms vs bf16 68.6 at 16 MB);
    #   w3 — weighted single-pick fold (75.8 ms, kept selectable);
    #   rank / rankbf — (256, 316) rank-table stack (round 5): 2.4x
    #     fewer MXU MACs, one 256-deep pick + in-register len/code.
    # rankbf default: 38.0 ms marginal per 16 MB on v5e vs i8's 67.0
    # (1.76x; bench/lookup_kernel_probe.py round 5), chip-exact vs the
    # XLA gather plane (tests/test_tpu_chip.py).
    return os.environ.get("MHC_LOOKUP_VARIANT", "rankbf")


def hist_method() -> str:
    # pallas v3 (VMEM int8 one-hot + MXU): 1.25x the XLA matmul on v5e
    # (139 vs 174 ms at 32 MB markov, round 3) and no HBM one-hot
    # materialization; scatter-add wins on CPU
    return os.environ.get("MHC_HIST_METHOD") or (
        "pallas" if _tpu() else "scatter")


def hist_variant() -> str:
    # Pallas markov-hist kernel build: v4b (bf16 one-hots, exact f32
    # accumulation) measured 42.7 ms real vs v3 int8's 57.6 at 32 MB
    # (bench/hist_probe.py); v5/v6 multi-dim contraction forms do not
    # compile on this Mosaic ("tpu.matmul Not implemented").
    return os.environ.get("MHC_HIST_VARIANT", "v4b")


def expand_impl() -> str:
    # (a Pallas row-DMA variant was wired and chip-tested round 4: the
    # word-granular 1-D HBM DMA does NOT compile on this Mosaic —
    # HTTP 500 — so the module was deleted; slices stays the default)
    return os.environ.get("MHC_EXPAND_IMPL", "slices")


def lane_tiles_cap() -> int:
    # Round-5 width sweep (bench/decode_width_probe.py, 32 MB markov,
    # VMEM gate bypassed): 2048 lanes (lt=2) is the kernel's optimum —
    # floor-corrected 0.486-0.497 GB/s vs lt=1 0.448, lt=4 0.388-0.397,
    # lt=8 0.374. The kernel is compute-throughput-bound, so wider
    # tiles only add relayout/VMEM pressure; cap at 2 so small-W inputs
    # don't auto-select the slower lt=4.
    return int(os.environ.get("MHC_LANE_TILES", "2"))


def decode_chains() -> int:
    # independent lane-slice chains interleaved inside the decode kernel
    # (software pipelining: chain B's VPU resolve overlaps chain A's MXU
    # fetch — the per-lane symbol chain otherwise serializes the units).
    # 1 = round-3 behavior; measured on-chip before changing the default.
    return int(os.environ.get("MHC_DECODE_CHAINS", "1"))


def unroll() -> int:
    # symbols decoded per Mosaic loop iteration: the fori_loop costs
    # ~6.5 us/iter in FIXED overhead on this toolchain (bench/
    # loop_calib.py), so unrolling is ~linear win until body ops dominate
    return int(os.environ.get("MHC_UNROLL", "8"))


def compact_impl() -> str:
    # slices: batched ascending dynamic-update-slices — 30 vs 107 ms
    # for the cumsum+gather form at 32 MB on v5e (round 3). CPU keeps
    # the gather (XLA:CPU scan-of-slices is serial and slow).
    return os.environ.get("MHC_COMPACT_IMPL") or (
        "slices" if _tpu() else "gather")
