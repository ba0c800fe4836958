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
  MHC_PACK_METHOD    dense | pallas | merge | scatter
  MHC_LOOKUP         gather | mxu | pallas  (pallas = VMEM int8 MXU
                     row-fetch kernel, ops/kernels/lookup_pallas.py)
  MHC_HIST_METHOD    pallas | matmul | scatter
  MHC_EXPAND_IMPL    slices | gather | blocks | dma
  MHC_LANE_TILES     int cap on decode lane tiling (1/2/4)
  MHC_DECODE_CHAINS  interleaved lane-slice chains in the decode kernel
  MHC_COMPACT_IMPL   slices | gather | blocks | dma  (payload compaction)
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
    # dense: in-kernel word-stream assembly (reverse group window) —
    # 2.1x the bubble+scatter pack on v5e and removes the compaction
    # scatter entirely (48 vs 102 ms kernel at 32 MB, round 3).
    # pallas = bubble-stream legacy, merge/scatter = XLA packers.
    return os.environ.get("MHC_PACK_METHOD") or (
        "dense" if _tpu() else "merge")


def lookup_method() -> str:
    # gather beats the XLA MXU bilinear 2.3x with honest (sync-forced)
    # timing — bench/encode_micro.py round 3. "pallas" selects the
    # VMEM-resident int8 MXU row-fetch kernel (lookup_pallas.py).
    return os.environ.get("MHC_LOOKUP") or "gather"


def hist_method() -> str:
    # pallas v3 (VMEM int8 one-hot + MXU): 1.25x the XLA matmul on v5e
    # (139 vs 174 ms at 32 MB markov, round 3) and no HBM one-hot
    # materialization; scatter-add wins on CPU
    return os.environ.get("MHC_HIST_METHOD") or (
        "pallas" if _tpu() else "scatter")


def expand_impl() -> str:
    # slices | gather | blocks | dma (Pallas row-DMA, ops/kernels/
    # copy_pallas.py — wired round 4 per VERDICT; measured before
    # defaulting)
    return os.environ.get("MHC_EXPAND_IMPL", "slices")


def lane_tiles_cap() -> int:
    return int(os.environ.get("MHC_LANE_TILES", "4"))


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
    # dma = Pallas row-DMA (copy_pallas.py), wired round 4.
    return os.environ.get("MHC_COMPACT_IMPL") or (
        "slices" if _tpu() else "gather")
