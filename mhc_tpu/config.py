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
  MHC_FETCH_IMPL     chunk | mxu | mxu2 | mxu3 | mxu4 | mxu5 | sparse | slab
  MHC_REFILL         group | scan      (Pallas decode word refill)
  MHC_PACK_METHOD    pallas | merge | scatter
  MHC_LOOKUP         mxu | gather
  MHC_HIST_METHOD    matmul | pallas | scatter
  MHC_EXPAND_IMPL    slices | gather
  MHC_LANE_TILES     int cap on decode lane tiling (1/2/4)
  MHC_COMPACT_IMPL   gather | slices | scatteradd  (payload compaction)
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
    # mxu2: 8-bit-plane one-hot MXU fetch — 2.1x chunk on v5e (round 2)
    return os.environ.get("MHC_FETCH_IMPL", "mxu2")


def refill_impl() -> str:
    # group: windowed refill — one O(W) stream pass per 64 symbols
    # instead of per 2 (round 3); scan is the round-2 legacy path
    return os.environ.get("MHC_REFILL", "group")


def pack_method() -> str:
    return os.environ.get("MHC_PACK_METHOD") or (
        "pallas" if _tpu() else "merge")


def lookup_method() -> str:
    # gather beats the MXU bilinear 2.3x with honest (sync-forced)
    # timing — bench/encode_micro.py round 3
    return os.environ.get("MHC_LOOKUP") or "gather"


def hist_method() -> str:
    return os.environ.get("MHC_HIST_METHOD") or (
        "matmul" if _tpu() else "scatter")


def expand_impl() -> str:
    return os.environ.get("MHC_EXPAND_IMPL", "slices")


def lane_tiles_cap() -> int:
    return int(os.environ.get("MHC_LANE_TILES", "4"))


def unroll() -> int:
    # symbols decoded per Mosaic loop iteration: the fori_loop costs
    # ~6.5 us/iter in FIXED overhead on this toolchain (bench/
    # loop_calib.py), so unrolling is ~linear win until body ops dominate
    return int(os.environ.get("MHC_UNROLL", "8"))


def compact_impl() -> str:
    return os.environ.get("MHC_COMPACT_IMPL", "gather")
