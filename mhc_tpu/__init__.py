"""mhc_tpu — a TPU-native Markov-Huffman compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jeremy-rifkin/Markov-Huffman-Coding (see SURVEY.md; the reference mount
was empty, so parity targets come from SURVEY.md/BASELINE.json):

* order-0 canonical Huffman and 256-context Markov-Huffman coding
* block-parallel encode/decode with per-block bit offsets (container.py)
* MXU-matmul histogramming, vmapped tree-free table construction
* data-parallel sharding over a device mesh with psum histogram
  reduction, broadcast tables and ordered gather (parallel/)
"""

import os as _os

import jax as _jax

# MHC_PLATFORM=cpu forces the CPU backend (this env pins JAX_PLATFORMS
# at a level the plain env var cannot override; jax.config can).
if _os.environ.get("MHC_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["MHC_PLATFORM"])

# The vmapped table-build jits are expensive to compile on TPU (minutes);
# a persistent cache makes every process after the first start warm.
if not _os.environ.get("MHC_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "MHC_COMPILE_CACHE", _os.path.expanduser("~/.cache/mhc_tpu/jax"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .api import (DEFAULT_BLOCK_SIZE, DEFAULT_DECODE_UNIT,
                  DEFAULT_SEGMENT_SIZE, compress, compress_file,
                  compression_report, decompress, decompress_file)
from .models.entropy import MARKOV, ORDER0, get_model

__version__ = "0.1.0"

__all__ = [
    "compress", "decompress", "compress_file", "decompress_file",
    "compression_report", "get_model", "ORDER0", "MARKOV",
    "DEFAULT_BLOCK_SIZE", "DEFAULT_DECODE_UNIT", "DEFAULT_SEGMENT_SIZE",
    "__version__",
]
