"""Entropy models: order-0 Huffman and first-order Markov-Huffman.

Capability parity: the two codec modes of the reference (SURVEY.md §1;
mount empty, §0). A model owns (a) the statistics pass over a block batch
and (b) the shape of its code tables. Both models expose tables in the
unified [prev, cur] layout so the encode/decode kernels (`ops/bitpack.py`)
are mode-agnostic — order-0 simply broadcasts its single table across the
256 context rows (zero-copy in XLA).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import canonical, histogram, huffman
from .. import container


@dataclass(frozen=True)
class EntropyModel:
    name: str
    mode: int          # container mode id
    markov: bool

    def histogram(self, blocks: jnp.ndarray, n_valid: jnp.ndarray,
                  method: str = "matmul") -> jnp.ndarray:
        if self.markov:
            return histogram.histogram_markov(blocks, n_valid, method=method)
        return histogram.histogram_order0(blocks, n_valid, method=method)

    def lengths_from_counts(self, counts: np.ndarray):
        """Deterministic code lengths. Host C++ builder by default (1 ms
        for all 256 contexts vs ~10 device dispatch round-trips for the
        JAX twin); MHC_TABLE_BUILD=device selects the on-chip builder
        (same bits — the builders are tested identical; the sharded
        pipeline always builds on device after its psum)."""
        import os
        scaled = huffman.rescale_counts(np.asarray(counts))
        if os.environ.get("MHC_TABLE_BUILD", "host") == "device":
            return huffman.code_lengths(jnp.asarray(scaled))
        from ..utils import native
        return native.code_lengths(scaled, huffman.MAX_CODE_LEN)

    def tables_from_lengths(self, lengths) -> dict:
        """Full encode+decode table set in unified (256, ...) layout."""
        t = canonical.canonical_codes(jnp.asarray(lengths, jnp.int32))
        if not self.markov:
            t = {
                "codes": jnp.broadcast_to(t["codes"], (256, 256)),
                "lengths": jnp.broadcast_to(t["lengths"], (256, 256)),
                "lim": jnp.broadcast_to(t["lim"], (256, t["lim"].shape[-1])),
                "base": jnp.broadcast_to(t["base"], (256, t["base"].shape[-1])),
                "first_code": jnp.broadcast_to(
                    t["first_code"], (256, t["first_code"].shape[-1])),
                "sorted_syms": jnp.broadcast_to(t["sorted_syms"], (256, 256)),
            }
        return t


ORDER0 = EntropyModel(name="huffman", mode=container.MODE_ORDER0, markov=False)
MARKOV = EntropyModel(name="markov", mode=container.MODE_MARKOV, markov=True)

_BY_NAME = {
    "huffman": ORDER0,
    "order0": ORDER0,
    "markov": MARKOV,
}
_BY_MODE = {container.MODE_ORDER0: ORDER0, container.MODE_MARKOV: MARKOV}


def get_model(name_or_mode) -> EntropyModel:
    if isinstance(name_or_mode, EntropyModel):
        return name_or_mode
    if isinstance(name_or_mode, str):
        try:
            return _BY_NAME[name_or_mode.lower()]
        except KeyError:
            raise ValueError(
                f"unknown mode {name_or_mode!r}; expected one of "
                f"{sorted(_BY_NAME)}") from None
    return _BY_MODE[int(name_or_mode)]
