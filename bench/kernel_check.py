"""On-chip correctness check: Pallas decode vs XLA scan decode on the
cached words from bench/decode_matrix.py. Prints per-variant equality."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> int:
    n_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp
    from mhc_tpu.models.entropy import get_model
    from mhc_tpu.ops import bitpack
    from mhc_tpu.ops.kernels import decode_pallas

    z = np.load(f"/tmp/mhc_words_{n_mb}.npz")
    words_h, lengths, du = z["words"], z["lengths"], int(z["du"])
    # small subset: 1024 units is one tile
    words_d = jax.device_put(words_h[:1024])
    model = get_model("markov")
    tables = model.tables_from_lengths(jnp.asarray(lengths, jnp.int32))
    R = words_d.shape[0]
    nv = jnp.full((R,), du, jnp.int32)
    t0 = time.perf_counter()
    ref = np.asarray(bitpack.decode_blocks(
        words_d, nv, tables["lim"], tables["base"], tables["first_code"],
        tables["sorted_syms"], n_out=du, markov=True))
    print(f"scan ref done {time.perf_counter()-t0:.1f}s", flush=True)
    for fetch, refill in (("mxu2", "scan"), ("mxu2", "group"),
                          ("mxu3", "group")):
        t0 = time.perf_counter()
        out = decode_pallas.decode_blocks_pallas(
            words_d, tables["lim"], tables["base"], tables["first_code"],
            tables["sorted_syms"], n_out=du, markov=True,
            fetch_impl=fetch, refill=refill)
        out = np.asarray(out)
        ok = bool((out == ref).all())
        frac = float((out == ref).mean())
        print(f"{fetch}/{refill}: equal={ok} frac={frac:.6f} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
