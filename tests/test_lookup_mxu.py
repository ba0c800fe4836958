"""MXU bilinear code lookup vs the gather path — identical bits."""

import numpy as np
import jax.numpy as jnp

from mhc_tpu import api
from mhc_tpu.models.entropy import get_model
from mhc_tpu.ops import bitpack
from tests.corpus import mixed_binary


def test_bilinear_lookup_matches_gather():
    data = mixed_binary(100_000, seed=80)
    model = get_model("markov")
    units, nv = api.blockify(data, 4096)
    counts = model.histogram(jnp.asarray(units), jnp.asarray(nv))
    lengths = model.lengths_from_counts(np.asarray(counts))
    t = model.tables_from_lengths(lengths)
    packed_t = ((t["lengths"].astype(jnp.uint32) << 16)
                | t["codes"].astype(jnp.uint32))
    d = jnp.asarray(units).astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.zeros((d.shape[0], 1), jnp.int32), d[:, :-1]], axis=1)
    ref = np.asarray(bitpack._flat_gather(packed_t, prev, d))
    got = np.asarray(bitpack._bilinear_lookup(packed_t, prev, d))
    np.testing.assert_array_equal(got, ref)
