"""Pallas histogram kernels vs the XLA reference (interpret mode — the
compiled path is exercised by the tpu-marked suite)."""

import numpy as np
import pytest

from mhc_tpu.ops import histogram
from mhc_tpu.ops.kernels import histogram_pallas
from tests.corpus import mixed_binary


@pytest.fixture(scope="module")
def blocks():
    import jax.numpy as jnp
    data = np.frombuffer(mixed_binary(40_000, seed=70), np.uint8)
    B = 10
    n = 4096
    padded = np.zeros(B * n, np.uint8)
    padded[: data.size] = data
    n_valid = np.full(B, n, np.int32)
    n_valid[-1] = data.size - (B - 1) * n
    return jnp.asarray(padded.reshape(B, n)), jnp.asarray(n_valid)


@pytest.mark.parametrize("variant", ["v3", "v4b", "v5", "v6"])
def test_markov_hist_pallas_matches_matmul(blocks, variant):
    data, nv = blocks
    ref = np.asarray(histogram.histogram_markov(data, nv, method="matmul"))
    got = np.asarray(histogram_pallas.markov_hist_pallas(
        data, nv, interpret=True, variant=variant))
    np.testing.assert_array_equal(got, ref)


def test_order0_hist_pallas_matches_matmul(blocks):
    data, nv = blocks
    ref = np.asarray(histogram.histogram_order0(data, nv, method="matmul"))
    got = np.asarray(histogram_pallas.order0_hist_pallas(
        data, nv, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_order0_hist_pallas_short_tail():
    import jax.numpy as jnp
    data = jnp.asarray(np.arange(17, dtype=np.uint8).reshape(1, 17))
    nv = jnp.asarray(np.array([13], np.int32))
    got = np.asarray(histogram_pallas.order0_hist_pallas(
        data, nv, interpret=True))
    ref = np.bincount(np.arange(13), minlength=256)
    np.testing.assert_array_equal(got, ref)
