"""On-chip regression tests (marked `tpu`): every Mosaic kernel must
compile AND roundtrip at the SHIPPED bench shapes, so a kernel that
can't compile at the default configuration fails here rather than in
the driver's bench (VERDICT round 1: the decode kernel's first
real-shape compile happened inside the failed bench).

Run:  MHC_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def corpus16():
    from bench import make_corpus
    return make_corpus(16 << 20)


def test_backend_is_tpu():
    import jax
    assert jax.default_backend() == "tpu", jax.devices()


def test_api_roundtrip_default_markov(corpus16):
    """Default path at bench shapes: matmul hist + merge pack + Pallas
    decode at the shipped decode unit and chunking."""
    from mhc_tpu import api
    blob = api.compress(corpus16, mode="markov")
    assert api.decompress(blob) == corpus16


def test_api_roundtrip_order0(corpus16):
    from mhc_tpu import api
    blob = api.compress(corpus16, mode="huffman")
    assert api.decompress(blob) == corpus16


def test_engine_device_resident_roundtrip(corpus16):
    from mhc_tpu import engine
    st = engine.stage(corpus16, mode="markov")
    enc = engine.encode(st)
    outs = engine.decode(enc)
    assert engine.fetch_bytes(enc, outs) == corpus16


def test_pack_pallas_bit_identical(corpus16):
    """Pallas pack kernel compiles at bench shapes and its container is
    byte-identical to the merge packer's."""
    from mhc_tpu import api
    ref = api.compress(corpus16[: 8 << 20], mode="markov")
    got = api.compress(corpus16[: 8 << 20], mode="markov",
                       pack_method="pallas")
    assert got == ref


def test_decode_pallas_fetch_impls(corpus16):
    """Every decode fetch variant compiles and is bit-exact at the
    shipped shape."""
    from mhc_tpu import api
    data = corpus16[: 8 << 20]
    blob = api.compress(data, mode="markov")
    for impl in ("chunk", "mxu", "slab"):
        os.environ["MHC_FETCH_IMPL"] = impl
        try:
            assert api.decompress(blob) == data, impl
        finally:
            os.environ.pop("MHC_FETCH_IMPL", None)
