"""Test config: force an 8-device CPU mesh before any JAX backend use.

The classic XLA_FLAGS=--xla_force_host_platform_device_count trick does not
take effect in this environment (JAX_PLATFORMS=axon is pinned); the config
keys below are the verified working recipe (SURVEY.md §4).

Tests marked `tpu` need the real chip: they are skipped here unless
MHC_TPU_TESTS=1, in which case the CPU forcing is skipped, the real
backend is used, and everything NOT marked `tpu` is skipped instead:

    MHC_TPU_TESTS=1 python -m pytest tests/ -m tpu -q      # on-chip run
"""

import os
import sys

import jax
import pytest

ON_CHIP = os.environ.get("MHC_TPU_TESTS") == "1"
if not ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not ON_CHIP:
            item.add_marker(pytest.mark.skip(
                reason="needs the real TPU chip: "
                "MHC_TPU_TESTS=1 pytest -m tpu"))
        elif ON_CHIP and "tpu" not in item.keywords:
            item.add_marker(pytest.mark.skip(
                reason="CPU-mesh test skipped during on-chip run"))
