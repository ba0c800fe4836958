"""Test config: force an 8-device CPU mesh before any JAX backend use.

The classic XLA_FLAGS=--xla_force_host_platform_device_count trick does not
take effect in this environment (JAX_PLATFORMS=axon is pinned); the config
keys below are the verified working recipe (SURVEY.md §4). Tests that need
the real TPU chip are marked `tpu` and are skipped under this conftest.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
