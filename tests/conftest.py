"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never touch real TPU hardware; multi-chip sharding is validated on
``xla_force_host_platform_device_count=8`` CPU devices. Must run before jax
imports anywhere, hence the env mutation at module import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU-tunnel plugin ignores JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
