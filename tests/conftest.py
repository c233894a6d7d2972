"""Test configuration: force the JAX CPU backend with 8 virtual devices so
mesh/sharding tests run anywhere (SURVEY.md section 4, item 3)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may import jax at interpreter start (with
# JAX_PLATFORMS pointing at a hardware backend), so the env var alone is too
# late — override through the config API as well.
import jax
jax.config.update("jax_platforms", "cpu")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

from meteor_demod_tpu.config import DemodConfig


@pytest.fixture(scope="session")
def qpsk_cfg():
    return DemodConfig(samplerate=230400, block_len=4096)


@pytest.fixture(scope="session")
def oqpsk_cfg():
    return DemodConfig(samplerate=230400, symrate=80000.0, oqpsk=True,
                       block_len=4096)
