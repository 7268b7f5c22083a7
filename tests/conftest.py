"""Test harness config (SURVEY.md §4.4).

Forces the CPU backend with 8 virtual devices so mesh/sharding/psum tests run
in plain pytest on any machine.  Real-TPU execution is exercised by bench.py
and __graft_entry__.py, not the unit suite (the axon TPU plugin is
experimental; CI must not depend on it).

IMPORTANT (this machine): sitecustomize registers the experimental axon TPU
plugin in every python process and calls jax.config.update(jax_platforms=
'axon'), which overrides the JAX_PLATFORMS env var.  Setting the env var is
therefore not enough — we must update the config object after jax imports,
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
