"""Test fixtures.

All tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware — the analog of the reference's CPU<->GPU
cross-verification mode (MemN2N/define.h:96-111).

The container's sitecustomize imports jax and registers the remote-TPU PJRT
plugin at interpreter startup, so environment variables are too late; we
steer jax onto CPU via jax.config before any backend is initialized.
"""
import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
