"""Test configuration: force an 8-virtual-device CPU mesh.

This environment pre-imports jax at interpreter startup (a sitecustomize in
/root/.axon_site registers the axon TPU backend), so JAX_PLATFORMS /
XLA_FLAGS set here are TOO LATE.  jax.config.update still works after
import and is the only reliable way to keep tests off the (single,
lock-contended) TPU chip."""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from ipp_tpu.utils.jaxconfig import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
