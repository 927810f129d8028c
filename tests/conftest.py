"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way — a host-platform
device count override — since real multi-chip hardware is not available in CI.
Must run before jax initialises its backends, hence the env mutation at import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep single-core CI deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The environment's site hook pins JAX_PLATFORMS to the TPU plugin before our
# env override can land; force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()

from image_compression_2_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # measured: big suite speedup on repeat runs


import pytest


@pytest.fixture(autouse=True)
def _reset_flrelu_train_flag():
    """Trainers flip flrelu_policy into fwd+bwd-winner lookup for their whole
    process (the honest granularity for trace-time mode selection); tests
    must not leak that flag into each other."""
    yield
    from image_compression_2_tpu.ops import flrelu_policy

    flrelu_policy.set_train(False)
