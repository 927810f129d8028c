"""Distributed helpers + generator numeric-stability snapshot."""

import numpy as np

import jax
import jax.numpy as jnp

from image_compression_2_tpu.parallel import (
    global_batch_slice,
    initialize_distributed,
)


def test_initialize_distributed_noop_single_process():
    # no coordinator configured -> must be a clean no-op
    initialize_distributed()
    assert jax.process_count() == 1
    assert global_batch_slice(16) == slice(0, 16)


def test_generator_numeric_snapshot():
    """Pin coarse output statistics of a fixed seed/config so silent numeric
    regressions in the ops/generator stack are caught (values recorded from
    the first green implementation; loose tolerance absorbs backend jitter)."""
    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.models import Generator

    cfg = GeneratorConfig.tiny(img_resolution=32)
    gen = Generator(cfg)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                  jnp.zeros([1, cfg.z_dim]))
    img = np.asarray(gen.apply(variables, jax.random.normal(
        jax.random.PRNGKey(123), [2, cfg.z_dim])))
    stats = np.array([img.mean(), img.std(), np.abs(img).max()])
    expected = _SNAPSHOT
    if expected is None:
        raise AssertionError(f"record snapshot: {stats.tolist()}")
    np.testing.assert_allclose(stats, expected, rtol=2e-3, atol=1e-4)


_SNAPSHOT = [0.026019379496574402, 0.12573374807834625, 0.42004141211509705]
