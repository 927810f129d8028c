"""Generator architecture tests: shapes, determinism, truncation, equivariance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.core import GeneratorConfig, Precision
from image_compression_2_tpu.models import Generator


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = GeneratorConfig.tiny(img_resolution=32)
    model = Generator(cfg)
    z = jnp.zeros([2, cfg.z_dim])
    variables = model.init(jax.random.PRNGKey(0), z)
    return cfg, model, variables


def test_flagship_spec_matches_stylegan3_t_1024():
    cfg = GeneratorConfig()
    sizes = [s.out_size for s in cfg.layer_specs]
    assert sizes == [36, 36, 52, 52, 84, 148, 148, 276, 276, 532, 1044, 1044,
                     1044, 1024, 1024]
    chans = [s.out_channels for s in cfg.layer_specs]
    assert chans == [512, 512, 512, 512, 512, 512, 512, 323, 203, 128, 81, 51,
                     32, 32, 3]
    assert cfg.num_ws == 16
    assert cfg.layer_specs[-1].is_torgb and cfg.layer_specs[-1].conv_kernel == 1


def test_generator_forward_shapes(tiny_gen):
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), [2, cfg.z_dim])
    img = model.apply(variables, z)
    assert img.shape == (2, cfg.img_resolution, cfg.img_resolution,
                         cfg.img_channels)
    assert np.isfinite(np.asarray(img)).all()

    ws = model.apply(variables, z, method="mapping")
    assert ws.shape == (2, cfg.num_ws, cfg.w_dim)
    img2 = model.apply(variables, ws, method="synthesis")
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-5)


def test_generator_jit_and_determinism(tiny_gen):
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(2), [1, cfg.z_dim])
    syn = jax.jit(lambda v, z: model.apply(v, z))
    a = np.asarray(syn(variables, z))
    b = np.asarray(syn(variables, z))
    np.testing.assert_array_equal(a, b)


def test_truncation(tiny_gen):
    cfg, model, variables = tiny_gen
    # Place a nonzero w_avg so truncation visibly moves ws toward it.
    w_avg = jnp.full([cfg.w_dim], 0.7)
    variables = dict(variables)
    buffers = jax.tree_util.tree_map(lambda x: x, variables["buffers"])
    buffers["mapping"] = dict(buffers["mapping"], w_avg=w_avg)
    variables["buffers"] = buffers

    z = jax.random.normal(jax.random.PRNGKey(3), [2, cfg.z_dim])
    ws_full = model.apply(variables, z, 1.0, method="mapping")
    ws_zero = model.apply(variables, z, 0.0, method="mapping")
    np.testing.assert_allclose(
        np.asarray(ws_zero), np.broadcast_to(np.asarray(w_avg), ws_zero.shape),
        atol=1e-6)
    ws_half = model.apply(variables, z, 0.5, method="mapping")
    np.testing.assert_allclose(
        np.asarray(ws_half),
        0.5 * np.asarray(ws_full) + 0.5 * np.asarray(w_avg), atol=1e-5)
    # cutoff: layers >= cutoff stay untruncated
    ws_cut = model.apply(variables, z, 0.0, 3, method="mapping")
    np.testing.assert_allclose(np.asarray(ws_cut[:, 3:]),
                               np.asarray(ws_full[:, 3:]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ws_cut[:, :3]),
        np.broadcast_to(np.asarray(w_avg), ws_cut[:, :3].shape), atol=1e-6)


def test_translation_equivariance(tiny_gen):
    """Alias-free property: translating the input transform shifts the image.

    Shift the canvas by one output pixel via the SynthesisInput transform
    buffer and compare against a roll of the untouched output (interior only,
    away from boundary effects).
    """
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(4), [1, cfg.z_dim])
    img = np.asarray(model.apply(variables, z))

    # The visible canvas spans 1.0 transform unit, so one output pixel is
    # 1/img_resolution units of translation.
    shift_units = 1.0 / cfg.img_resolution
    transform = np.eye(3, dtype=np.float32)
    transform[0, 2] = shift_units  # translate right by one pixel
    variables2 = dict(variables)
    buffers = dict(variables2["buffers"])
    syn = dict(buffers["synthesis"])
    inp = dict(syn["input"])
    inp["transform"] = jnp.asarray(transform)
    syn["input"] = inp
    buffers["synthesis"] = syn
    variables2["buffers"] = buffers

    img_shifted = np.asarray(model.apply(variables2, z))
    # transform[0,2] = +1px moves the content one pixel to the LEFT.
    rolled = np.roll(img, shift=-1, axis=2)  # NHWC: axis 2 is width
    m = 8  # interior margin
    err = np.abs(img_shifted[:, m:-m, m:-m] - rolled[:, m:-m, m:-m])
    scale = np.abs(img[:, m:-m, m:-m]).mean() + 1e-6
    # Sub-percent agreement; a raw 1-pixel image difference is ~18% on this
    # config, so this genuinely certifies the alias-free property.
    assert err.mean() / scale < 0.03, (err.mean(), scale)


def test_bf16_precision_path(tiny_gen):
    cfg, _, variables = tiny_gen
    model_bf16 = Generator(cfg, Precision(compute_dtype=jnp.bfloat16))
    z = jax.random.normal(jax.random.PRNGKey(5), [1, cfg.z_dim])
    img32 = np.asarray(Generator(cfg).apply(variables, z))
    img16 = np.asarray(model_bf16.apply(variables, z))
    assert img16.dtype == np.float32
    # bf16 path should agree to coarse tolerance
    denom = np.abs(img32).mean() + 1e-6
    assert np.abs(img16 - img32).mean() / denom < 0.1


def test_w_avg_ema_update(tiny_gen):
    """G-training support: mapping's update_w_avg moves the buffer toward the
    batch mean W with rate (1 - w_avg_beta)."""
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(9), [4, cfg.z_dim])
    ws, mutated = model.apply(
        variables, z, 1.0, None, True, method="mapping", mutable=["buffers"]
    )
    new_avg = np.asarray(mutated["buffers"]["mapping"]["w_avg"])
    batch_mean = np.asarray(ws[:, 0, :]).mean(axis=0)
    want = (1 - cfg.w_avg_beta) * batch_mean  # old buffer was zeros
    np.testing.assert_allclose(new_avg, want, rtol=1e-5, atol=1e-6)


def test_class_conditional_mapping():
    """cfg.c_dim > 0 embeds + concatenates labels before the mapping MLP
    (reference surface G.mapping(z, c, ...), stylegan3_hvae_full.py:557;
    always c=None for FFHQ — the conditional path is config-gated here)."""
    import dataclasses

    cfg = dataclasses.replace(
        GeneratorConfig.tiny(img_resolution=16, num_layers=4, margin_size=1),
        c_dim=10)
    model = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), [2, cfg.z_dim])
    c = jax.nn.one_hot(jnp.asarray([3, 7]), cfg.c_dim)
    variables = jax.jit(
        lambda k, z, c: model.init(k, z, c=c)
    )(jax.random.PRNGKey(1), z, c)
    assert "embed" in variables["params"]["mapping"]
    ws = model.apply(variables, z, c=c, method="mapping")
    assert ws.shape == (2, cfg.num_ws, cfg.w_dim)
    # labels matter: a different class gives different styles
    ws2 = model.apply(
        variables, z, c=jax.nn.one_hot(jnp.asarray([4, 7]), cfg.c_dim),
        method="mapping")
    assert float(jnp.abs(ws - ws2)[0].max()) > 1e-4
    np.testing.assert_allclose(np.asarray(ws[1]), np.asarray(ws2[1]),
                               atol=1e-6)
    # missing labels on a conditional model is a hard error
    with pytest.raises(ValueError):
        model.apply(variables, z, method="mapping")
    # and labels on an unconditional model too
    uncond = Generator(GeneratorConfig.tiny(img_resolution=16, num_layers=4,
                                            margin_size=1))
    uv = jax.jit(uncond.init)(jax.random.PRNGKey(0), z)
    with pytest.raises(ValueError):
        uncond.apply(uv, z, c=c, method="mapping")
