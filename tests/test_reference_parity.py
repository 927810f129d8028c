"""GOLD parity: run the ACTUAL reference encoder (torch) and require our flax
encoder to reproduce its outputs through the weight importer.

This is not a translation check — it executes the upstream implementation at
/root/reference (skipped when the mount is absent) against ours.  The
reference module imports NVlabs/torchvision/lpips at module level; inert stubs
satisfy those imports (none are used by the encoder classes).
"""

import importlib.util
import io
import os
import sys
import types
from contextlib import redirect_stdout

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from image_compression_2_tpu.compat import import_encoder_state
from image_compression_2_tpu.core import EncoderConfig
from image_compression_2_tpu.models import HVAEEncoder

_REF = "/root/reference/stylegan3_hvae_full.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference mount not available"
)


def _load_reference_module():
    stubs = {}
    for name in ("torch_utils", "torch_utils.misc", "dnnlib", "lpips",
                 "torchvision", "torchvision.transforms"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "torchvision.transforms":
                mod.Compose = lambda *a, **k: None
                mod.Resize = mod.ToTensor = mod.Normalize = (
                    lambda *a, **k: None
                )
                mod.InterpolationMode = types.SimpleNamespace(LANCZOS=None)
            if name == "lpips":
                mod.LPIPS = lambda *a, **k: None
            sys.modules[name] = mod
            stubs[name] = mod
    spec = importlib.util.spec_from_file_location("ref_stylegan3_hvae", _REF)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    finally:
        for name in stubs:
            sys.modules.pop(name, None)
    return mod


def test_flax_encoder_reproduces_reference_encoder():
    ref = _load_reference_module()
    torch.manual_seed(0)
    res, w_dim, num_ws = 32, 16, 8
    block_split = (3, 6)
    # NOTE: channel schedule chosen so every projector's declared input width
    # matches its actual input.  With mismatched widths the reference
    # RE-RANDOMIZES fc1 on EVERY forward (it swaps the layer at runtime but
    # never updates self.in_channels — stylegan3_hvae_full.py:226-230), so its
    # own outputs are irreproducible; verified below.
    channel_base, channel_max = 1024, 32

    tenc = ref.HVAE_VGG_Encoder(
        img_resolution=res, img_channels=3, w_dim=w_dim, num_ws=num_ws,
        block_split=block_split, channel_base=channel_base,
        channel_max=channel_max,
    ).eval()

    x = np.random.RandomState(0).uniform(-1, 1, [2, 3, res, res]).astype(
        np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad(), redirect_stdout(io.StringIO()):
        _, t_means, t_logvars = tenc(xt)
        _, t_means2, _ = tenc(xt)
    # aligned config: the reference's means are deterministic given weights
    np.testing.assert_allclose(t_means.numpy(), t_means2.numpy(), atol=1e-6)

    cfg = EncoderConfig(
        img_resolution=res, w_dim=w_dim, num_ws=num_ws,
        block_split=block_split, channel_base=channel_base,
        channel_max=channel_max, hidden_dim=256,
    )
    params = import_encoder_state(tenc.state_dict(), cfg.num_blocks)
    jenc = HVAEEncoder(cfg)
    j_w, j_means, j_logvars = jenc.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(j_means), t_means.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logvars), t_logvars.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_quantization_matches_reference_compressor_math():
    """The reference's compress() quantization arithmetic
    (stylegan3_hvae_full.py:313-316) against our quantizer on the same w."""
    from image_compression_2_tpu.quant import quantize_uniform

    w = torch.from_numpy(
        np.random.RandomState(1).uniform(-1, 1, [1, 8, 16]).astype(np.float32))
    for bits in (4, 8, 10):
        scale = (2 ** bits) - 1
        w_scaled = (w + 1) * 0.5
        want = (torch.round(w_scaled * scale) / scale) * 2 - 1
        got = quantize_uniform(jnp.asarray(w.numpy()), bits)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-6)


def test_reference_fc1_rerandomization_documented():
    """Evidence for the PARITY.md M3 note: with mismatched projector widths
    the reference encoder produces DIFFERENT outputs on every forward (fc1 is
    re-created with fresh random weights each call)."""
    ref = _load_reference_module()
    torch.manual_seed(0)
    tenc = ref.HVAE_VGG_Encoder(
        img_resolution=32, img_channels=3, w_dim=16, num_ws=8,
        block_split=(3, 6), channel_base=256, channel_max=32,
    ).eval()
    x = torch.from_numpy(
        np.random.RandomState(0).uniform(-1, 1, [1, 3, 32, 32]).astype(
            np.float32))
    with torch.no_grad(), redirect_stdout(io.StringIO()):
        _, m1, _ = tenc(x)
        _, m2, _ = tenc(x)
    assert np.abs(m1.numpy() - m2.numpy()).max() > 1e-3, (
        "reference bug apparently fixed upstream; re-check importer notes"
    )
