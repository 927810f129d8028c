"""Flagship-dims importer proof.

The day a real ``stylegan3-t-ffhq-1024x1024.pkl`` appears, the load path is
``extract_pickle_state`` -> ``import_generator_state`` -> jit synthesis
(mirroring the reference's ``pickle.load(f)['G_ema']``,
/root/reference/stylegan3_hvae_full.py:454-455).  These tests run that exact
path TODAY on a synthetic NVlabs-persistence-layout pickle carrying the FULL
stylegan3-t-1024 shapes, and on a real-layout encoder checkpoint at the full
1024 config — so they pass unchanged with the real artifacts.

Slow lane: full-dims CPU synthesis is ~2 min on first run (the persistent
compilation cache makes repeats fast).
"""

import pickle
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from image_compression_2_tpu.compat import (
    extract_pickle_state,
    import_encoder_state,
    import_generator_state,
)
from image_compression_2_tpu.compat.torch_import import load_torch_checkpoint
from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.models import Generator, HVAEEncoder

# Names that are registered buffers (not parameters) in the NVlabs modules.
_BUFFER_LEAVES = {"w_avg", "freqs", "phases", "transform", "magnitude_ema"}


def _nvlabs_pickle(path: str, networks: dict) -> None:
    """Write {net_name: flat_state_dict} as an NVlabs-persistence-style pickle:
    every module is a ``_reconstruct_persistent_obj`` payload holding
    ``{"state": {"_parameters":..., "_buffers":..., "_modules":...}}``."""
    tu = types.ModuleType("torch_utils")
    pers = types.ModuleType("torch_utils.persistence")

    def _reconstruct_persistent_obj(meta):  # pragma: no cover (pickle target)
        raise RuntimeError("must never run on load")

    _reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    _reconstruct_persistent_obj.__qualname__ = "_reconstruct_persistent_obj"
    pers._reconstruct_persistent_obj = _reconstruct_persistent_obj
    sys.modules["torch_utils"] = tu
    sys.modules["torch_utils.persistence"] = pers

    class FakePersistent:
        def __init__(self, meta):
            self.meta = meta

        def __reduce__(self):
            return (_reconstruct_persistent_obj, (self.meta,))

    def nest(flat: dict) -> dict:
        tree: dict = {"_parameters": {}, "_buffers": {}, "_modules": {}}
        for name, tensor in flat.items():
            parts = name.split(".")
            node = tree
            for p in parts[:-1]:
                node = node["_modules"].setdefault(
                    p, {"_parameters": {}, "_buffers": {}, "_modules": {}}
                )
            leaf = parts[-1]
            kind = "_buffers" if leaf in _BUFFER_LEAVES else "_parameters"
            node[kind][leaf] = tensor
        return tree

    def wrap(tree: dict) -> FakePersistent:
        state = {
            "_parameters": tree["_parameters"],
            "_buffers": tree["_buffers"],
            "_modules": {k: wrap(v) for k, v in tree["_modules"].items()},
        }
        return FakePersistent({"state": state})

    try:
        with open(path, "wb") as f:
            pickle.dump({k: wrap(nest(v)) for k, v in networks.items()}, f)
    finally:
        del sys.modules["torch_utils"], sys.modules["torch_utils.persistence"]


def _torch_state_from_vars(cfg: GeneratorConfig, variables) -> dict:
    """Export our generator variables under the NVlabs state-dict names
    (layer names ``L{idx}_{size}_{channels}`` line up by construction)."""
    sd = {}
    p, b = variables["params"], variables["buffers"]
    for i in range(cfg.mapping_layers):
        sd[f"mapping.fc{i}.weight"] = torch.from_numpy(
            np.asarray(p["mapping"][f"fc{i}"]["weight"]))
        sd[f"mapping.fc{i}.bias"] = torch.from_numpy(
            np.asarray(p["mapping"][f"fc{i}"]["bias"]))
    sd["mapping.w_avg"] = torch.from_numpy(np.asarray(b["mapping"]["w_avg"]))
    ps, bs = p["synthesis"], b["synthesis"]
    sd["synthesis.input.weight"] = torch.from_numpy(
        np.asarray(ps["input"]["weight"]))
    sd["synthesis.input.affine.weight"] = torch.from_numpy(
        np.asarray(ps["input"]["affine"]["weight"]))
    sd["synthesis.input.affine.bias"] = torch.from_numpy(
        np.asarray(ps["input"]["affine"]["bias"]))
    for buf in ("freqs", "phases", "transform"):
        sd[f"synthesis.input.{buf}"] = torch.from_numpy(
            np.asarray(bs["input"][buf]))
    for spec in cfg.layer_specs:
        lp = ps[spec.name]
        sd[f"synthesis.{spec.name}.weight"] = torch.from_numpy(
            np.asarray(lp["weight"]).transpose(3, 2, 0, 1))  # HWIO -> OIHW
        sd[f"synthesis.{spec.name}.bias"] = torch.from_numpy(
            np.asarray(lp["bias"]))
        sd[f"synthesis.{spec.name}.affine.weight"] = torch.from_numpy(
            np.asarray(lp["affine"]["weight"]))
        sd[f"synthesis.{spec.name}.affine.bias"] = torch.from_numpy(
            np.asarray(lp["affine"]["bias"]))
        sd[f"synthesis.{spec.name}.magnitude_ema"] = torch.from_numpy(
            np.asarray(b["synthesis"][spec.name]["magnitude_ema"]))
    return sd


def _assert_tree_equal(a, b, path=""):
    if isinstance(a, dict) or isinstance(b, dict):
        assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
        for k in a:
            _assert_tree_equal(a[k], b[k], f"{path}.{k}")
        return
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b).reshape(np.shape(a)), err_msg=path
    )


def test_generator_pickle_import_at_flagship_dims(tmp_path):
    """Full stylegan3-t-1024 shapes through pickle -> extract -> import ->
    jit synthesis, against a direct-weight-assignment run."""
    cfg = GeneratorConfig(img_resolution=1024)
    assert cfg.num_ws == 16 and cfg.w_dim == 512  # the published operating point
    gen = Generator(cfg)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                  jnp.zeros([1, cfg.z_dim]))

    # NVlabs-layout pickle carrying the full-dims weights
    path = str(tmp_path / "stylegan3-t-synthetic-1024x1024.pkl")
    _nvlabs_pickle(path, {"G_ema": _torch_state_from_vars(cfg, variables)})

    nets = extract_pickle_state(path)
    assert "G_ema" in nets
    flat = nets["G_ema"]
    # every expected tensor present at the exact flagship shape
    assert flat["mapping.fc0.weight"].shape == (512, 512)
    for spec in cfg.layer_specs:
        assert flat[f"synthesis.{spec.name}.weight"].shape == (
            spec.out_channels, spec.in_channels, spec.conv_kernel,
            spec.conv_kernel), spec.name

    imported = import_generator_state(flat, cfg)

    # per-layer agreement with direct assignment: the imported tree must be
    # leaf-for-leaf identical to the variables it originated from
    direct = {"params": variables["params"], "buffers": variables["buffers"]}
    _assert_tree_equal(imported, direct)

    # and it must actually RUN at flagship dims: jit synthesis through both
    # trees, tapping a few layer activations (capturing all 16 at 1024^2
    # would need tens of GB of host RAM)
    taps = {cfg.layer_specs[0].name, cfg.layer_specs[7].name,
            cfg.layer_specs[-1].name}
    synth = jax.jit(lambda v, w: gen.apply(
        v, w, method="synthesis",
        capture_intermediates=lambda mdl, _: mdl.name in taps,
    ))
    ws = jax.random.normal(jax.random.PRNGKey(3), [1, cfg.num_ws, cfg.w_dim])
    img_imp, inter_imp = synth(
        {"params": imported["params"], "buffers": imported["buffers"]}, ws)
    img_dir, inter_dir = synth(variables, ws)
    assert img_imp.shape == (1, 1024, 1024, 3)
    assert bool(jnp.isfinite(img_imp).all())
    np.testing.assert_array_equal(np.asarray(img_imp), np.asarray(img_dir))
    flat_imp = jax.tree_util.tree_leaves(inter_imp)
    flat_dir = jax.tree_util.tree_leaves(inter_dir)
    assert len(flat_imp) == len(taps) and len(flat_dir) == len(taps)
    for a, b in zip(flat_imp, flat_dir):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mapping path too (truncation against the imported w_avg buffer);
    # one jitted callable for both runs — eager per-op dispatch on this host
    # can mix AOT-cached codegens and differ at the 1e-6 level
    map_fn = jax.jit(lambda v, z: gen.apply(v, z, 0.7, method="mapping"))
    z = jax.random.normal(jax.random.PRNGKey(4), [2, cfg.z_dim])
    wm_imp = map_fn(
        {"params": imported["params"], "buffers": imported["buffers"]}, z)
    wm_dir = map_fn(variables, z)
    np.testing.assert_array_equal(np.asarray(wm_imp), np.asarray(wm_dir))


def test_encoder_checkpoint_import_at_flagship_dims(tmp_path):
    """Real-layout torch training checkpoint at the full 1024 encoder config
    (channel_base=32768, channel_max=512, block_split=(5,12)) ->
    load_torch_checkpoint -> import_encoder_state -> forward parity."""
    from tests.test_compat import _TorchHVAEEncoder

    cfg = EncoderConfig(img_resolution=1024)
    torch.manual_seed(2)
    tenc = _TorchHVAEEncoder(cfg).eval()

    # the reference's checkpoint dict layout (stylegan3_hvae_full.py:888-904)
    path = str(tmp_path / "hvae_encoder_final.pt")
    torch.save({
        "epoch": 3,
        "encoder_state_dict": tenc.state_dict(),
        "optimizer_state_dict": {},
        "loss": 0.1,
        "history": {"total_loss": [0.2, 0.1]},
        "config": {
            "max_resolution": cfg.img_resolution,
            "img_channels": cfg.img_channels,
            "w_dim": cfg.w_dim,
            "num_ws": cfg.num_ws,
            "block_split": list(cfg.block_split),
        },
    }, path)

    ckpt = load_torch_checkpoint(path)
    assert ckpt["config"]["max_resolution"] == 1024
    params = import_encoder_state(ckpt["encoder_state_dict"], cfg.num_blocks)
    jenc = HVAEEncoder(cfg)

    x = np.random.RandomState(0).uniform(
        -1, 1, [1, 1024, 1024, 3]).astype(np.float32)
    with torch.no_grad():
        t_means, t_logvars = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_w, j_means, j_logvars = jax.jit(
        lambda p, x: jenc.apply({"params": p}, x))(params, jnp.asarray(x))

    assert j_means.shape == (1, cfg.num_ws, cfg.w_dim)
    np.testing.assert_allclose(np.asarray(j_means), t_means.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_logvars), t_logvars.numpy(),
                               rtol=1e-4, atol=1e-4)
