"""Torch-weight importers: reference checkpoints/pickles -> JAX pytrees.

Covers the reference's model-loading surface so trained artifacts carry over:
- ``import_encoder_state``: an ``HVAE_VGG_Encoder`` state dict
  (stylegan3_hvae_full.py:888-919 checkpoints, either the
  'encoder_state_dict' or legacy 'encoder' layout — hvae_training.py:306-326)
  -> flax params for ``models.encoder.HVAEEncoder``.
- ``import_generator_state``: a StyleGAN3 generator state dict -> flax vars
  for ``models.generator.Generator`` (layer names here intentionally match
  the alias-free naming scheme ``L{idx}_{size}_{channels}`` so keys line up).
- ``extract_pickle_state``: best-effort extraction of ``G_ema`` tensors from
  an NVlabs-style pickle WITHOUT the stylegan3 repo: stub modules satisfy the
  unpickler and the persistent-object payloads are walked for parameters and
  buffers.  No foreign code is executed (the stub ignores embedded source).
- ``import_lpips_state``: VGG16+lin heads -> the ``train.lpips.LPIPS`` module.

Layout conventions converted here:
  torch Conv2d weight [O, I, kh, kw]  ->  flax Conv kernel [kh, kw, I, O]
  torch Linear weight [O, I]          ->  flax Dense kernel [I, O]
  EqualLinear keeps torch layout [O, I] (it stores raw 'weight').
"""

from __future__ import annotations

import io
import pickle
import sys
import types
from typing import Dict, Optional, Tuple

import numpy as np


def _t2np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv_kernel(w) -> np.ndarray:
    return _t2np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _dense_kernel(w) -> np.ndarray:
    return _t2np(w).T  # OI -> IO


# --------------------------------------------------------------------- encoder
def import_encoder_state(state_dict: Dict, num_blocks: int) -> Dict:
    """Reference HVAE_VGG_Encoder state dict -> flax params tree."""
    sd = state_dict
    params: Dict = {
        "from_rgb": {
            "kernel": _conv_kernel(sd["from_rgb.weight"]),
            "bias": _t2np(sd["from_rgb.bias"]),
        }
    }
    for i in range(num_blocks):
        prefix = f"blocks.{i}."
        if prefix + "conv1.weight" not in sd:
            break
        params[f"block{i}"] = {
            "conv1": {
                "kernel": _conv_kernel(sd[prefix + "conv1.weight"]),
                "bias": _t2np(sd[prefix + "conv1.bias"]),
            },
            "norm1": {
                "scale": _t2np(sd[prefix + "norm1.weight"]),
                "bias": _t2np(sd[prefix + "norm1.bias"]),
            },
            "conv2": {
                "kernel": _conv_kernel(sd[prefix + "conv2.weight"]),
                "bias": _t2np(sd[prefix + "conv2.bias"]),
            },
            "norm2": {
                "scale": _t2np(sd[prefix + "norm2.weight"]),
                "bias": _t2np(sd[prefix + "norm2.bias"]),
            },
        }
    for head in ("global_projector", "medium_projector", "fine_projector"):
        params[head] = {
            "fc1": {
                "kernel": _dense_kernel(sd[f"{head}.fc1.weight"]),
                "bias": _t2np(sd[f"{head}.fc1.bias"]),
            },
            "fc2": {
                "kernel": _dense_kernel(sd[f"{head}.fc2.weight"]),
                "bias": _t2np(sd[f"{head}.fc2.bias"]),
            },
        }
    return params


def load_torch_checkpoint(path: str) -> Dict:
    """torch.load a reference training checkpoint (weights only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "encoder_state_dict" in ckpt:
        return ckpt
    if "encoder" in ckpt:  # legacy layout
        ckpt["encoder_state_dict"] = ckpt.pop("encoder")
    return ckpt


# ------------------------------------------------------------------- generator
def import_generator_state(
    state_dict: Dict, gen_cfg, lr_multiplier: float = 0.01
) -> Dict:
    """StyleGAN3 generator state dict -> {'params':..., 'buffers':...}.

    EqualLinear stores parameters at unit scale and multiplies by
    ``lr_multiplier`` at run time; torch checkpoints store the already-scaled
    small weights divided out the same way (both sides keep raw storage *
    gain semantics), so mapping weights transfer verbatim.
    """
    sd = {k: v for k, v in state_dict.items()}
    params: Dict = {"mapping": {}, "synthesis": {}}
    buffers: Dict = {"mapping": {}, "synthesis": {}}

    i = 0
    while f"mapping.fc{i}.weight" in sd:
        params["mapping"][f"fc{i}"] = {
            "weight": _t2np(sd[f"mapping.fc{i}.weight"]),
            "bias": _t2np(sd[f"mapping.fc{i}.bias"]),
        }
        i += 1
    buffers["mapping"]["w_avg"] = _t2np(sd["mapping.w_avg"])

    params["synthesis"]["input"] = {
        "weight": _t2np(sd["synthesis.input.weight"]),
        "affine": {
            "weight": _t2np(sd["synthesis.input.affine.weight"]),
            "bias": _t2np(sd["synthesis.input.affine.bias"]),
        },
    }
    buffers["synthesis"]["input"] = {
        "freqs": _t2np(sd["synthesis.input.freqs"]),
        "phases": _t2np(sd["synthesis.input.phases"]),
        "transform": _t2np(sd["synthesis.input.transform"]),
    }
    for spec in gen_cfg.layer_specs:
        prefix = f"synthesis.{spec.name}."
        params["synthesis"][spec.name] = {
            "weight": _conv_kernel(sd[prefix + "weight"]),
            "bias": _t2np(sd[prefix + "bias"]),
            "affine": {
                "weight": _t2np(sd[prefix + "affine.weight"]),
                "bias": _t2np(sd[prefix + "affine.bias"]),
            },
        }
        buffers["synthesis"][spec.name] = {
            "magnitude_ema": _t2np(sd[prefix + "magnitude_ema"]).reshape(())
        }
    return {"params": params, "buffers": buffers}


# ------------------------------------------------- NVlabs pickle state capture
class _PersistentStub:
    """Holds the persistent-object payload; never executes embedded source."""

    def __init__(self, meta=None):
        self.meta = meta

    def __setstate__(self, state):
        self.meta = state


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def extract_pickle_state(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Open an NVlabs stylegan3 pickle without the stylegan3 repo and return
    {network_name: flat_state_dict} with dotted tensor names.

    The pickle's custom classes resolve to inert stubs; tensors inside
    deserialize through torch's own machinery.  Embedded source code in the
    persistence payloads is carried as data only.
    """
    import torch

    preserved = {}
    for name in ("torch_utils", "torch_utils.persistence", "dnnlib",
                 "dnnlib.util"):
        preserved[name] = sys.modules.get(name)
        mod = _stub_module(name)
        if name == "torch_utils.persistence":
            mod._reconstruct_persistent_obj = lambda meta: _PersistentStub(meta)
        if name == "dnnlib":
            class EasyDict(dict):
                __getattr__ = dict.get

                def __setattr__(self, k, v):
                    self[k] = v

            mod.EasyDict = EasyDict

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.startswith(("torch_utils", "dnnlib")):
                mod = sys.modules.get(module) or _stub_module(module)
                if not hasattr(mod, name):
                    setattr(mod, name, type(name, (_PersistentStub,), {}))
                return getattr(mod, name)
            return super().find_class(module, name)

    try:
        with open(path, "rb") as f:
            data = f.read()
        try:
            obj = _Unpickler(io.BytesIO(data)).load()
        except Exception:
            # zipfile-based torch.save containers
            obj = torch.load(io.BytesIO(data), map_location="cpu",
                             weights_only=False)
    finally:
        for name, mod in preserved.items():
            if mod is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = mod

    networks = {}
    if isinstance(obj, dict):
        for key, net in obj.items():
            flat: Dict[str, np.ndarray] = {}
            _walk_persistent(net, "", flat)
            if flat:
                networks[key] = flat
    return networks


def _walk_persistent(obj, prefix: str, out: Dict[str, np.ndarray]) -> None:
    """Collect tensors from nested persistent payloads / module states."""
    import torch

    if isinstance(obj, _PersistentStub):
        meta = obj.meta if isinstance(obj.meta, dict) else {}
        _walk_persistent(meta.get("state", meta), prefix, out)
        return
    if isinstance(obj, torch.Tensor):
        if prefix:
            out[prefix] = _t2np(obj)
        return
    if isinstance(obj, dict):
        for k, v in obj.items():
            if not isinstance(k, str) or k.startswith("__"):
                continue
            name = k
            if k in ("_parameters", "_buffers", "_modules", "state"):
                _walk_persistent(v, prefix, out)
                continue
            sub = f"{prefix}.{name}" if prefix else name
            _walk_persistent(v, sub, out)
        return
    if hasattr(obj, "__dict__") and not isinstance(obj, type):
        _walk_persistent(vars(obj), prefix, out)


# ----------------------------------------------------------------------- LPIPS
_VGG_TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_STAGE_OF_CONV = (
    (0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1), (2, 2),
    (3, 0), (3, 1), (3, 2), (4, 0), (4, 1), (4, 2),
)


def import_lpips_state(
    vgg_features_sd: Dict, lin_sd: Optional[Dict] = None
) -> Dict:
    """torchvision ``vgg16.features`` state dict (+ optional lpips ``linN``
    heads) -> params for ``train.lpips.LPIPS``."""
    vgg: Dict = {}
    for torch_idx, (si, ci) in zip(_VGG_TORCH_CONV_IDX, _VGG_STAGE_OF_CONV):
        vgg[f"conv{si}_{ci}"] = {
            "kernel": _conv_kernel(vgg_features_sd[f"{torch_idx}.weight"]),
            "bias": _t2np(vgg_features_sd[f"{torch_idx}.bias"]),
        }
    params: Dict = {"vgg": vgg}
    if lin_sd is not None:
        for li in range(5):
            w = lin_sd[f"lin{li}.model.1.weight"]  # [1, C, 1, 1]
            params[f"lin{li}"] = _t2np(w).reshape(-1)
    # without lin heads the caller keeps its initialized uniform weights
    return params
