"""Framework-native checkpoint save/load: param pytrees <-> safetensors +
config.json (our layout), for all model families.

Complements utils/checkpoints.py (which ingests the reference's HF layout):
models fine-tuned or trained in this framework round-trip through here; the
codec has its own identical-format save in codec/model.py.
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten_pytree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, prefix + str(k) + "."))
    else:
        # C-contiguous host copy: device_get views can be F-ordered and
        # safetensors writes raw bytes assuming C order
        arr = np.ascontiguousarray(jax.device_get(tree))
        if arr.dtype == jnp.bfloat16:
            # store bf16 via uint16 bit pattern + sidecar dtype marker
            out[prefix[:-1] + "::bf16"] = arr.view(np.uint16)
        else:
            out[prefix[:-1]] = arr
    return out


def unflatten_pytree(flat: Dict[str, np.ndarray], dtype=None):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        if key.endswith("::bf16"):
            key = key[: -len("::bf16")]
            val = jnp.asarray(val).view(jnp.bfloat16)
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val, dtype) if dtype is not None else jnp.asarray(val)
    return tree


def save_model(path: str | Path, params, config, model_type: str) -> None:
    """Write <path>/model.safetensors + config.json (with model_type)."""
    from safetensors.numpy import save_file

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = dataclasses.asdict(config)
    cfg["model_type"] = model_type
    with open(path / "config.json", "w") as f:
        json.dump(cfg, f, indent=2)
    save_file(flatten_pytree(params), str(path / "model.safetensors"))


def load_model(path: str | Path, dtype=None):
    """Returns (params, config_dict) — config class chosen by model_type."""
    from safetensors.numpy import load_file

    from ..core.config import DelayConfig, LocalConfig, RealtimeConfig

    path = Path(path)
    with open(path / "config.json") as f:
        cfg_dict = json.load(f)
    model_type = cfg_dict.pop("model_type", "moss_tts_delay")
    cls = {
        "moss_tts_delay": DelayConfig,
        "moss_tts_local": LocalConfig,
        "moss_tts_realtime": RealtimeConfig,
    }[model_type]
    config = cls.from_hf_dict(cfg_dict)
    flat = {
        k: np.array(v, copy=True)
        for k, v in load_file(str(path / "model.safetensors")).items()
    }
    return unflatten_pytree(flat, dtype), config
