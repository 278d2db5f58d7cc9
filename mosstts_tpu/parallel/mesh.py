"""Device mesh + sharding rules.

The reference has no distributed runtime (SURVEY.md S2.b: no
torch.distributed anywhere; multi-GPU is accelerate's sequential CPU
offload). Here parallelism is first-class: a ('data','model') mesh, tensor
parallelism over attention heads / FFN columns / vocab, batch (multi-stream
serving) on 'data'. Collectives are emitted by GSPMD from these shardings
and ride ICI.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: Optional[int] = None,
              devices=None, dcn: int = 1) -> Mesh:
    """('data', 'model') mesh over ``devices``.

    ``dcn > 1`` builds the cross-slice (fleet) mesh: ``dcn`` pod slices
    joined by data-center network, each slice an ICI domain of
    ``data//dcn x model`` chips. The axis names stay ('data', 'model') —
    every sharding rule in this module works unchanged — but the device
    order makes the 'data' axis MAJOR dimension cross the slice boundary,
    so the only collectives that ride DCN are the batch/gradient ones
    (params replicate over 'data'; an all-reduce over 'data' decomposes
    into intra-slice reduce + one cross-slice exchange), while every
    'model' (TP) collective stays inside one slice on ICI. This is the
    standard multislice recipe (jax mesh_utils hybrid meshes); on real
    multislice hardware the hybrid builder orders devices by slice id, and
    on homogeneous device sets (CPU simulation, single slice) contiguous
    groups of ``n/dcn`` devices stand in for slices.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None and model is None:
        model = n
        data = 1
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    if dcn > 1:
        if data % dcn != 0:
            raise ValueError(
                f"data={data} not divisible by dcn={dcn}: the cross-slice "
                "axis replicates the model dimension per slice")
        try:  # real multislice: order devices by slice via the hybrid builder
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                (data // dcn, model), (dcn, 1), devices=devices,
            )
        except Exception:
            # simulation / single-granule device sets: contiguous groups of
            # n/dcn devices act as slices; (dcn, data/dcn, model) collapsed
            # on the first two axes keeps slice-major order on 'data'
            arr = np.asarray(devices).reshape(dcn, data // dcn, model)
            arr = arr.reshape(data, model)
    else:
        arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def qwen3_param_specs() -> dict:
    """PartitionSpecs matching nn.qwen3 param layout. Attention heads and
    FFN columns shard on 'model'; norms replicate."""
    return {
        "layers": {
            "ln1": P(), "ln2": P(),
            "wq": P(None, None, "model"),
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),
            "q_norm": P(), "k_norm": P(),
            "w_gate": P(None, None, "model"),
            "w_up": P(None, None, "model"),
            "w_down": P(None, "model", None),
        },
        "final_norm": P(),
        "embed": P("model", None),
    }


def delay_param_specs() -> dict:
    base = qwen3_param_specs()
    return {
        "backbone": base,
        "audio_emb": P("model", None, None),  # shard over the 32 codebooks
        "text_head": P(None, "model"),  # vocab-column parallel
        "audio_heads": P("model", None, None),
    }


def local_param_specs() -> dict:
    base = {k: v for k, v in qwen3_param_specs().items() if k != "embed"}
    return {
        "text_emb": P("model", None),
        "audio_emb": P("model", None, None),
        "backbone": base,
        "local": base,
        "mlp_in": {"gate": P(None, "model"), "up": P(None, "model"), "down": P("model", None)},
        "mlp_out_text": {"gate": P(None, "model"), "up": P(None, "model"), "down": P("model", None)},
        "mlp_out_audio": {"gate": P(None, None, "model"), "up": P(None, None, "model"),
                          "down": P(None, "model", None)},
        "ln_text": P(), "ln_audio": P(),
        "text_head": P(None, "model"),
        "audio_heads": P("model", None, None),
    }


def realtime_param_specs() -> dict:
    base = {k: v for k, v in qwen3_param_specs().items() if k != "embed"}
    return {
        "text_emb": P("model", None),
        "audio_emb": P("model", None, None),
        "backbone": base,
        "local": base,
        "local_emb": P("model", None, None),
        "local_heads": P("model", None, None),
    }


def codec_param_specs() -> dict:
    base = {k: v for k, v in qwen3_param_specs().items() if k != "embed"}
    return {
        "enc_in": P(None, "model"),
        "encoder": base,
        "enc_out": P(None, None),
        "rvq": {"codebooks": P("model", None, None)},
        "dec_in": P(None, "model"),
        "decoder": base,
        "dec_out_norm": P(),
        "dec_out": P("model", None),
    }


def spec_for_path(specs, path) -> P:
    """Walk a (possibly partial) spec tree by dict-key path; anything not
    covered replicates."""
    node = specs
    for p in path:
        key = getattr(p, "key", None)
        if not isinstance(node, dict) or key not in node:
            return P()
        node = node[key]
    return node if isinstance(node, P) else P()


def shard_params(params, mesh: Mesh, specs):
    """device_put the param pytree with path-matched PartitionSpecs;
    missing paths replicate."""
    from jax.tree_util import tree_map_with_path

    def put(path, x):
        return jax.device_put(x, NamedSharding(mesh, spec_for_path(specs, path)))

    return tree_map_with_path(put, params)


def sharding_tree(params, mesh: Mesh, specs):
    """NamedSharding pytree matching ``params`` structure (for jit
    in_shardings/out_shardings)."""
    from jax.tree_util import tree_map_with_path

    return tree_map_with_path(
        lambda path, x: NamedSharding(mesh, spec_for_path(specs, path)), params
    )


def kv_cache_spec() -> P:
    """(L, B, KV, S, hd): batch on data, KV heads on model."""
    return P(None, "data", "model", None, None)


def batch_spec() -> P:
    return P("data")
