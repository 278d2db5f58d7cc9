"""Checkpoint name-mapping tables: reference HF checkpoints -> our pytrees.

Each loader consumes a reference-format state dict (safetensors shards of
the released checkpoints) and emits the stacked-array layout our models use.
Key names below are the reference's module paths:

Delay (moss_tts_delay/modeling_moss_tts.py:164-194):
    language_model.<qwen3>                      -> backbone
    emb_ext.{i}.weight        (i in 0..n_vq-1)  -> audio_emb[i]
    lm_heads.0.weight^T                         -> text_head
    lm_heads.{i}.weight^T     (i in 1..n_vq)    -> audio_heads[i-1]

Local (moss_tts_local/modeling_moss_tts.py:495-611):
    model.embedding_list.0.weight               -> text_emb
    model.embedding_list.{i}.weight             -> audio_emb[i-1]
    model.language_model.<qwen3>                -> backbone
    local_transformer.<qwen3-no-embed>          -> local
    speech_embedding_to_local_mlp.{gate,up,down}_proj.weight^T -> mlp_in
    local_to_speech_embedding_mlps.{i}....^T    -> mlp_out_text / mlp_out_audio[i-1]
    layer_norm_before_lm_heads.{i}.weight       -> ln_text / ln_audio[i-1]
    lm_heads.{i}.weight^T                       -> text_head / audio_heads[i-1]

Realtime (mossttsrealtime/modeling_mossttsrealtime.py:80-99,
modeling_mossttsrealtime_local.py:270-393):
    embed_tokens.0.weight                       -> text_emb
    embed_tokens.{i}.weight                     -> audio_emb[i-1]
    language_model.<qwen3>                      -> backbone
    local_transformer.model.<qwen3-no-embed>    -> local
    local_transformer.model.embed_tokens.{i}.weight -> local_emb[i]
    local_transformer.local_lm_heads.{i}.weight^T   -> local_heads[i]
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ..core.config import DelayConfig, LocalConfig, RealtimeConfig
from .hf_loader import _to_np, load_safetensors_dir, qwen3_params_from_state_dict, stack_rows


def _t(sd, name, dtype):
    return jnp.asarray(_to_np(sd[name]).T, dtype)


def _a(sd, name, dtype):
    return jnp.asarray(_to_np(sd[name]), dtype)


def delay_params_from_state_dict(sd: Mapping[str, Any], cfg: DelayConfig,
                                 dtype=jnp.bfloat16):
    return {
        "backbone": qwen3_params_from_state_dict(
            sd, cfg.language_config, prefix="language_model.", dtype=dtype
        ),
        "audio_emb": stack_rows(sd, "emb_ext.{i}.weight", cfg.n_vq, dtype=dtype),
        "text_head": _t(sd, "lm_heads.0.weight", dtype),
        "audio_heads": jnp.stack(
            [_t(sd, f"lm_heads.{i}.weight", dtype) for i in range(1, cfg.n_vq + 1)]
        ),
    }


def local_params_from_state_dict(sd: Mapping[str, Any], cfg: LocalConfig,
                                 dtype=jnp.bfloat16):
    def mlp(prefix, n=None):
        if n is None:
            return {
                "gate": _t(sd, f"{prefix}.gate_proj.weight", dtype),
                "up": _t(sd, f"{prefix}.up_proj.weight", dtype),
                "down": _t(sd, f"{prefix}.down_proj.weight", dtype),
            }
        return {
            "gate": stack_rows(sd, prefix + ".{i}.gate_proj.weight", n, transpose=True, dtype=dtype),
            "up": stack_rows(sd, prefix + ".{i}.up_proj.weight", n, transpose=True, dtype=dtype),
            "down": stack_rows(sd, prefix + ".{i}.down_proj.weight", n, transpose=True, dtype=dtype),
        }

    # local_to_speech mlps / norms / heads index 0 = text channel, 1.. = audio
    def shifted(fmt, count, transpose=False):
        mats = [_to_np(sd[fmt.format(i=i + 1)]) for i in range(count)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), dtype)

    return {
        "text_emb": _a(sd, "model.embedding_list.0.weight", dtype),
        "audio_emb": jnp.stack(
            [_a(sd, f"model.embedding_list.{i}.weight", dtype) for i in range(1, cfg.n_vq + 1)]
        ),
        "backbone": qwen3_params_from_state_dict(
            sd, cfg.language_config, prefix="model.language_model.", dtype=dtype
        ),
        "local": qwen3_params_from_state_dict(
            sd, cfg.local_transformer_config, prefix="local_transformer.", dtype=dtype,
            with_embed=False,
        ),
        "mlp_in": mlp("speech_embedding_to_local_mlp"),
        "mlp_out_text": mlp("local_to_speech_embedding_mlps.0"),
        "mlp_out_audio": {
            "gate": shifted("local_to_speech_embedding_mlps.{i}.gate_proj.weight", cfg.n_vq, True),
            "up": shifted("local_to_speech_embedding_mlps.{i}.up_proj.weight", cfg.n_vq, True),
            "down": shifted("local_to_speech_embedding_mlps.{i}.down_proj.weight", cfg.n_vq, True),
        },
        "ln_text": _a(sd, "layer_norm_before_lm_heads.0.weight", dtype),
        "ln_audio": shifted("layer_norm_before_lm_heads.{i}.weight", cfg.n_vq),
        "text_head": _t(sd, "lm_heads.0.weight", dtype),
        "audio_heads": shifted("lm_heads.{i}.weight", cfg.n_vq, True),
    }


def realtime_params_from_state_dict(sd: Mapping[str, Any], cfg: RealtimeConfig,
                                    dtype=jnp.bfloat16):
    from ..models.realtime import local_qwen_cfg

    return {
        "text_emb": _a(sd, "embed_tokens.0.weight", dtype),
        "audio_emb": jnp.stack(
            [_a(sd, f"embed_tokens.{i}.weight", dtype) for i in range(1, cfg.rvq + 1)]
        ),
        "backbone": qwen3_params_from_state_dict(
            sd, cfg.language_config, prefix="language_model.", dtype=dtype
        ),
        "local": qwen3_params_from_state_dict(
            sd, local_qwen_cfg(cfg.local_config),
            prefix="local_transformer.model.", dtype=dtype, with_embed=False,
        ),
        "local_emb": stack_rows(
            sd, "local_transformer.model.embed_tokens.{i}.weight", cfg.rvq - 1, dtype=dtype
        ),
        "local_heads": stack_rows(
            sd, "local_transformer.local_lm_heads.{i}.weight", cfg.rvq,
            transpose=True, dtype=dtype,
        ),
    }


def load_delay_checkpoint(path: str | Path, dtype=jnp.bfloat16):
    path = Path(path)
    cfg = DelayConfig.from_json(path / "config.json")
    sd = load_safetensors_dir(path)
    return delay_params_from_state_dict(sd, cfg, dtype), cfg


def load_local_checkpoint(path: str | Path, dtype=jnp.bfloat16):
    path = Path(path)
    cfg = LocalConfig.from_json(path / "config.json")
    sd = load_safetensors_dir(path)
    return local_params_from_state_dict(sd, cfg, dtype), cfg


def load_realtime_checkpoint(path: str | Path, dtype=jnp.bfloat16):
    path = Path(path)
    cfg = RealtimeConfig.from_json(path / "config.json")
    sd = load_safetensors_dir(path)
    return realtime_params_from_state_dict(sd, cfg, dtype), cfg
