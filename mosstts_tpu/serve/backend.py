"""Backend loading for the serving layer.

Replaces the reference's lru_cached HF ``from_pretrained`` loaders
(clis/moss_tts_app.py:80-141). A backend comes from a real checkpoint
directory (safetensors + config.json + tokenizer) or ``demo`` random-init
(tiny configs, offline byte tokenizer) so every pipeline runs without
weights.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax.numpy as jnp

from ..codec.model import MossAudioTokenizer
from ..core.config import CodecConfig, DelayConfig, LocalConfig, RealtimeConfig, tiny_qwen3
from ..engine.delay_engine import DelayEngine
from ..engine.local_engine import LocalEngine
from ..engine.realtime_engine import RealtimeEngine
from ..processing.delay_processor import DelayProcessor
from ..processing.local_processor import LocalProcessor
from ..processing.realtime_processor import RealtimeProcessor
from ..processing.tokenizer import load_tokenizer
from .pipelines import DelayBackend

_DEMO_CODEC = CodecConfig(
    n_q=32, codebook_size=1024, codebook_dim=16, hidden_size=64,
    intermediate_size=128, num_encoder_layers=2, num_decoder_layers=2,
    num_attention_heads=4, num_key_value_heads=4, head_dim=16, causal_context=32,
)


def load_codec(codec_path: Optional[str], dtype=jnp.float32) -> MossAudioTokenizer:
    if codec_path and Path(codec_path).exists():
        return MossAudioTokenizer.from_pretrained(codec_path, dtype=dtype)
    return MossAudioTokenizer.random_init(seed=0, config=_DEMO_CODEC, dtype=dtype)


@functools.lru_cache(maxsize=2)
def load_delay_backend(
    model_path: Optional[str] = None,
    codec_path: Optional[str] = None,
    dtype_str: str = "bfloat16",
) -> DelayBackend:
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    codec = load_codec(codec_path)
    if model_path and Path(model_path).exists():
        from ..utils.checkpoints import load_delay_checkpoint

        params, cfg = load_delay_checkpoint(model_path, dtype)
        tokenizer = load_tokenizer(model_path)
        engine = DelayEngine(params, cfg, dtype=dtype)
    else:
        cfg = DelayConfig(language_config=tiny_qwen3(hidden_size=128), n_vq=_DEMO_CODEC.n_q)
        engine = DelayEngine.random_init(seed=0, config=cfg, dtype=jnp.float32)
        tokenizer = load_tokenizer(None)
    proc = DelayProcessor(tokenizer, audio_tokenizer=codec, config=cfg)
    demo = not (model_path and Path(model_path).exists())
    return DelayBackend(engine=engine, processor=proc,
                        sample_rate=cfg.sampling_rate, demo=demo)


@functools.lru_cache(maxsize=2)
def load_local_backend(
    model_path: Optional[str] = None,
    codec_path: Optional[str] = None,
    dtype_str: str = "bfloat16",
):
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    codec = load_codec(codec_path)
    if model_path and Path(model_path).exists():
        from ..utils.checkpoints import load_local_checkpoint

        params, cfg = load_local_checkpoint(model_path, dtype)
        tokenizer = load_tokenizer(model_path)
        engine = LocalEngine(params, cfg, dtype=dtype)
    else:
        cfg = LocalConfig(
            language_config=tiny_qwen3(hidden_size=128), n_vq=_DEMO_CODEC.n_q,
            additional_mlp_ffn_hidden_size=64, local_ffn_hidden_size=96,
            local_hidden_size=48, local_num_layers=2,
        )
        engine = LocalEngine.random_init(seed=0, config=cfg, dtype=jnp.float32)
        tokenizer = load_tokenizer(None)
    proc = LocalProcessor(tokenizer, audio_tokenizer=codec, config=cfg)
    return DelayBackend(engine=engine, processor=proc, sample_rate=cfg.sampling_rate)


@functools.lru_cache(maxsize=2)
def load_realtime_backend(
    model_path: Optional[str] = None,
    codec_path: Optional[str] = None,
    dtype_str: str = "bfloat16",
):
    dtype = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
    codec = load_codec(codec_path)
    if model_path and Path(model_path).exists():
        from ..utils.checkpoints import load_realtime_checkpoint

        params, cfg = load_realtime_checkpoint(model_path, dtype)
        tokenizer = load_tokenizer(model_path)
        engine = RealtimeEngine(params, cfg, dtype=dtype)
    else:
        from ..core.config import RealtimeLocalConfig

        cfg = RealtimeConfig(
            language_config=tiny_qwen3(hidden_size=64),
            local_config=RealtimeLocalConfig(
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, head_dim=16,
                rvq=_DEMO_CODEC.n_q // 2,
            ),
            rvq=_DEMO_CODEC.n_q // 2,
        )
        engine = RealtimeEngine.random_init(seed=0, config=cfg, dtype=jnp.float32)
        tokenizer = load_tokenizer(None)
    proc = RealtimeProcessor(tokenizer, channels=cfg.rvq)
    return engine, proc, codec
