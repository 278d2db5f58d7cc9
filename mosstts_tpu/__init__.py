"""mosstts-tpu: TPU-native MOSS-TTS-family speech & sound generation.

Public surface:
    core.config        — Delay/Local/Realtime/Codec configs (HF-json ingest)
    codec.model        — MossAudioTokenizer (encode/decode/streaming)
    engine.*           — DelayEngine / LocalEngine / RealtimeEngine + streaming
    processing.*       — processors + tokenizer protocol
    serve.*            — pipelines, CLI, HTTP server, gradio apps
    utils.checkpoints  — reference-checkpoint loaders
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    CodecConfig,
    DelayConfig,
    LocalConfig,
    Qwen3Config,
    RealtimeConfig,
    RealtimeLocalConfig,
)
