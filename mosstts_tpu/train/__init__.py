from .trainer import TTSTrainer, synthetic_tts_batch  # noqa: F401
