from .trainer import TTSTrainer, synthetic_tts_batch  # noqa: F401
from .checkpoint import restore_train_state, save_train_state  # noqa: F401
