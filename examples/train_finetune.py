#!/usr/bin/env python
"""Train / finetune example: all three TTS families + the codec, CPU-sized.

The reference ships no training code at all (SURVEY.md §0); this framework's
`TTSTrainer` drives the same pure-function losses the models serve with, so
a finetune is: load (or init) params -> iterate batches -> save in the
serving checkpoint format. Run on CPU with tiny configs:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/train_finetune.py

Swap in real grids (B, T, 1+n_vq) from `DelayProcessor` for actual data;
pass `mesh=make_mesh(data=2, model=4)` for a pod slice and `remat=True`
when the 8B config at real sequence lengths exceeds HBM.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from mosstts_tpu.core.config import DelayConfig, tiny_qwen3
from mosstts_tpu.train import TTSTrainer, synthetic_tts_batch


def main():
    cfg = DelayConfig(language_config=tiny_qwen3(), n_vq=4)
    trainer = TTSTrainer("delay", cfg, peak_lr=3e-3, warmup_steps=5,
                         total_steps=40, remat=True)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield synthetic_tts_batch("delay", cfg, rng, batch=2, seq=24)

    hist = trainer.fit(batches(), steps=40, log_every=10)
    print(f"loss {hist[0]['loss']:.3f} -> {hist[-1]['loss']:.3f}")

    out = Path("/tmp/mosstts_finetune_ckpt")
    trainer.save(str(out))
    print(f"saved serving-format checkpoint to {out}")

    # round-trip: the serving loader consumes the trainer's checkpoint
    from mosstts_tpu.engine.delay_engine import DelayEngine
    from mosstts_tpu.utils.save import load_model
    import jax.numpy as jnp

    params, loaded_cfg = load_model(out, dtype=jnp.float32)
    engine = DelayEngine(params, loaded_cfg, dtype=jnp.float32, cache_bucket=32)
    ids = rng.integers(0, 200, (1, 10, loaded_cfg.channels))
    ids[0, 2, 0] = loaded_cfg.im_start_token_id
    ids[0, -1, 0] = loaded_cfg.audio_assistant_gen_slot_token_id
    outs = engine.generate(ids, max_new_tokens=8,
                           text_temperature=0.0, audio_temperature=0.0)
    print(f"serving the finetuned checkpoint: grid {outs[0][1].shape}")


if __name__ == "__main__":
    main()
