"""End-to-end Delay slice on CPU with a tiny random model + tiny codec:
conversation -> grid -> jitted generate -> decode -> waveform.
(BASELINE config 2 smoke; fake-backend strategy per SURVEY.md S4.3.)"""
import numpy as np
import jax.numpy as jnp
import pytest

from mosstts_tpu.core.config import CodecConfig, DelayConfig, tiny_qwen3
from mosstts_tpu.codec.model import MossAudioTokenizer
from mosstts_tpu.engine.delay_engine import DelayEngine
from mosstts_tpu.processing.delay_processor import DelayProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer

CFG = DelayConfig(language_config=tiny_qwen3(), n_vq=4)
CODEC_CFG = CodecConfig(
    sampling_rate=24000, frame_rate=12.5, n_q=4, codebook_size=1024,
    codebook_dim=8, hidden_size=32, intermediate_size=64,
    num_encoder_layers=1, num_decoder_layers=1, num_attention_heads=2,
    num_key_value_heads=2, head_dim=16, causal_context=8,
)


@pytest.fixture(scope="module")
def stack():
    codec = MossAudioTokenizer.random_init(seed=0, config=CODEC_CFG)
    proc = DelayProcessor(ByteFallbackTokenizer(), audio_tokenizer=codec, config=CFG)
    engine = DelayEngine.random_init(seed=0, config=CFG, dtype=jnp.float32, cache_bucket=64)
    return codec, proc, engine


def test_continuation_e2e(stack):
    codec, proc, engine = stack
    rng = np.random.default_rng(0)
    prompt_wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)  # 1 s
    codes = proc.encode_audios_from_wav([prompt_wav], 24000, n_vq=4)[0]
    assert codes.shape == (13, 4)  # ceil(24000/1920) frames

    conv = [
        proc.build_user_message(text="say something"),
        proc.build_assistant_message([codes]),
    ]
    batch = proc([conv], mode="continuation")
    out = engine.generate(
        batch["input_ids"], batch["attention_mask"],
        max_new_tokens=24,
        text_temperature=0.0, audio_temperature=0.0,  # greedy
    )
    assert len(out) == 1
    start_length, ids = out[0]
    assert ids.shape[1] == 5
    # continuation forces is_audio: until audio_end, generated text tokens
    # can only be gen/delay slots; afterwards sampling is free-vocab again
    gen_text = list(map(int, ids[start_length:, 0]))
    assert CFG.audio_end_token_id in gen_text
    end_i = gen_text.index(CFG.audio_end_token_id)
    allowed = {
        CFG.audio_assistant_gen_slot_token_id,
        CFG.audio_assistant_delay_slot_token_id,
    }
    assert set(gen_text[:end_i]).issubset(allowed)
    # the delay flush is exactly n_vq delay slots
    assert gen_text[:end_i].count(CFG.audio_assistant_delay_slot_token_id) == CFG.n_vq

    msgs = proc.decode(out)
    assert msgs[0] is not None
    assert len(msgs[0].audio_codes_list) >= 1
    wav = msgs[0].audio_codes_list[0]
    assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()


def test_greedy_determinism(stack):
    _, proc, engine = stack
    conv = [proc.build_user_message(text="hello world")]
    batch = proc([conv], mode="generation")
    a = engine.generate(batch["input_ids"], batch["attention_mask"],
                        max_new_tokens=8, text_temperature=0.0, audio_temperature=0.0)
    b = engine.generate(batch["input_ids"], batch["attention_mask"],
                        max_new_tokens=8, text_temperature=0.0, audio_temperature=0.0)
    np.testing.assert_array_equal(a[0][1], b[0][1])
    assert a[0][0] == b[0][0]


def test_host_loop_matches_on_device(stack):
    _, proc, engine = stack
    conv = [proc.build_user_message(text="check parity")]
    batch = proc([conv], mode="generation")
    host = engine.generate(batch["input_ids"], batch["attention_mask"],
                           max_new_tokens=10, text_temperature=0.0, audio_temperature=0.0)
    dev = engine.generate(batch["input_ids"], batch["attention_mask"],
                          max_new_tokens=10, text_temperature=0.0, audio_temperature=0.0,
                          on_device=True)
    np.testing.assert_array_equal(host[0][1], dev[0][1])
