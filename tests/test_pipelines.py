"""Serving pipelines on demo backends: sound-effect, voice-gen, dialogue,
duration estimation, metrics."""
import numpy as np
import pytest

from mosstts_tpu.engine.metrics import SynthesisMetrics
from mosstts_tpu.serve import text_norm
from mosstts_tpu.serve.backend import load_delay_backend
from mosstts_tpu.serve.pipelines import (
    generate_sound_effect,
    generate_voice,
    synthesize,
)


@pytest.fixture(scope="module")
def backend():
    return load_delay_backend()  # demo tiny random-init


def test_sound_effect_pipeline(backend):
    sr, wav, status = generate_sound_effect(
        backend, "rain on a tin roof", 1.0, temperature=0.0, seed=1
    )
    assert sr == 24000
    assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
    assert "tokens=12" in status  # 1.0s * 12.5 -> 12 tokens


def test_voice_gen_pipeline(backend):
    sr, wav, status = generate_voice(
        backend, "hello", "a deep calm voice", max_new_tokens=80,
        temperature=0.0, seed=1,
    )
    assert wav.size > 0 and np.isfinite(wav).all()


def test_synthesize_continuation_with_wav_reference(backend, tmp_path):
    from mosstts_tpu.utils.audio import write_wav

    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(24000) * 0.1).astype(np.float32)
    path = tmp_path / "ref.wav"
    write_wav(path, ref, 24000)
    sr, wav, _ = synthesize(
        backend, "continue", mode="Continuation", reference_audio=str(path),
        max_new_tokens=48, temperature=0.0,
    )
    assert wav.size > 0


def test_duration_estimation():
    lang, default, lo, hi = text_norm.estimate_duration_tokens("hello world")
    assert lang == "en" and lo <= default <= hi
    lang_zh, d_zh, _, _ = text_norm.estimate_duration_tokens("你好世界")
    assert lang_zh == "zh"
    # ZH factor ~3.1 tokens/char
    assert d_zh == int(4 * text_norm.ZH_TOKENS_PER_CHAR)


def test_metrics_report():
    m = SynthesisMetrics(sample_rate=24000)
    assert m.ttfa is None and m.rtf is None
    with m.span("prefill"):
        pass
    m.add_audio(24000)
    m.add_frames(13)
    r = m.report()
    assert r["audio_s"] == 1.0 and r["frames"] == 13
    assert r["ttfa_s"] is not None and "prefill" in r["spans"]
