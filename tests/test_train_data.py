"""Training data pipeline: manifest -> codec-encoded delay grids ->
bucketed left-padded batches -> a real train step."""
import json
import wave
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mosstts_tpu.codec.model import MossAudioTokenizer
from mosstts_tpu.core.config import CodecConfig, DelayConfig, tiny_qwen3
from mosstts_tpu.processing.delay_processor import DelayProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer
from mosstts_tpu.train import TTSTrainer
from mosstts_tpu.train.data import BucketedLoader, TTSDataset, load_manifest

CFG = DelayConfig(language_config=tiny_qwen3(), n_vq=4)


def _write_wav(path: Path, seconds: float, sr: int = 24000, f0: float = 220.0):
    t = np.arange(int(seconds * sr)) / sr
    x = (0.3 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    pcm = (x * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rows = []
    for i, sec in enumerate((0.4, 0.6, 0.9)):
        name = f"clip_{i}.wav"
        _write_wav(root / name, sec, f0=200.0 + 40 * i)
        rows.append({"text": f"sample utterance number {i}", "audio": name})
    manifest = root / "train.jsonl"
    manifest.write_text("\n".join(json.dumps(r) for r in rows))
    codec = MossAudioTokenizer.random_init(
        seed=0, config=CodecConfig(
            hidden_size=64, intermediate_size=128, num_encoder_layers=1,
            num_decoder_layers=1, num_attention_heads=2,
            num_key_value_heads=2, head_dim=32, n_q=CFG.n_vq,
            codebook_dim=64))
    proc = DelayProcessor(ByteFallbackTokenizer(), codec, CFG)
    return manifest, proc


def test_manifest_and_dataset(corpus):
    manifest, proc = corpus
    rows = load_manifest(manifest)
    assert len(rows) == 3 and Path(rows[0]["audio"]).is_absolute()
    ds = TTSDataset(rows, proc, proc.audio_tokenizer, n_vq=CFG.n_vq)
    ex = ds.example(0)
    ids, labels = ex["input_ids"], ex["labels"]
    assert ids.ndim == 2 and ids.shape[1] == CFG.channels
    # prompt region ignored, assistant region trained
    trained = labels[:, 0] != -100
    assert 0 < trained.sum() < ids.shape[0]
    # the delay ramp's audio pads must never be labels: the model masks
    # the pad logit to -inf, so a pad label means an infinite loss
    assert (labels[..., 1:] != proc.config.audio_pad_code).all()
    # the trained region is a suffix (teacher forcing from last im_start+3)
    first = int(np.nonzero(trained)[0][0])
    assert trained[first:].all()
    live = labels != -100
    np.testing.assert_array_equal(labels[live], ids[live])


def test_bucketed_loader_and_train_step(corpus):
    manifest, proc = corpus
    ds = TTSDataset(load_manifest(manifest), proc, proc.audio_tokenizer,
                    n_vq=CFG.n_vq)
    loader = BucketedLoader(ds, batch_size=2, bucket=16, prefetch=2, seed=1)
    it = iter(loader)
    batches = [next(it) for _ in range(4)]  # crosses an epoch boundary
    for b in batches:
        B, T, C = b["input_ids"].shape
        assert T % 16 == 0 and C == CFG.channels
        assert b["attention_mask"].shape == (B, T)
        assert b["labels"].shape == (B, T, C)
        # left padding: invalid prefix, valid suffix
        for row_mask in b["attention_mask"]:
            v = np.nonzero(row_mask)[0]
            assert len(v) > 0 and row_mask[v[0]:].all()
        # padding never trains
        assert (b["labels"][~b["attention_mask"]] == -100).all()

    trainer = TTSTrainer("delay", CFG, peak_lr=1e-3, warmup_steps=1,
                         total_steps=4)
    rec = trainer.train_step(batches[0])
    assert np.isfinite(rec["loss"])
    # ln(152k) text + ln(1024) audio bounds an untrained model's CE; a
    # blow-up here means a masked-logit token leaked into the labels
    assert rec["loss"] < 15.0, rec
