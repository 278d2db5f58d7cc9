"""Codec tests: RVQ machinery, encode/decode contract, streaming parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mosstts_tpu.core.config import CodecConfig
from mosstts_tpu.codec.rvq import init_rvq_params, rvq_decode, rvq_encode
from mosstts_tpu.codec.model import MossAudioTokenizer

TINY = CodecConfig(
    sampling_rate=1600,
    frame_rate=12.5,  # hop = 128
    n_q=4,
    codebook_size=32,
    codebook_dim=8,
    hidden_size=32,
    intermediate_size=64,
    num_encoder_layers=2,
    num_decoder_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    head_dim=16,
    causal_context=8,
)


@pytest.fixture(scope="module")
def codec():
    return MossAudioTokenizer.random_init(seed=0, config=TINY)


def test_rvq_residual_decreases():
    rng = jax.random.PRNGKey(0)
    params = init_rvq_params(rng, 8, 64, 16)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    errs = []
    for nq in (1, 2, 4, 8):
        codes, quant = rvq_encode(params, lat, nq)
        assert codes.shape == (nq, 2, 5)
        assert int(codes.min()) >= 0 and int(codes.max()) < 64
        errs.append(float(jnp.mean((lat - quant) ** 2)))
        # decode(encode) reproduces the quantized latent exactly
        dec = rvq_decode(params, codes)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(quant), atol=1e-5)
    assert errs[0] > errs[1] > errs[2] > errs[3]


def test_encode_decode_contract(codec):
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.1 for n in (1000, 413)]
    enc = codec.batch_encode(wavs, num_quantizers=4)
    assert enc.audio_codes.shape[0] == 4
    assert enc.audio_codes.shape[1] == 2
    np.testing.assert_array_equal(enc.audio_codes_lengths, [8, 4])  # ceil(n/128)

    T = int(enc.audio_codes_lengths.max())
    mask = np.zeros((2, T), bool)
    mask[0, :8] = True
    mask[1, :4] = True
    dec = codec.decode(enc.audio_codes[:, :, :T], padding_mask=mask, chunk_duration=0.24)
    assert dec.audio.shape[0] == 2 and dec.audio.shape[1] == 1
    np.testing.assert_array_equal(dec.audio_lengths, [8 * 128, 4 * 128])
    assert np.isfinite(dec.audio).all()


def test_chunked_encode_matches_oneshot(codec):
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(128 * 13).astype(np.float32) * 0.1
    one = codec._encode_array(wav[None], 4, chunk_frames=64)
    chunked = codec._encode_array(wav[None], 4, chunk_frames=3)
    np.testing.assert_array_equal(one, chunked)


def test_streaming_decode_matches_batch(codec):
    rng = np.random.default_rng(2)
    codes = rng.integers(0, TINY.codebook_size, size=(4, 17)).astype(np.int64)
    full = codec.decode(codes, chunk_duration=None)["audio"][0]

    with codec.streaming(batch_size=1):
        parts = []
        for s in range(0, 17, 5):
            chunk = codes[:, s : s + 5]
            parts.append(codec.decode(chunk, chunk_duration=0.4)["audio"][0])
    stream = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(stream, full, atol=1e-4)


def test_save_load_roundtrip(codec, tmp_path):
    codec.save_pretrained(tmp_path / "codec")
    loaded = MossAudioTokenizer.from_pretrained(tmp_path / "codec")
    rng = np.random.default_rng(3)
    codes = rng.integers(0, TINY.codebook_size, size=(4, 6)).astype(np.int64)
    a = codec.decode(codes, chunk_duration=None)["audio"][0]
    b = loaded.decode(codes, chunk_duration=None)["audio"][0]
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert loaded.codebook_size == TINY.codebook_size


def test_quantized_codec_runs(codec):
    """int8 weight-only serving layout for the codec (the 1.6B parity-scale
    preset must serve quantized to fit alongside a backbone): encode/decode/
    streaming all run over QuantWeight matmuls, and outputs stay close to
    the float path."""
    from mosstts_tpu.ops.quant import QuantWeight, quantize_tree

    qcodec = MossAudioTokenizer(quantize_tree(codec.params), codec.config)
    assert isinstance(qcodec.params["enc_in"], QuantWeight)
    rng = np.random.default_rng(5)
    wav = rng.standard_normal(4800).astype(np.float32) * 0.1

    enc = qcodec.batch_encode([wav], num_quantizers=TINY.n_q)
    assert enc.audio_codes.shape[0] == TINY.n_q
    dec = qcodec.decode(enc.audio_codes, chunk_duration=None)
    out = np.asarray(dec.audio)
    assert np.isfinite(out).all()

    ref = codec.decode(enc.audio_codes, chunk_duration=None)
    refa = np.asarray(ref.audio)
    # int8 weights perturb but must not destroy the reconstruction
    denom = np.abs(refa).mean() + 1e-6
    assert np.abs(out - refa).mean() / denom < 0.5

    with qcodec.streaming(batch_size=1):
        chunk = np.asarray(enc.audio_codes)[:, 0, :6]
        w = qcodec.decode(chunk, chunk_duration=None)["audio"][0]
    assert np.isfinite(w).all()
