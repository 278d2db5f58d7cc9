"""MossTTSLocal: depth-decode consistency and end-to-end generation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mosstts_tpu.core.config import LocalConfig, tiny_qwen3
from mosstts_tpu.engine.local_engine import LocalEngine
from mosstts_tpu.models.local import (
    _depth_decode,
    init_local_params,
    make_local_sampling,
)
from mosstts_tpu.processing.local_processor import LocalProcessor
from mosstts_tpu.processing.tokenizer import ByteFallbackTokenizer

CFG = LocalConfig(
    language_config=tiny_qwen3(),
    n_vq=4,
    additional_mlp_ffn_hidden_size=32,
    local_ffn_hidden_size=48,
    local_hidden_size=24,
    local_num_layers=2,
)


@pytest.fixture(scope="module")
def engine():
    return LocalEngine.random_init(seed=0, config=CFG, dtype=jnp.float32, cache_bucket=32)


def test_depth_cached_matches_uncached(engine):
    """Our O(Nq) cached depth decode must equal the reference's O(Nq^2)
    uncached recompute: rerun each prefix from scratch and compare logits
    argmax chain (greedy)."""
    from mosstts_tpu.nn.qwen3 import qwen3_forward
    from mosstts_tpu.ops.basic import dense, rms_norm
    from mosstts_tpu.models.local import _mlp

    params = engine.params
    cfg = CFG
    lcfg = cfg.local_transformer_config
    B = 2
    g = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.language_config.hidden_size))
    sampling = make_local_sampling(None, [False] * cfg.channels, cfg.channels)
    seen_text = jnp.zeros((B, cfg.language_config.vocab_size), jnp.bool_)
    seen_audio = jnp.zeros((B, cfg.n_vq, cfg.audio_emb_vocab), jnp.bool_)

    tok0, audio = _depth_decode(
        params, cfg, jax.random.PRNGKey(0), g, sampling, seen_text, seen_audio,
        n_vq_infer=cfg.n_vq,
    )

    # Reference-style uncached recompute (from-spec oracle of :390-427)
    x_list = [_mlp(params["mlp_in"], g)]
    want = []
    for k in range(cfg.channels):
        inputs = jnp.stack(x_list, axis=1)  # (B, t, Dl)
        t = inputs.shape[1]
        h, _ = qwen3_forward(
            params["local"], lcfg, inputs,
            positions=jnp.broadcast_to(jnp.arange(t)[None], (B, t)).astype(jnp.int32),
            kv_valid=jnp.ones((B, t), jnp.bool_),
            use_rope=False,
        )
        last = h[:, -1]
        if k == 0:
            y = rms_norm(_mlp(params["mlp_out_text"], last), params["ln_text"], lcfg.rms_norm_eps)
            logits = dense(y, params["text_head"])
            tok = jnp.argmax(logits, axis=-1)
            emb = jnp.take(params["text_emb"], tok, axis=0)
        else:
            y = _mlp(params["mlp_out_audio"], last, idx=k - 1)
            y = rms_norm(y, params["ln_audio"][k - 1], lcfg.rms_norm_eps)
            logits = dense(y, params["audio_heads"][k - 1])
            logits = logits.at[:, cfg.audio_pad_code].set(-1e30)
            tok = jnp.argmax(logits, axis=-1)
            emb = jnp.take(params["audio_emb"][k - 1], tok, axis=0)
        want.append(np.asarray(tok))
        x_list.append(_mlp(params["mlp_in"], emb))

    np.testing.assert_array_equal(np.asarray(tok0), want[0])
    for k in range(cfg.n_vq):
        np.testing.assert_array_equal(np.asarray(audio[:, k]), want[k + 1])


def test_local_generate_e2e(engine):
    tok = ByteFallbackTokenizer()
    proc = LocalProcessor(tok, audio_tokenizer=None, config=CFG)
    batch = proc([[proc.build_user_message(text="hi")]], mode="generation")
    out = engine.generate(
        batch["input_ids"], batch["attention_mask"],
        max_new_tokens=6,
        do_samples=[False] * CFG.channels,
        n_vq_for_inference=CFG.n_vq,
    )
    start_length, ids = out[0]
    assert ids.shape[1] == CFG.channels
    # voice-clone-free generation: prompt ends at the appended audio_start,
    # so start_length == 0 (reference :472)
    assert start_length == 0
    assert ids[0, 0] == CFG.audio_start_token_id
    # determinism
    out2 = engine.generate(
        batch["input_ids"], batch["attention_mask"],
        max_new_tokens=6, do_samples=[False] * CFG.channels,
    )
    np.testing.assert_array_equal(out[0][1], out2[0][1])


def test_variable_bitrate(engine):
    tok = ByteFallbackTokenizer()
    proc = LocalProcessor(tok, audio_tokenizer=None, config=CFG)
    batch = proc([[proc.build_user_message(text="hi")]], mode="generation")
    out = engine.generate(
        batch["input_ids"], batch["attention_mask"],
        max_new_tokens=4, do_samples=[False] * CFG.channels,
        n_vq_for_inference=2,
    )
    ids = out[0][1]
    gen = ids[1:]  # after audio_start row
    # channels beyond n_vq_for_inference are zero-filled (reference :425-427)
    assert (gen[:, 3:] == 0).all()


def test_local_engine_quantized_generate():
    """int8 weight-only serving for the Local family: the per-channel depth
    scan slices STACKED QuantWeights with a traced index (take_weight keeps
    q and scale paired; plain [idx] on the NamedTuple would grab a field).
    Greedy quantized generation must run and emit a valid grid."""
    import jax.numpy as jnp
    from mosstts_tpu.engine.local_engine import LocalEngine

    cfg = CFG
    engine = LocalEngine.random_init(seed=0, config=cfg, dtype=jnp.float32)
    engine.quantize("int8")
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 500, (2, 8, cfg.channels))
    ids[:, 3, 0] = cfg.audio_start_token_id
    outs = engine.generate(ids, max_new_tokens=6,
                           eos_token_id=cfg.audio_end_token_id, seed=0)
    for start, grid in outs:
        assert grid.shape[1] == cfg.channels
        assert np.isfinite(grid).all()
        assert (grid[:, 1:] >= 0).all()
