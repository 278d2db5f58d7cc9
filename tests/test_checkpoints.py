"""Checkpoint plumbing: our-layout save/load round trip; reference-layout
name-map ingestion (synthetic state dicts with the reference's module paths)."""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import (
    DelayConfig,
    RealtimeConfig,
    RealtimeLocalConfig,
    tiny_qwen3,
)
from mosstts_tpu.models.delay import delay_forward, init_delay_params
from mosstts_tpu.utils.save import load_model, save_model
from mosstts_tpu.utils.checkpoints import (
    delay_params_from_state_dict,
    realtime_params_from_state_dict,
)

CFG = DelayConfig(language_config=tiny_qwen3(vocab_size=300), n_vq=4)


def test_save_load_roundtrip(tmp_path):
    params = init_delay_params(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    save_model(tmp_path / "m", params, CFG, "moss_tts_delay")
    loaded, cfg2 = load_model(tmp_path / "m")
    assert cfg2.n_vq == CFG.n_vq
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )


def _qwen3_sd(prefix, cfg, rng):
    sd = {}
    D, hd = cfg.hidden_size, cfg.head_dim
    sd[f"{prefix}embed_tokens.weight"] = rng.standard_normal((cfg.vocab_size, D)).astype(np.float32)
    for i in range(cfg.num_hidden_layers):
        p = f"{prefix}layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(D, np.float32)
        sd[p + "self_attn.q_proj.weight"] = rng.standard_normal((cfg.q_dim, D)).astype(np.float32)
        sd[p + "self_attn.k_proj.weight"] = rng.standard_normal((cfg.kv_dim, D)).astype(np.float32)
        sd[p + "self_attn.v_proj.weight"] = rng.standard_normal((cfg.kv_dim, D)).astype(np.float32)
        sd[p + "self_attn.o_proj.weight"] = rng.standard_normal((D, cfg.q_dim)).astype(np.float32)
        sd[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        sd[p + "mlp.gate_proj.weight"] = rng.standard_normal((cfg.intermediate_size, D)).astype(np.float32)
        sd[p + "mlp.up_proj.weight"] = rng.standard_normal((cfg.intermediate_size, D)).astype(np.float32)
        sd[p + "mlp.down_proj.weight"] = rng.standard_normal((D, cfg.intermediate_size)).astype(np.float32)
    sd[f"{prefix}norm.weight"] = np.ones(D, np.float32)
    return sd


def test_delay_reference_layout_ingest():
    rng = np.random.default_rng(0)
    lc = CFG.language_config
    sd = _qwen3_sd("language_model.", lc, rng)
    for i in range(CFG.n_vq):
        sd[f"emb_ext.{i}.weight"] = rng.standard_normal(
            (CFG.audio_emb_vocab, lc.hidden_size)).astype(np.float32)
    sd["lm_heads.0.weight"] = rng.standard_normal((lc.vocab_size, lc.hidden_size)).astype(np.float32)
    for i in range(1, CFG.n_vq + 1):
        sd[f"lm_heads.{i}.weight"] = rng.standard_normal(
            (CFG.audio_emb_vocab, lc.hidden_size)).astype(np.float32)

    params = delay_params_from_state_dict(sd, CFG, dtype=jnp.float32)
    assert params["audio_heads"].shape == (CFG.n_vq, lc.hidden_size, CFG.audio_emb_vocab)
    # mapped transposes: head output equals torch layout y = x @ W^T
    x = rng.standard_normal((1, lc.hidden_size)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(jnp.dot(jnp.asarray(x), params["text_head"])),
        x @ sd["lm_heads.0.weight"].T, atol=1e-4,
    )
    # forward runs
    ids = jnp.asarray(rng.integers(0, 200, (1, 5, CFG.channels)))
    pos = jnp.arange(5)[None].astype(jnp.int32)
    t, a, _ = delay_forward(params, CFG, ids, positions=pos,
                            kv_valid=jnp.ones((1, 5), jnp.bool_))
    assert np.isfinite(np.asarray(t)).all()


def test_realtime_reference_layout_ingest():
    rng = np.random.default_rng(1)
    cfg = RealtimeConfig(
        language_config=tiny_qwen3(hidden_size=32, num_attention_heads=2,
                                   num_key_value_heads=2, head_dim=16,
                                   intermediate_size=64, vocab_size=300),
        local_config=RealtimeLocalConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=2, head_dim=16, rvq=4),
        rvq=4,
    )
    from mosstts_tpu.models.realtime import local_qwen_cfg

    sd = _qwen3_sd("language_model.", cfg.language_config, rng)
    sd.update(_qwen3_sd("local_transformer.model.", local_qwen_cfg(cfg.local_config), rng))
    sd["embed_tokens.0.weight"] = rng.standard_normal(
        (cfg.language_config.vocab_size, 32)).astype(np.float32)
    for i in range(1, cfg.rvq + 1):
        sd[f"embed_tokens.{i}.weight"] = rng.standard_normal(
            (cfg.audio_vocab_size, 32)).astype(np.float32)
    for i in range(cfg.rvq - 1):
        sd[f"local_transformer.model.embed_tokens.{i}.weight"] = rng.standard_normal(
            (cfg.local_config.audio_vocab_size, 32)).astype(np.float32)
    for i in range(cfg.rvq):
        sd[f"local_transformer.local_lm_heads.{i}.weight"] = rng.standard_normal(
            (cfg.local_config.audio_vocab_size, 32)).astype(np.float32)

    params = realtime_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    assert params["local_emb"].shape == (cfg.rvq - 1, cfg.local_config.audio_vocab_size, 32)
    assert params["local_heads"].shape == (cfg.rvq, 32, cfg.local_config.audio_vocab_size)
