"""Backbone parity vs HF torch Qwen3 on a tiny random model, plus KV-cache
decode consistency (prefill+step == one-shot)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import Qwen3Config, tiny_qwen3
from mosstts_tpu.nn.qwen3 import (
    KVCache,
    embed_tokens,
    init_kv_cache,
    init_qwen3_params,
    qwen3_forward,
)
from mosstts_tpu.utils.hf_loader import qwen3_params_from_state_dict

CFG = tiny_qwen3(vocab_size=256)


def _hf_model(cfg: Qwen3Config):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3 import Qwen3Config as HFConfig, Qwen3Model

    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        attention_bias=cfg.attention_bias,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3Model(hf_cfg).eval()
    return model


def test_forward_parity_with_hf():
    torch = pytest.importorskip("torch")
    model = _hf_model(CFG)
    sd = model.state_dict()
    params = qwen3_params_from_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    B, T = 2, 17
    ids = rng.integers(0, CFG.vocab_size, size=(B, T))
    mask = np.ones((B, T), dtype=bool)
    mask[1, :5] = False  # left padding on row 1

    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()

    embeds = embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T)).astype(jnp.int32)
    ours, _ = qwen3_forward(
        params, CFG, embeds, positions=positions, kv_valid=jnp.asarray(mask)
    )
    ours = np.asarray(ours)
    # compare only non-pad rows
    np.testing.assert_allclose(ours[mask], hf_out[mask], atol=2e-4, rtol=2e-3)


def test_kv_cache_decode_matches_full_forward():
    params = init_qwen3_params(jax.random.PRNGKey(1), CFG)
    B, T0, steps, S = 2, 9, 4, 32
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(B, T0 + steps)))
    embeds = embed_tokens(params, ids)
    mask_full = np.ones((B, T0 + steps), dtype=bool)
    mask_full[0, :3] = False
    positions_full = jnp.broadcast_to(jnp.arange(T0 + steps)[None], (B, T0 + steps)).astype(jnp.int32)

    full, _ = qwen3_forward(
        params, CFG, embeds, positions=positions_full, kv_valid=jnp.asarray(mask_full)
    )

    # prefill T0 then decode one token at a time into a static cache
    cache = init_kv_cache(CFG, B, S, dtype=jnp.float32)
    kv_valid = np.zeros((B, S), dtype=bool)
    kv_valid[:, :T0] = mask_full[:, :T0]
    h, cache = qwen3_forward(
        params, CFG, embeds[:, :T0],
        positions=positions_full[:, :T0],
        kv_valid=jnp.asarray(kv_valid),
        cache=cache, cache_offset=0,
    )
    m0 = mask_full[:, :T0]  # pad-query outputs are undefined garbage; skip
    np.testing.assert_allclose(
        np.asarray(h)[m0], np.asarray(full[:, :T0])[m0], atol=1e-5
    )

    for t in range(steps):
        pos = T0 + t
        kv_valid[:, pos] = True
        h, cache = qwen3_forward(
            params, CFG, embeds[:, pos:pos + 1],
            positions=positions_full[:, pos:pos + 1],
            kv_valid=jnp.asarray(kv_valid),
            cache=cache, cache_offset=pos,
        )
        np.testing.assert_allclose(
            np.asarray(h[:, 0]), np.asarray(full[:, pos]), atol=1e-4
        )
