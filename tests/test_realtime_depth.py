"""Realtime 16-codebook depth loop: cached scan == uncached full-prefix
recompute (greedy), and windowed repetition-penalty semantics."""
import numpy as np
import jax
import jax.numpy as jnp

from mosstts_tpu.core.config import RealtimeConfig, RealtimeLocalConfig, tiny_qwen3
from mosstts_tpu.models.realtime import (
    depth_generate_frame,
    init_realtime_params,
    local_qwen_cfg,
    make_rt_sampling,
)
from mosstts_tpu.nn.qwen3 import qwen3_forward

RVQ = 4
CFG = RealtimeConfig(
    language_config=tiny_qwen3(hidden_size=32, num_attention_heads=2,
                               num_key_value_heads=2, head_dim=16,
                               intermediate_size=64),
    local_config=RealtimeLocalConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16, rvq=RVQ,
        max_position_embeddings=RVQ + 1,
    ),
    rvq=RVQ,
)


def _oracle_frame(params, cfg, hidden, history, hist_len, rp, window=50):
    """Uncached recompute of the depth loop (greedy), from the reference
    spec: slot 0 = backbone hidden; slot i>=1 = embed_{i-1}(prev token);
    head_i at slot i; windowed penalty over per-codebook history."""
    lq = local_qwen_cfg(cfg.local_config)
    B = hidden.shape[0]
    Va = cfg.local_config.audio_vocab_size
    xs = [hidden]
    toks = []
    for i in range(cfg.rvq):
        inp = jnp.stack(xs, axis=1)
        t = inp.shape[1]
        h, _ = qwen3_forward(
            params["local"], lq, inp,
            positions=jnp.broadcast_to(jnp.arange(t)[None], (B, t)).astype(jnp.int32),
            kv_valid=jnp.ones((B, t), jnp.bool_),
        )
        logits = np.asarray(
            jnp.einsum("bd,dv->bv", h[:, -1], params["local_heads"][i])
        ).astype(np.float64)
        # windowed penalty
        w0 = max(0, hist_len - window)
        hist = np.asarray(history)[:, w0:hist_len, i]
        for b in range(B):
            for tok in set(hist[b].tolist()):
                v = logits[b, tok]
                logits[b, tok] = v / rp if v > 0 else v * rp
        tok = np.argmax(logits, axis=-1)
        toks.append(tok)
        emb = jnp.take(params["local_emb"][min(i, cfg.rvq - 2)],
                       jnp.asarray(tok), axis=0)
        xs.append(emb.astype(hidden.dtype))
    return np.stack(toks, axis=1)


def test_depth_frame_matches_uncached_oracle():
    params = init_realtime_params(jax.random.PRNGKey(0), CFG)
    B = 2
    hidden = jax.random.normal(jax.random.PRNGKey(1), (B, 32))
    rng = np.random.default_rng(0)
    history = jnp.asarray(rng.integers(0, 1024, (B, 64, RVQ)), jnp.int32)
    hist_len = 7
    sampling = make_rt_sampling(temperature=0.0, do_sample=False,
                                repetition_penalty=1.2)
    frame = jax.jit(
        lambda h: depth_generate_frame(
            params, CFG, jax.random.PRNGKey(2), h, history,
            jnp.int32(hist_len), sampling, top_k=30,
        )
    )(hidden)
    want = _oracle_frame(params, CFG, hidden, history, hist_len, rp=1.2)
    np.testing.assert_array_equal(np.asarray(frame), want)


def test_depth_penalty_window():
    """Only the last `window` frames of history feed the penalty."""
    params = init_realtime_params(jax.random.PRNGKey(0), CFG)
    B = 1
    hidden = jax.random.normal(jax.random.PRNGKey(1), (B, 32))
    rng = np.random.default_rng(1)
    hist_a = jnp.asarray(rng.integers(0, 1024, (B, 120, RVQ)), jnp.int32)
    # same recent window, different distant past
    hist_b = hist_a.at[:, :60].set(jnp.asarray(rng.integers(0, 1024, (B, 60, RVQ))))
    sampling = make_rt_sampling(temperature=0.0, do_sample=False,
                                repetition_penalty=1.3)
    f = jax.jit(
        lambda h, hist: depth_generate_frame(
            params, CFG, jax.random.PRNGKey(2), h, hist, jnp.int32(120),
            sampling, top_k=30,
        )
    )
    np.testing.assert_array_equal(np.asarray(f(hidden, hist_a)),
                                  np.asarray(f(hidden, hist_b)))
