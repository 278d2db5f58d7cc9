"""Qwen3-family decoder backbone as pure functions over a param pytree.

Design (TPU-first, not a torch translation):
  * layer params are stacked on a leading L axis and the forward runs a
    single ``lax.scan`` over layers -> one compiled layer body, fast compiles
    and natural pipelining;
  * the KV cache is a preallocated static-shape buffer written with
    ``dynamic_update_slice`` (the engine donates it across decode steps), in
    place of HF DynamicCache concatenation
    (reference moss_tts_delay/modeling_moss_tts.py:264-276 uses HF
    Qwen3Model + Cache);
  * positions are absolute slot indices; left-padding semantics from the
    reference processors are preserved exactly via the ``kv_valid`` mask
    (reference computes RoPE positions as arange over slots regardless of
    padding, so parity requires the same here).

Weight layout matches HF ``Qwen3Model`` modulo transposition; see
``mosstts_tpu.utils.hf_loader`` for the safetensors name mapping.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import Qwen3Config
from ..ops.basic import apply_rope, dense, rms_norm, rope_cos_sin, swiglu
from ..ops.attention import gqa_attention


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, S, KV, hd)
    v: jax.Array  # (L, B, S, KV, hd)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_kv_cache(cfg: Qwen3Config, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def init_qwen3_params(rng: jax.Array, cfg: Qwen3Config, dtype=jnp.float32, with_embed: bool = True):
    L, D, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    hd = cfg.head_dim
    keys = jax.random.split(rng, 8)
    std = 0.02

    def nrm(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    params = {
        "layers": {
            "ln1": jnp.ones((L, D), dtype),
            "ln2": jnp.ones((L, D), dtype),
            "wq": nrm(keys[0], (L, D, cfg.q_dim)),
            "wk": nrm(keys[1], (L, D, cfg.kv_dim)),
            "wv": nrm(keys[2], (L, D, cfg.kv_dim)),
            "wo": nrm(keys[3], (L, cfg.q_dim, D)),
            "q_norm": jnp.ones((L, hd), dtype),
            "k_norm": jnp.ones((L, hd), dtype),
            "w_gate": nrm(keys[4], (L, D, I)),
            "w_up": nrm(keys[5], (L, D, I)),
            "w_down": nrm(keys[6], (L, I, D)),
        },
        "final_norm": jnp.ones((D,), dtype),
    }
    if with_embed:
        params["embed"] = nrm(keys[7], (cfg.vocab_size, D))
    return params


def qwen3_forward(
    params,
    cfg: Qwen3Config,
    inputs_embeds: jax.Array,  # (B, T, D)
    *,
    positions: jax.Array,  # (B, T) absolute positions (== cache slots)
    kv_valid: jax.Array,  # (B, S) validity of cache slots (S=T when no cache)
    cache: Optional[KVCache] = None,
    cache_offset: jax.Array | int = 0,
    kv_positions: Optional[jax.Array] = None,
    attn_window: Optional[int] = None,
    use_rope: bool = True,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Returns (last_hidden_state (B,T,D), updated cache or None).

    ``kv_positions`` overrides the cache slots' absolute positions (used by
    ring/sliding-window caches where slot index != position; default is the
    linear cache where slot == position)."""
    B, T, D = inputs_embeds.shape
    hd, H, KV = cfg.head_dim, cfg.num_attention_heads, cfg.num_key_value_heads
    scale = hd ** -0.5
    eps = cfg.rms_norm_eps

    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)  # (B, T, hd)

    if kv_positions is None:
        if cache is not None:
            S = cache.max_len
            kv_positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        else:
            kv_positions = positions

    def layer(hidden, xs):
        lp, ck, cv = xs  # layer params, cache k/v: (B, S, KV, hd)
        x = rms_norm(hidden, lp["ln1"], eps)
        q = dense(x, lp["wq"]).reshape(B, T, H, hd)
        k = dense(x, lp["wk"]).reshape(B, T, KV, hd)
        v = dense(x, lp["wv"]).reshape(B, T, KV, hd)
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
        if use_rope:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        if cache is not None:
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_offset, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_offset, 0, 0))
            k_all, v_all = ck, cv
        else:
            k_all, v_all = k, v

        attn = gqa_attention(
            q, k_all, v_all,
            q_positions=positions,
            kv_positions=kv_positions,
            kv_valid=kv_valid,
            scale=scale,
            window=attn_window,
        ).reshape(B, T, H * hd)
        hidden = hidden + dense(attn, lp["wo"])
        x = rms_norm(hidden, lp["ln2"], eps)
        hidden = hidden + swiglu(x, lp["w_gate"], lp["w_up"], lp["w_down"])
        return hidden, (ck, cv)

    if cache is not None:
        xs = (params["layers"], cache.k, cache.v)
    else:
        L = cfg.num_hidden_layers
        dummy = jnp.zeros((L, 0), inputs_embeds.dtype)
        xs = (params["layers"], dummy, dummy)

    hidden, (new_k, new_v) = jax.lax.scan(layer, inputs_embeds, xs)
    hidden = rms_norm(hidden, params["final_norm"], eps)
    new_cache = KVCache(new_k, new_v) if cache is not None else None
    return hidden, new_cache


def embed_tokens(params, ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], ids, axis=0)
