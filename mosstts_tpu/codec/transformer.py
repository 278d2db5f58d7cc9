"""Chunked causal transformer runner with a sliding-window KV state.

Both the codec encoder and decoder are causal transformers over 12.5 Hz
frames; long audio (up to 1 h = 45k frames) makes full O(T^2) attention
infeasible, so every pass — offline or streaming — runs in fixed-size chunks
carrying the last ``window`` frames of K/V. Chunked output == one-shot
output exactly (causality + window), which is what makes the codec's
``streaming()`` context (reference call sites
streaming_mossttsrealtime.py:881-884) bit-identical to batch decode.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import Qwen3Config
from ..nn.qwen3 import KVCache, qwen3_forward


class StreamState(NamedTuple):
    k: jax.Array  # (L, B, KV, W, hd) — nn/qwen3.KVCache layout
    v: jax.Array
    positions: jax.Array  # (B, W) absolute positions of slots
    valid: jax.Array  # (B, W)
    next_pos: jax.Array  # scalar int32


def init_stream_state(cfg: Qwen3Config, batch: int, window: int, dtype=jnp.float32) -> StreamState:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, window, cfg.head_dim)
    return StreamState(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        positions=jnp.zeros((batch, window), jnp.int32),
        valid=jnp.zeros((batch, window), jnp.bool_),
        next_pos=jnp.int32(0),
    )


def run_chunk(
    params,
    cfg: Qwen3Config,
    state: StreamState,
    x: jax.Array,  # (B, c, D) chunk inputs (may be right-padded)
    valid_len: jax.Array,  # scalar int32: real frames in this chunk
) -> Tuple[jax.Array, StreamState]:
    B, c, _ = x.shape
    W = state.k.shape[3]

    q_pos = state.next_pos + jnp.arange(c, dtype=jnp.int32)
    q_positions = jnp.broadcast_to(q_pos[None], (B, c))
    chunk_valid = jnp.broadcast_to(
        (jnp.arange(c, dtype=jnp.int32) < valid_len)[None], (B, c)
    )

    pad = jnp.zeros(state.k.shape[:3] + (c, state.k.shape[4]), state.k.dtype)
    cache = KVCache(
        jnp.concatenate([state.k, pad], axis=3),
        jnp.concatenate([state.v, pad], axis=3),
    )
    kv_positions = jnp.concatenate([state.positions, q_positions], axis=1)
    kv_valid = jnp.concatenate([state.valid, chunk_valid], axis=1)

    h, cache = qwen3_forward(
        params, cfg, x,
        positions=q_positions,
        kv_valid=kv_valid,
        cache=cache,
        cache_offset=W,
        kv_positions=kv_positions,
        attn_window=W,
    )
    # Keep the most recent `window` slots: [valid_len : valid_len + W).
    new_k = jax.lax.dynamic_slice_in_dim(cache.k, valid_len, W, axis=3)
    new_v = jax.lax.dynamic_slice_in_dim(cache.v, valid_len, W, axis=3)
    new_positions = jax.lax.dynamic_slice_in_dim(kv_positions, valid_len, W, axis=1)
    # Padded chunk slots carry chunk_valid == False and stay masked.
    new_valid = jax.lax.dynamic_slice_in_dim(kv_valid, valid_len, W, axis=1)

    return h, StreamState(
        k=new_k, v=new_v, positions=new_positions, valid=new_valid,
        next_pos=state.next_pos + valid_len,
    )
