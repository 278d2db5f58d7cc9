"""Grouped-query attention with explicit masks, built for static-shape
KV-cache decoding under ``jit``.

Replaces the reference's FlashAttention-2 / SDPA backends
(clis/moss_tts_app.py:117-141) with an XLA-fused einsum path; the Pallas
flash-attention kernel in ``mosstts_tpu.ops.pallas`` is used for long
prefill when running on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def gqa_attention(
    q: jax.Array,  # (B, Tq, H, hd)
    k: jax.Array,  # (B, Tk, KV, hd)
    v: jax.Array,  # (B, Tk, KV, hd)
    *,
    q_positions: jax.Array,  # (B, Tq) int32 absolute positions
    kv_positions: jax.Array,  # (B, Tk) int32 absolute positions of key slots
    kv_valid: jax.Array,  # (B, Tk) bool: slot holds a real (non-pad) token
    scale: float,
    window: int | None = None,
) -> jax.Array:
    """Causal GQA attention. A query at position p attends key slots whose
    position <= p (and > p - window when a sliding window is set) and which
    are valid. Returns (B, Tq, H, hd)."""
    B, Tq, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV

    qf = q.astype(jnp.float32) * scale
    # scores: (B, KV, G, Tq, Tk)
    scores = jnp.einsum(
        "bqkgh,bskh->bkgqs",
        qf.reshape(B, Tq, KV, G, hd),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    rel = q_positions[:, :, None] - kv_positions[:, None, :]  # (B, Tq, Tk)
    causal = rel >= 0
    if window is not None:
        causal = causal & (rel < window)
    mask = causal & kv_valid[:, None, :]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgqs,bskh->bqkgh",
        probs,
        v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Tq, H, hd).astype(q.dtype)


def gqa_attention_kvmajor(
    q: jax.Array,  # (B, Tq, H, hd)
    k: jax.Array,  # (B, KV, Tk, hd) — cache layout (nn/qwen3.KVCache)
    v: jax.Array,  # (B, KV, Tk, hd)
    *,
    q_positions: jax.Array,  # (B, Tq)
    kv_positions: jax.Array,  # (B, Tk)
    kv_valid: jax.Array,  # (B, Tk)
    scale: float,
    window: int | None = None,
) -> jax.Array:
    """``gqa_attention`` over kv-head-major k/v — the KV-cache layout —
    avoiding a materialized transpose on the decode/cache read path."""
    B, Tq, H, hd = q.shape
    KV = k.shape[1]
    G = H // KV

    qf = q.astype(jnp.float32) * scale
    # scores: (B, KV, G, Tq, Tk)
    scores = jnp.einsum(
        "bqkgh,bksh->bkgqs",
        qf.reshape(B, Tq, KV, G, hd),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    rel = q_positions[:, :, None] - kv_positions[:, None, :]  # (B, Tq, Tk)
    causal = rel >= 0
    if window is not None:
        causal = causal & (rel < window)
    mask = causal & kv_valid[:, None, :]
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgqs,bksh->bqkgh",
        probs,
        v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, Tq, H, hd).astype(q.dtype)


def attention_nopos(
    q: jax.Array,  # (B, T, H, hd)
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
) -> jax.Array:
    """Plain causal attention with NO positional encoding and no padding —
    used by the MossTTSLocal depth transformer, which runs over fixed-length
    (1+n_vq) codebook blocks (moss_tts_local/modeling_moss_tts.py:126-176)."""
    B, T, H, hd = q.shape
    KV = k.shape[2]
    G = H // KV
    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum(
        "bqkgh,bskh->bkgqs",
        qf.reshape(B, T, KV, G, hd),
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    i = jnp.arange(T)
    causal = i[:, None] >= i[None, :]
    scores = jnp.where(causal[None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgqs,bskh->bqkgh", probs, v.astype(jnp.float32))
    return out.reshape(B, T, H, hd).astype(q.dtype)
