"""Core pure ops: RMSNorm, SwiGLU, RoPE, dense helpers.

TPU notes: all matmuls specify ``preferred_element_type`` so the MXU
accumulates in fp32 even when params/activations are bf16; RMSNorm runs its
reduction in fp32 (matching the reference numerics,
moss_tts_realtime/mossttsrealtime/modeling_mossttsrealtime_local.py:40-54).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * xf).astype(dtype)


def dense(x: jax.Array, w, b: jax.Array | None = None) -> jax.Array:
    """x @ w with fp32 accumulation. w layout is (in, out); ``w`` may be a
    quantized int8 weight (ops.quant.QuantWeight) — the dequant convert is
    fused into the matmul operand read by XLA."""
    from .quant import QuantWeight

    if isinstance(w, QuantWeight):
        y = jnp.dot(x, w.q.astype(x.dtype), preferred_element_type=jnp.float32)
        y = y * w.scale
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def swiglu(x: jax.Array, w_gate: jax.Array, w_up: jax.Array, w_down: jax.Array) -> jax.Array:
    g = dense(x, w_gate)
    u = dense(x, w_up)
    return dense(jax.nn.silu(g) * u, w_down)


# ----------------------------- RoPE ---------------------------------------


def rope_inv_freq(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """positions: (..., T) int32 -> cos/sin of shape (..., T, head_dim).

    NeoX-style layout: emb = concat(freqs, freqs) and rotate_half pairs the
    first and second halves (HF Qwen3 convention).
    """
    inv = rope_inv_freq(head_dim, theta)
    freqs = positions.astype(jnp.float32)[..., None] * inv  # (..., T, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, T, H, hd); cos/sin: (B, T, hd) or (T, hd)."""
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :].astype(jnp.float32)
    sin = sin[:, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return ((xf * cos) + (rotate_half(xf) * sin)).astype(x.dtype)
